"""Training engine: the torch_em-DefaultTrainer capability, TPU-native.

One :class:`Trainer` base drives the fit loop (epoching, validation cadence,
best/latest checkpoints, LR plateau scheduling, TB logging, throughput
counters) and seven thin subclasses bind the per-algorithm jitted step
functions — mirroring the reference trainer classes one-for-one
(SURVEY.md section 2.2):

  UNetTrainer          <- torch_em default_segmentation_trainer
  PUNetTrainer         <- prob_utils/my_trainer/punet_trainer.py
  PseudoTrainer        <- punet_target_trainer.py:12  (UNet on pseudo labels)
  PseudoTrainerPUNet   <- punet_target_trainer.py:92
  MeanTeacherTrainer   <- mean_teacher_trainer.py
  FixMatchTrainer      <- fixmatch_trainer.py
  AdaMTTrainer         <- adamt_trainer.py
  AdaMatchTrainer      <- adamatch_trainer.py

Key engine differences vs the reference (deliberate, TPU-first):
  * the train step — including teacher MC-16 pseudo-labels, consensus, EMA —
    is ONE donated jitted function; the Python loop only feeds batches;
  * metrics are fetched with a one-step delay so the host never blocks the
    device pipeline;
  * an optional ``jax.sharding.Mesh`` shards every batch over the ``data``
    axis — the same code runs 1-chip or N-chip.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import Any, Callable, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import (
    DATA_AXIS,
    SPACE_AXIS,
    batch_sharding,
    replicated,
    shard_batch,
)
from . import steps as steps_lib
from .checkpoint import (
    BEST,
    LATEST,
    checkpoint_dir,
    checkpoint_exists,
    load_checkpoint,
    load_params,
    save_checkpoint,
)
from .logging import (
    AdaMatchLogger,
    AdaMTLogger,
    FixMatchLogger,
    MeanTeacherLogger,
    PseudoLogger,
    PUNetLogger,
    TrainLogger,
)
from .optim import ReduceLROnPlateau, adam
from .state import TrainState, create_train_state


class Trainer:
    """Base fit/validate/checkpoint engine."""

    #: subclasses using an EMA teacher set this
    with_teacher = False
    #: TB image-panel tag set this trainer writes at ``log_image_interval``
    #: steps — the reference logger's panel list (SURVEY.md section 2.2).
    #: Produced by ``make_panel_fn`` + ``assemble_panels``, not positionally
    #: from the batch tuple.
    image_tags: tuple = ()
    #: logger class constructed for ``logger=True`` — subclasses point this
    #: at their reference-named logger so per-logger display conventions
    #: (e.g. PUNetLogger's raw 'input' panel) apply by default.
    default_logger_cls = TrainLogger

    def __init__(
        self,
        name: str,
        model,
        train_loader,
        val_loader,
        *,
        learning_rate: float = 1e-5,
        optimizer=None,
        lr_scheduler: Optional[ReduceLROnPlateau] = None,
        device: Any = None,  # accepted for API fidelity; JAX manages devices
        mesh=None,
        save_root: Optional[str] = None,
        logger: Any = True,
        log_image_interval: int = 100,
        mixed_precision: bool = False,
        seed: int = 0,
    ):
        self.name = name
        # mixed_precision=True (the reference's AMP flag, e.g.
        # livecell_punet.py:75) maps to bfloat16 compute on TPU: the module's
        # ``dtype`` is cloned to bf16, parameters stay float32, and the loss
        # heads cast back to float32 (no loss scaling needed for bf16).
        if mixed_precision and hasattr(model, "dtype"):
            model = model.clone(dtype=jnp.bfloat16)
        self.model = model
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.tx = optimizer if optimizer is not None else adam(learning_rate)
        self.lr_scheduler = lr_scheduler
        self.mesh = mesh
        self.save_root = save_root
        self.ckpt_dir = checkpoint_dir(name, save_root)
        # ``logger`` accepts True/False, a TrainLogger CLASS (the reference
        # pattern: trainers take the logger class, e.g. logger=PUNetLogger —
        # torch_em DefaultTrainer / prob_utils loggers), or an instance.
        if isinstance(logger, type) and issubclass(logger, TrainLogger):
            self.logger = logger(name, save_root, log_image_interval)
        elif isinstance(logger, TrainLogger):
            self.logger = logger
        else:
            self.logger = (
                self.default_logger_cls(name, save_root, log_image_interval)
                if logger else None
            )
        self.seed = seed

        self._iteration = 0
        self._best_metric = float("inf")
        self._train_time = 0.0
        self.state: Optional[TrainState] = None
        self._train_step_jit = None
        self._val_step_jit = None
        self._panel_jit = None

    # -- subclass hooks ------------------------------------------------------

    def make_train_step(self) -> Callable:
        raise NotImplementedError

    def make_val_step(self) -> Callable:
        raise NotImplementedError

    def make_panel_fn(self) -> Optional[Callable]:
        """Jittable ``(params, teacher_params, rng, *batch) -> {tag: array}``
        producing this trainer's reference TB image panels (in-graph tensors:
        pseudo-labels, consensus, MC samples, predictions). None = no panels."""
        return None

    def panel_batch(self, batch):
        """The sub-tuple of ``batch`` the panel fn consumes (joint trainers
        pass only the target-side tensors, like the reference loggers)."""
        return batch

    def assemble_panels(self, raw: dict) -> dict:
        """Host-side post-processing of the fetched panel tensors (sample
        grids etc.). Default: numpy-ify only."""
        return {k: np.asarray(v, np.float32) for k, v in raw.items()}

    def init_params(self, key, example_batch):
        raise NotImplementedError

    def train_batches(self) -> Iterable[Sequence[np.ndarray]]:
        """One epoch of train batches (tuple per step)."""
        return iter(self.train_loader)

    def val_batches(self) -> Iterable[Sequence[np.ndarray]]:
        return iter(self.val_loader)

    def epoch_length(self) -> int:
        return len(self.train_loader)

    # -- setup ----------------------------------------------------------------

    def _example_batch(self):
        try:
            return next(iter(self.train_loader))
        except StopIteration:
            raise RuntimeError(
                "train loader yielded zero batches — the dataset is empty "
                "(n_samples too small for the sample count, or no matching "
                "files)"
            ) from None

    def _dp_shard_map(self) -> bool:
        """Run steps through ``jax.shard_map`` (manual SPMD)? True on any
        multi-device ``data`` or ``(data, space)`` mesh unless
        ``PDA_DP_IMPL=gspmd``. Manual mode keeps the fused Pallas conv
        kernels alive per shard (GSPMD cannot partition the opaque custom
        calls and would replicate their operands); the step factories'
        ``axis_name`` psums make the sharded step equal the single-device
        step exactly. On a ``space`` axis the conv blocks exchange explicit
        row halos via ``jax.lax.ppermute``
        (pda.models.blocks._conv3_space_sharded).
        """
        return (
            self.mesh is not None
            and self.mesh.devices.size > 1
            and tuple(self.mesh.axis_names) in (
                (DATA_AXIS,), (DATA_AXIS, SPACE_AXIS),
            )
            and os.environ.get("PDA_DP_IMPL", "shard_map") != "gspmd"
            and not self._force_gspmd
        )

    #: set by initialize() when the (data, space) halo path cannot serve
    #: this model/geometry — the engine then falls back to GSPMD instead of
    #: erroring at trace time
    _force_gspmd = False

    def _check_spatial_support(self, example_batch):
        """On a (data, space) mesh, decide UP FRONT whether the shard_map
        halo path supports this model + patch geometry; fall back to GSPMD
        (with a printed note) when it cannot, instead of surfacing the
        blocks-level trace error to the user. Supported = a ConvBlock-based
        PUNet-family model whose deepest pyramid level keeps >= 9 rows per
        row shard (the in-shard boundary-fix strip minimum,
        pda.models.blocks._conv3_space_sharded)."""
        if (
            self.mesh is None
            or SPACE_AXIS not in self.mesh.axis_names
            or not self._dp_shard_map()
        ):
            return
        n_space = self.mesh.shape[SPACE_AXIS]
        filters = getattr(self.model, "num_filters", None)
        reason = None
        if filters is None:  # UNet2d etc.: no halo-aware block path
            reason = f"{type(self.model).__name__} has no halo-exchange path"
        else:
            # validate the VAL geometry too — a val loader with a different
            # patch height would otherwise surface the blocks-level trace
            # error instead of this friendly fallback
            heights = {("train", int(np.asarray(example_batch[0]).shape[1]))}
            try:
                # peek one val batch WITHOUT advancing the loader's epoch
                # counter (Loader seeds per-(seed, epoch, index) — a stray
                # increment would shift every later val sample)
                ep = getattr(self.val_loader, "_epoch", None)
                val_batch = next(iter(self.val_loader))
                if ep is not None:
                    self.val_loader._epoch = ep
                heights.add(("val", int(np.asarray(val_batch[0]).shape[1])))
            except (StopIteration, TypeError):
                pass
            down = n_space * 2 ** (len(filters) - 1)
            for split, h in sorted(heights):
                if h % down or (h // down) < 9:
                    reason = (
                        f"{split} patch rows {h} leave {h // down} rows per "
                        f"row shard at the deepest level (need >= 9 and "
                        f"divisibility by {down})"
                    )
                    break
        if reason is not None:
            print(
                f"note: (data, space={n_space}) mesh falls back to GSPMD — "
                f"{reason}; the fused kernels are pinned off for this "
                f"trainer (PDA_DP_IMPL=gspmd semantics)"
            )
            self._force_gspmd = True

    @property
    def _axis_name(self) -> Optional[str]:
        """Mesh axis the step functions psum over (None outside shard_map)."""
        return DATA_AXIS if self._dp_shard_map() else None

    @property
    def _space_axis_name(self) -> Optional[str]:
        """Row-sharding axis on a (data, space) shard_map mesh."""
        if self._dp_shard_map() and SPACE_AXIS in self.mesh.axis_names:
            return SPACE_AXIS
        return None

    @contextmanager
    def _space_ctx(self):
        """Activate the trace-time row-sharding context while a shard_map
        step traces on a (data, space) mesh: ConvBlock/UpBlock/encoders
        switch to the halo-exchange image path and the loss/metric psums
        include the space axis (steps._with_space)."""
        sp = self._space_axis_name
        if sp is None:
            yield
            return
        from ..models.blocks import space_sharding

        with space_sharding(sp):
            yield

    def _wrap_step(self, step, *, donate: bool):
        """Jit a step; on the shard_map path, wrap it per batch arity
        (train/val tuples differ) with batch leaves sharded over ``data``
        (and image rows over ``space`` on a 2-D mesh), state/metrics
        replicated.

        ``check_vma=False`` is required: the Pallas kernels cannot satisfy
        vma inference (jax 0.9). Gradient correctness under the legacy
        transpose rules is guaranteed by construction instead — the batch
        losses never differentiate a psum (``pda.core.losses._gsum``); the
        spatial path differentiates exactly two collective kinds whose
        legacy transposes are correct for their use: halo/boundary
        ppermutes (transpose = inverse permutation) and the encoders'
        pooled-stats pmean (transpose = psum/n, the required cotangent
        gather — ``blocks.global_mean_rows_sharded``). Each shard's
        gradient is then its exact local contribution and the ``psum`` in
        ``steps._apply_updates`` reassembles the single-device gradient
        (pinned by tests/test_parallel.py::TestShardMapDP /
        TestSpatialShardMap)."""
        if not self._dp_shard_map():
            return jax.jit(step, donate_argnums=0) if donate else jax.jit(step)
        from jax.sharding import PartitionSpec as P

        space = self._space_axis_name
        cache: dict = {}

        def call(state, *batch):
            specs = tuple(
                P(DATA_AXIS, space) if (space and np.ndim(b) >= 3)
                else (P(DATA_AXIS) if np.ndim(b) > 0 else P())
                for b in batch
            )
            if specs not in cache:
                sm = jax.shard_map(
                    step,
                    mesh=self.mesh,
                    in_specs=(P(), *specs),
                    out_specs=(P(), P()),
                    check_vma=False,
                )
                jitted = (
                    jax.jit(sm, donate_argnums=0) if donate else jax.jit(sm)
                )

                def traced(*args, _f=jitted):
                    with self._space_ctx():
                        return _f(*args)

                cache[specs] = traced
            return cache[specs](state, *batch)

        return call

    def initialize(self):
        if self.state is not None:
            return
        key = jax.random.PRNGKey(self.seed)
        k_init, k_state = jax.random.split(key)
        # Parameter init runs on the CPU backend: the init program
        # (orthogonal/QR initializers) compiles pathologically slowly through
        # the TPU remote-compile path, while train-step compiles are fast.
        # The state is transferred to the accelerator afterwards.
        example_batch = self._example_batch()
        self._check_spatial_support(example_batch)
        with jax.default_device(jax.devices("cpu")[0]):
            params = self.init_params(k_init, example_batch)
            self.state = create_train_state(
                params, self.tx, k_state, with_teacher=self.with_teacher
            )
        if self.mesh is not None:
            self.state = jax.device_put(self.state, replicated(self.mesh))
        elif jax.default_backend() != "cpu":
            self.state = jax.device_put(self.state, jax.devices()[0])
        self._train_step_jit = self._wrap_step(self.make_train_step(), donate=True)
        self._val_step_jit = self._wrap_step(self.make_val_step(), donate=False)
        if self.logger is not None:
            pf = self.make_panel_fn()
            self._panel_jit = jax.jit(pf) if pf is not None else None
        self._post_initialize()

    def _compute_panels(self, batch) -> Optional[dict]:
        """Run the panel program on the first batch element and return the
        assembled host-side image dict. The panel program is a separate
        forward-only jit on the default device — the train step's HLO and
        cadence are untouched; on a mesh, the (replicated) params are pulled
        host-side first so the single-device panel program never asks GSPMD
        to partition anything."""
        if self._panel_jit is None:
            return None
        batch = self.panel_batch(batch)
        small = tuple(np.asarray(b[:1]) for b in batch)
        params, teacher, rng = self.state.params, (
            self.state.teacher_params if self.with_teacher else self.state.params
        ), self.state.rng
        if self.mesh is not None:
            # replicated mesh arrays -> plain single-device arrays for the
            # panel program: a device-to-device put (device 0 already holds
            # a full replica), never a host round-trip of the params
            params, teacher, rng = jax.device_put(
                (params, teacher, rng), jax.devices()[0]
            )
        raw = self._panel_jit(params, teacher, rng, *small)
        return self.assemble_panels({k: np.asarray(v) for k, v in raw.items()})

    def _post_initialize(self):
        """Warm starts etc. — overridden by the self-training trainers."""

    def _put(self, batch):
        if self.mesh is not None:
            return shard_batch(self.mesh, batch)
        return jax.tree_util.tree_map(jnp.asarray, batch)

    @contextmanager
    def _conv_path_pin(self):
        """On a multi-device mesh running through GSPMD, pin the plain XLA
        conv path for the duration of any tracing (fit/validate): the fused
        Pallas kernels are opaque custom calls XLA's SPMD partitioner cannot
        split along ANY axis — spatially under a ``space`` axis, but also
        along the batch under a pure ``data`` mesh, where GSPMD would
        replicate the operands and make every device compute the full batch.
        The shard_map data-parallel path (``_dp_shard_map``) needs no pin:
        manual mode runs the kernels per shard. The env var is read at trace
        time, FORCED to 0 here even if the caller exported PDA_PALLAS_CONV=1,
        and restored on exit so later single-device work in the same process
        keeps the fused-kernel fast path."""
        if (
            self.mesh is None
            or self.mesh.devices.size <= 1
            or self._dp_shard_map()
        ):
            yield
            return
        from ..models.blocks import force_xla_conv_path

        with force_xla_conv_path(
            "note: a multi-device mesh forces the XLA conv path; "
            "PDA_PALLAS_CONV=1 is ignored for this trainer"
        ):
            yield

    # -- fit loop --------------------------------------------------------------

    def fit(
        self,
        iterations: int,
        *,
        load_from_checkpoint: Optional[str] = None,
        overwrite_training: bool = True,
    ):
        """Train for ``iterations`` steps, validating every epoch —
        torch_em DefaultTrainer.fit semantics. ``overwrite_training=False``
        resumes from the latest checkpoint if one exists (the reference's
        resume-style flag, e.g. mitoem_punet.py:49)."""
        # initialize BEFORE deciding the conv-path pin: the spatial-support
        # check may flip this trainer to the GSPMD fallback, which needs
        # the pin active while its steps trace
        self.initialize()
        with self._conv_path_pin():
            return self._fit_impl(
                iterations,
                load_from_checkpoint=load_from_checkpoint,
                overwrite_training=overwrite_training,
            )

    def _fit_impl(
        self,
        iterations: int,
        *,
        load_from_checkpoint: Optional[str],
        overwrite_training: bool,
    ):
        self.initialize()
        if load_from_checkpoint is None and not overwrite_training and \
                checkpoint_exists(self.ckpt_dir, LATEST):
            load_from_checkpoint = LATEST
        if load_from_checkpoint is not None:
            self.load_checkpoint(load_from_checkpoint)

        from .profiling import Throughput

        pending = None  # (step_idx, metrics) fetched one step late
        t_start = time.time()
        throughput = Throughput()
        self.throughput = throughput

        while self._iteration < iterations:
            epoch_start = self._iteration
            for batch in self.train_batches():
                batch = self._put(batch)
                self.state, metrics = self._train_step_jit(self.state, *batch)
                throughput.update(int(jax.tree_util.tree_leaves(batch)[0].shape[0]))
                if self.logger is not None:
                    if pending is not None:
                        step_idx, pm = pending
                        scalars = {k: float(v) for k, v in pm.items()}
                        lr = self.state.learning_rate
                        if lr is not None:
                            scalars["learning_rate"] = lr
                        self.logger.log_train(step_idx, scalars)
                    pending = (self._iteration, metrics)
                    # reference loggers write their image panels (pseudo
                    # labels, consensus, MC samples, predictions) every
                    # log_image_interval steps (punet_trainer.py:119-120 etc.)
                    if (
                        self._panel_jit is not None
                        and self._iteration % self.logger.log_image_interval == 0
                    ):
                        images = self._compute_panels(batch)
                        if images:
                            self.logger.log_train(self._iteration, {}, images)

                self._iteration += 1
                if self._iteration >= iterations:
                    break

            if self._iteration == epoch_start:
                raise RuntimeError(
                    "train loader yielded zero batches — the dataset is "
                    "empty (n_samples too small for the sample count, or no "
                    "matching files); training would loop forever"
                )
            throughput.stop()
            val_metrics = self.validate()
            throughput.start()
            current = val_metrics.get("metric", val_metrics.get("loss", 0.0))
            if self.lr_scheduler is not None:
                lr = self.state.learning_rate
                if lr is None:
                    raise TypeError(
                        "lr_scheduler requires an optax.inject_hyperparams-"
                        "wrapped optimizer (pda.train.optim.adam); the "
                        "provided optimizer does not expose a learning rate"
                    )
                new_lr = self.lr_scheduler.step(current, lr)
                if new_lr != lr:
                    self.state = self.state.replace_lr(new_lr)

            self._train_time += time.time() - t_start
            t_start = time.time()
            # update the best metric BEFORE writing latest: latest.ckpt's
            # metadata must reflect this epoch's comparison, or a resume from
            # latest would restore a stale best_metric and let a later, worse
            # epoch overwrite best.ckpt
            improved = current < self._best_metric
            if improved:
                self._best_metric = current
            self.save_checkpoint(LATEST, current)
            if improved:
                self.save_checkpoint(BEST, current)

        if pending is not None and self.logger is not None:
            step_idx, pm = pending
            self.logger.log_train(step_idx, {k: float(v) for k, v in pm.items()})
        throughput.stop()
        return {"iterations": self._iteration, "train_time": self._train_time,
                **throughput.summary()}

    def validate(self) -> dict:
        # accumulate metric scalars ON DEVICE and fetch once at the end — a
        # per-batch float() would force a host sync per validation step
        self.initialize()  # see fit(): pin decision needs the support check
        with self._conv_path_pin():
            return self._validate_impl()

    def _validate_impl(self) -> dict:
        sums: dict = {}
        n = 0
        last_batch = None
        for batch in self.val_batches():
            batch = self._put(batch)
            self.state, metrics = self._val_step_jit(self.state, *batch)
            for k, v in metrics.items():
                sums[k] = v if k not in sums else sums[k] + v
            n += 1
            last_batch = batch
        avg = {k: float(v) / max(n, 1) for k, v in sums.items()}
        if "dice" in avg:
            print(f"The Average Dice Score for the Current Epoch is {avg['dice']}")
        if self.logger is not None:
            # the reference loggers write their image panels on EVERY
            # validation, from the last val batch (punet_trainer.py:94-97)
            images = (
                self._compute_panels(last_batch)
                if last_batch is not None else None
            )
            self.logger.log_validation(self._iteration, avg, images)
        return avg

    # -- checkpoints -------------------------------------------------------------

    def save_checkpoint(self, which: str, current_metric: float):
        extra = {}
        if self.lr_scheduler is not None:
            extra["lr_scheduler"] = self.lr_scheduler.state_dict()
        save_checkpoint(
            self.ckpt_dir,
            self.state,
            which=which,
            current_metric=current_metric,
            best_metric=self._best_metric,
            train_time=self._train_time,
            extra=extra,
        )

    def load_checkpoint(self, which: str = BEST):
        self.initialize()
        state, meta = load_checkpoint(self.ckpt_dir, self.state, which=which)
        self.state = state
        if self.mesh is not None:
            self.state = jax.device_put(self.state, replicated(self.mesh))
        self._iteration = meta.get("step", int(state.step))
        self._best_metric = meta.get("best_metric", float("inf"))
        self._train_time = meta.get("train_time", 0.0)
        if self.lr_scheduler is not None and "lr_scheduler" in meta:
            self.lr_scheduler.load_state_dict(meta["lr_scheduler"])
        return meta

    def warm_start(self, ckpt_path_or_dir: str, *, into_teacher: bool = False,
                   from_key: str = "params"):
        """Load params from another run's checkpoint into student or teacher
        (reference warm-start pattern, mean_teacher_trainer.py:44-50)."""
        self.initialize()
        directory = ckpt_path_or_dir
        which = BEST
        if directory.endswith(".ckpt"):
            which = os.path.basename(directory).replace(".ckpt", "")
            directory = os.path.dirname(directory)
        params = load_params(directory, self.state.params, which=which, key=from_key)
        if into_teacher:
            self.state = self.state.replace(teacher_params=params)
        else:
            self.state = self.state.replace(params=params)


# ---------------------------------------------------------------------------
# concrete trainers
# ---------------------------------------------------------------------------


class _PUNetInitMixin:
    """Init that touches posterior (needs a segm input)."""

    def init_params(self, key, example_batch):
        x = np.asarray(example_batch[0])
        y = np.zeros((*x.shape[:-1], self.model.num_classes), dtype=np.float32)
        variables = self.model.init(key, jnp.asarray(x), jnp.asarray(y))
        return variables["params"]


class _SampleGridPanelsMixin:
    """Host-side grid assembly for trainers logging a 16-sample panel
    (reference PUNetLogger: ``make_grid(samples, nrow=4, padding=4)``,
    punet_trainer.py:113)."""

    def assemble_panels(self, raw: dict) -> dict:
        from .logging import make_grid

        raw = dict(raw)
        samples = np.asarray(raw.pop("samples"), np.float32)
        images = {k: np.asarray(v, np.float32) for k, v in raw.items()}
        images["samples"] = make_grid(list(samples), nrow=4, padding=4)
        return images


class UNetTrainer(Trainer):
    """Supervised UNet2d trainer (torch_em default_segmentation_trainer
    equivalent; reference usage LIVECell/livecell_unet.py:48-59)."""

    image_tags = ("input", "target", "prediction")

    def make_train_step(self):
        return steps_lib.make_supervised_unet_step(
            self.model, self.tx, axis_name=self._axis_name
        )

    def make_val_step(self):
        return steps_lib.make_supervised_unet_val_step(
            self.model, axis_name=self._axis_name
        )

    def make_panel_fn(self):
        return steps_lib.make_supervised_unet_panels(self.model)

    def init_params(self, key, example_batch):
        x = jnp.asarray(np.asarray(example_batch[0]))
        return self.model.init(key, x)["params"]


class PUNetTrainer(_SampleGridPanelsMixin, _PUNetInitMixin, Trainer):
    """Supervised source PUNet training (reference punet_trainer.py:13-97)."""

    default_logger_cls = PUNetLogger
    image_tags = ("input", "target", "samples")

    def make_train_step(self):
        return steps_lib.make_supervised_punet_step(
            self.model, self.tx, axis_name=self._axis_name
        )

    def make_val_step(self):
        return steps_lib.make_punet_val_step(self.model, axis_name=self._axis_name)

    def make_panel_fn(self):
        return steps_lib.make_punet_panels(self.model)


class PseudoTrainer(Trainer):
    """UNet on fixed pseudo-labels + consensus masking
    (reference punet_target_trainer.py:12-67)."""

    default_logger_cls = PseudoLogger
    image_tags = ("input", "target", "prediction")

    def make_train_step(self):
        return steps_lib.make_pseudo_unet_step(
            self.model, self.tx, axis_name=self._axis_name
        )

    def make_val_step(self):
        return steps_lib.make_pseudo_unet_val_step(
            self.model, axis_name=self._axis_name
        )

    def make_panel_fn(self):
        return steps_lib.make_pseudo_unet_panels(self.model)

    def init_params(self, key, example_batch):
        x = jnp.asarray(np.asarray(example_batch[0]))
        return self.model.init(key, x)["params"]


class PseudoTrainerPUNet(_SampleGridPanelsMixin, _PUNetInitMixin, Trainer):
    """PUNet on precomputed pseudo-labels + consensus from disk
    (reference punet_target_trainer.py:92-183)."""

    default_logger_cls = PseudoLogger
    image_tags = ("input", "target", "samples")

    def make_train_step(self):
        return steps_lib.make_pseudo_punet_step(
            self.model, self.tx, axis_name=self._axis_name
        )

    def make_val_step(self):
        return steps_lib.make_pseudo_punet_val_step(
            self.model, axis_name=self._axis_name
        )

    def make_panel_fn(self):
        return steps_lib.make_pseudo_punet_panels(self.model)


class MeanTeacherTrainer(_PUNetInitMixin, Trainer):
    """Separate-training mean teacher (reference mean_teacher_trainer.py)."""

    with_teacher = True
    default_logger_cls = MeanTeacherLogger
    image_tags = ("input", "aug_inputs_1", "aug_inputs_2",
                  "teacher_predictions", "teacher_consensus", "ground_truth",
                  "model_samples")

    def __init__(
        self,
        *args,
        ckpt_model: Optional[str] = None,
        ckpt_teacher: Optional[str] = None,
        momentum: float = 0.999,
        do_consensus_masking: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.ckpt_model = ckpt_model
        self.ckpt_teacher = ckpt_teacher
        self.momentum = momentum
        self.do_consensus_masking = do_consensus_masking

    def make_train_step(self):
        return steps_lib.make_mean_teacher_step(
            self.model,
            self.tx,
            momentum=self.momentum,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )

    def make_val_step(self):
        return steps_lib.make_mean_teacher_val_step(
            self.model,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )

    def make_panel_fn(self):
        return steps_lib.make_mean_teacher_panels(
            self.model, do_consensus_masking=self.do_consensus_masking
        )

    def _post_initialize(self):
        # Warm-start student and teacher from the source checkpoint
        # (reference mean_teacher_trainer.py:44-50).
        if self.ckpt_model is not None:
            self.warm_start(self.ckpt_model)
        if self.ckpt_teacher is not None:
            self.warm_start(self.ckpt_teacher, into_teacher=True)


class FixMatchTrainer(_PUNetInitMixin, Trainer):
    """Separate-training FixMatch (reference fixmatch_trainer.py)."""

    #: the reference FixMatchLogger writes ONE grid panel
    #: (fixmatch_trainer.py:193-196)
    default_logger_cls = FixMatchLogger
    image_tags = ("weak-strong-labels-pred",)

    def __init__(
        self,
        *args,
        ckpt_model: Optional[str] = None,
        source_distribution=None,
        do_consensus_masking: bool = False,
        **kwargs,
    ):
        super().__init__(*args, **kwargs)
        self.ckpt_model = ckpt_model
        self.source_distribution = source_distribution
        self.do_consensus_masking = do_consensus_masking

    def make_train_step(self):
        return steps_lib.make_fixmatch_step(
            self.model,
            self.tx,
            source_distribution=self.source_distribution,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )

    def make_val_step(self):
        return steps_lib.make_fixmatch_val_step(
            self.model,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )

    def make_panel_fn(self):
        return steps_lib.make_fixmatch_panels(
            self.model, do_consensus_masking=self.do_consensus_masking
        )

    def assemble_panels(self, raw: dict) -> dict:
        # fixmatch_trainer.py:193-196: one make_grid(nrow=2, padding=8) of
        # [normed weak, normed strong, pseudo-labels, prediction]
        from .logging import _normalize, make_grid

        grid = make_grid(
            [
                _normalize(np.asarray(raw["weak_aug"], np.float32)),
                _normalize(np.asarray(raw["strong_aug"], np.float32)),
                np.asarray(raw["pseudo_labels"], np.float32),
                np.asarray(raw["prediction"], np.float32),
            ],
            nrow=2,
            padding=8,
        )
        return {"weak-strong-labels-pred": grid}

    def _post_initialize(self):
        if self.ckpt_model is not None:
            self.warm_start(self.ckpt_model)


class _JointTrainer(_PUNetInitMixin, Trainer):
    """Joint source+target training: zipped loaders, epoch = the shorter one
    (reference adamt_trainer.py:24-26,89)."""

    def __init__(self, name, model, source_train_loader, target_train_loader,
                 val_loader, **kwargs):
        train_loader = (
            source_train_loader
            if len(source_train_loader) < len(target_train_loader)
            else target_train_loader
        )
        super().__init__(name, model, train_loader, val_loader, **kwargs)
        self.source_train_loader = source_train_loader
        self.target_train_loader = target_train_loader

    def train_batches(self):
        for (xs, ys), (xt, xt1, xt2, yt) in zip(
            self.source_train_loader, self.target_train_loader
        ):
            yield (xs, ys, xt, xt1, xt2, yt)

    def epoch_length(self):
        return min(len(self.source_train_loader), len(self.target_train_loader))

    def init_params(self, key, example_batch):
        xs = np.asarray(example_batch[0])
        y = np.zeros((*xs.shape[:-1], self.model.num_classes), dtype=np.float32)
        return self.model.init(key, jnp.asarray(xs), jnp.asarray(y))["params"]

    def _example_batch(self):
        try:
            return next(self.train_batches())
        except StopIteration:
            raise RuntimeError(
                "joint train stream yielded zero batches — one of the "
                "source/target loaders is empty (n_samples too small for "
                "the sample count, or no matching files)"
            ) from None

    def panel_batch(self, batch):
        # the reference joint loggers panel only the TARGET-side tensors
        # (adamt_trainer.py:120-124 passes xt, xt1, xt2 at train time too);
        # the 6-tuple train batch reduces to its target half, the 4-tuple
        # val batch is already target-only
        return batch[2:] if len(batch) == 6 else batch


class AdaMTTrainer(_JointTrainer):
    """Joint mean teacher (reference adamt_trainer.py)."""

    with_teacher = True
    default_logger_cls = AdaMTLogger
    image_tags = ("target_inputs", "weak_aug1", "weak_aug2",
                  "teacher_predictions", "teacher_consensus",
                  "target_ground_truth", "model_samples")

    def __init__(self, *args, momentum: float = 0.999,
                 do_consensus_masking: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.momentum = momentum
        self.do_consensus_masking = do_consensus_masking

    def make_panel_fn(self):
        return steps_lib.make_adamt_panels(
            self.model, do_consensus_masking=self.do_consensus_masking
        )

    def make_train_step(self):
        return steps_lib.make_adamt_step(
            self.model,
            self.tx,
            momentum=self.momentum,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )

    def make_val_step(self):
        return steps_lib.make_adamt_val_step(
            self.model,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )


class AdaMatchTrainer(_JointTrainer):
    """Joint FixMatch-style training, no teacher (reference adamatch_trainer.py)."""

    default_logger_cls = AdaMatchLogger
    image_tags = ("target_inputs", "weak_aug", "strong_aug",
                  "weak_model_predictions", "weak_model_consensus",
                  "target_ground_truth", "model_samples")

    def __init__(self, *args, do_consensus_masking: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        self.do_consensus_masking = do_consensus_masking

    def make_panel_fn(self):
        return steps_lib.make_adamatch_panels(
            self.model, do_consensus_masking=self.do_consensus_masking
        )

    def make_train_step(self):
        return steps_lib.make_adamatch_step(
            self.model,
            self.tx,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )

    def make_val_step(self):
        return steps_lib.make_adamatch_val_step(
            self.model,
            do_consensus_masking=self.do_consensus_masking,
            axis_name=self._axis_name,
        )
