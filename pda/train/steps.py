"""Per-algorithm train/validation step functions — fully jittable.

Each factory closes over (model, optimizer) and returns pure functions
``(state, *batch) -> (state, metrics)``. The engine jits them with donated
state and mesh shardings. Every algorithm of the reference is here:

  supervised PUNet     (reference prob_utils/my_trainer/punet_trainer.py)
  pseudo UNet          (punet_target_trainer.py:12-67,  PseudoTrainer)
  pseudo PUNet         (punet_target_trainer.py:92-183, PseudoTrainerPUNet)
  mean teacher         (mean_teacher_trainer.py)
  fixmatch             (fixmatch_trainer.py)
  adamt  (joint MT)    (adamt_trainer.py)
  adamatch (joint FM)  (adamatch_trainer.py)
  supervised UNet      (torch_em default_segmentation_trainer equivalent)

Design deltas vs the reference (SURVEY.md section 7):
  * teacher MC-16 sampling + consensus + student forward/backward + EMA update
    compile into ONE XLA program per step — no host round-trips on the hot
    path (the BASELINE north star);
  * the per-sample Python loops become a vmapped latent batch that shares the
    UNet features and the first Fcomb matmul across samples;
  * the EMA parameter loop becomes a tree_map inside the same program.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..core import (
    consensus_from_logits,
    dice_loss,
    dice_score_jnp,
    distribution_alignment,
    ema_update,
    neg_elbo,
    ramped_momentum,
)
from ..models.punet import ProbabilisticUnet, mc_decode_logits
from .state import TrainState, punet_l2_reg

REG_WEIGHT = 1e-5  # reference: punet_trainer.py:34 et al.
N_MC_TRAIN = 16  # reference: mean_teacher_trainer.py:36
N_MC_VAL = 8  # reference: punet_trainer.py:70


# ---------------------------------------------------------------------------
# shared pieces
# ---------------------------------------------------------------------------


def _space():
    """Row-sharding axis declared by the engine's trace-time context
    (pda.models.blocks.space_sharding) on a 2-D (data, space) shard_map
    mesh; None otherwise. Read at trace time, like the conv-path pins."""
    from ..models.blocks import space_axis

    return space_axis()


def _with_space(axis_name):
    """Axis spec for PIXEL-level reductions: the batch axis plus, under row
    sharding, the space axis (per-image reductions keep ``axis_name`` alone —
    row shards carry identical per-image stats)."""
    sp = _space()
    if sp is None:
        return axis_name
    if axis_name is None:
        return (sp,)
    return (axis_name, sp) if isinstance(axis_name, str) else (*axis_name, sp)


def _punet_loss(
    model: ProbabilisticUnet, params, x, segm, key, consm=None, axis_name=None,
    reconstruct_posterior_mean: bool = False,
):
    """-elbo + 1e-5 * l2_reg — the loss every PUNet trainer assembles
    (reference punet_trainer.py:29-34).

    ``reconstruct_posterior_mean`` decodes the posterior MEAN instead of the
    draw for the reconstruction term, while the MC-KL option still evaluates
    at the draw — exactly the reference's ``elbo(...,
    reconstruct_posterior_mean=True)`` (probabilistic_unet.py:341,352-358;
    unused by every reference experiment script, kept for protocol parity).

    Returns ``(objective, aux)`` where ``aux["loss"]`` is the TRUE loss value.
    With ``axis_name`` (inside shard_map over batch shards) the in-loss psums
    make the data terms global already, but the psum the caller applies to the
    GRADIENTS would multiply the parameter-only l2 term by the shard count —
    so the differentiation objective carries ``reg / n_shards`` while
    ``aux["loss"]`` reports the full value.
    """
    from ..models.punet import fcomb_decode_flat

    enc = model.apply(
        {"params": params}, x, segm, flat_features=True, method="encode"
    )
    z_post = enc.posterior.sample(key, axis_name=axis_name)
    z_rec = enc.posterior.mu if reconstruct_posterior_mean else z_post
    if enc.feat_geom is not None:
        recon = fcomb_decode_flat(
            model, params["fcomb"], enc.features, enc.feat_geom, z_rec
        )
    else:
        recon = model.apply(
            {"params": params}, enc.features, z_rec, method="decode"
        )
    nelbo, aux = neg_elbo(
        recon,
        segm,
        enc.posterior,
        enc.prior,
        beta=model.beta,
        rl_swap=model.rl_swap,
        consensus_mask=consm,
        consensus_masking=model.consensus_masking,
        analytic_kl=getattr(model, "analytic_kl", True),
        z_posterior=z_post,
        axis_name=axis_name,
        space_axis=_space(),
    )
    reg = punet_l2_reg(params)
    loss = nelbo + REG_WEIGHT * reg
    aux = {"loss": loss, **aux}
    all_axes = _with_space(axis_name)
    if all_axes is None:
        return loss, aux
    n = 1
    for a in ((all_axes,) if isinstance(all_axes, str) else all_axes):
        n *= jax.lax.axis_size(a)
    return nelbo + (REG_WEIGHT / n) * reg, aux


#: Use the Pallas fused MC kernel inside train steps. Default False — XLA's
#: vmapped shared-feature tail wins at the hot geometry even against the
#: lane-PACKED kernel variant (mc_consensus.py pack=True: position pairs
#: share 128-lane rows, block-diagonal tail weights). Measured standalone at
#: 512^2 bs2 MC-16 on v5e: XLA tail 3.75 ms; kernel 9.1 ms unpacked,
#: 6.3 ms packed (row_tile 512-2048 indistinguishable); step-level A/B
#: agreed (18.9 patches/s with the packed kernel vs 19.8 without). The
#: sample loop's dependent relu->matmul->relu chain can't keep the MXU fed,
#: while XLA's batched formulation runs the mid conv as one huge matmul.
#: Env override PDA_PALLAS_MC=0/1.
USE_PALLAS_MC = False


def _pallas_mc_enabled(model) -> bool:
    import os

    flag = os.environ.get("PDA_PALLAS_MC", "")
    if flag in ("0", "1"):
        return flag == "1" and model.num_classes == 1
    return bool(USE_PALLAS_MC) and model.num_classes == 1


def _mc_pseudo(model, params, x, key, n_samples, masking, axis_name=None):
    """Teacher-style MC pseudo-label + consensus, gradient-free.

    reference mean_teacher_trainer.py:72-88 (sample_from_teacher) /
    fixmatch_trainer.py:37-54 (sample_from_weak_model).

    On TPU the per-sample Fcomb tail + consensus reduction runs as a fused
    Pallas kernel (pda.kernels.mc_consensus) that never materializes the
    per-sample logit stack in HBM; elsewhere it is the vmapped XLA path.
    Under shard_map (``axis_name``) the XLA path is used so the latent draws
    come from the global-batch noise slice (exact mesh equivalence).
    """
    if _pallas_mc_enabled(model) and axis_name is None:
        from ..kernels.mc_consensus import mc_pseudo_fused

        y, z = mc_pseudo_fused(model, params, x, key, n_samples, masking)
        return jax.lax.stop_gradient(y), jax.lax.stop_gradient(z)
    params = jax.lax.stop_gradient(params)
    enc = model.apply({"params": params}, x, method="encode")
    logits = mc_decode_logits(
        model, params, enc.features, enc.prior, key, n_samples,
        axis_name=axis_name,
    )
    y, z = consensus_from_logits(logits, masking=masking)
    return jax.lax.stop_gradient(y), jax.lax.stop_gradient(z)


def _mc_mean_probs(model, params, x, key, n_samples, axis_name=None):
    """Mean sigmoid of n prior samples (validation predictor,
    reference punet_trainer.py:70-78)."""
    enc = model.apply({"params": params}, x, method="encode")
    logits = mc_decode_logits(
        model, params, enc.features, enc.prior, key, n_samples,
        axis_name=axis_name,
    )
    return jnp.mean(jax.nn.sigmoid(logits), axis=0)


def _apply_updates(tx, state: TrainState, grads, rng, axis_name=None) -> TrainState:
    all_axes = _with_space(axis_name)
    if all_axes is not None:
        # each shard holds its local-data (and, row-sharded, local-rows)
        # contribution to the global-batch gradient (the loss psums run in
        # the forward); sum them so every shard applies the exact
        # single-device update
        grads = jax.lax.psum(grads, all_axes)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return state.replace(
        step=state.step + 1, params=params, opt_state=opt_state, rng=rng
    )


# ---------------------------------------------------------------------------
# supervised PUNet (source training)
# ---------------------------------------------------------------------------


def make_supervised_punet_step(model: ProbabilisticUnet, tx, *, axis_name=None):
    """PUNetTrainer._train_epoch_impl equivalent (punet_trainer.py:19-50).

    ``axis_name`` (all step factories): name of the mesh axis the batch is
    sharded over when the engine runs the step inside ``jax.shard_map`` —
    the losses psum their batch reductions and the gradients psum across
    shards, reproducing the single-device step exactly while the fused
    Pallas kernels keep running per shard (pda/parallel/mesh.py).
    """

    def step(state: TrainState, x, y):
        rng, k_post = jax.random.split(state.rng)

        def loss_fn(params):
            return _punet_loss(model, params, x, y, k_post, axis_name=axis_name)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        return state, aux

    return step


def make_punet_val_step(
    model: ProbabilisticUnet, n_samples: int = N_MC_VAL, *, axis_name=None
):
    """PUNetTrainer._validate_impl equivalent (punet_trainer.py:52-97):
    train-style loss + MC-n mean-prob dice vs target; metric = 1 - dice."""

    def step(state: TrainState, x, y):
        rng, k_post, k_mc = jax.random.split(state.rng, 3)
        _, aux = _punet_loss(model, state.params, x, y, k_post, axis_name=axis_name)
        pred = _mc_mean_probs(model, state.params, x, k_mc, n_samples, axis_name)
        dice = dice_score_jnp(pred, y, axis_name=_with_space(axis_name))
        state = state.replace(rng=rng)
        return state, {"loss": aux["loss"], "dice": dice, "metric": 1.0 - dice}

    return step


# ---------------------------------------------------------------------------
# pseudo-label target training (file-mediated pipeline)
# ---------------------------------------------------------------------------


def make_pseudo_unet_step(model, tx, *, axis_name=None):
    """PseudoTrainer equivalent: UNet on fixed pseudo-labels with
    consensus-masked dice loss(pred*z, y*z) (punet_target_trainer.py:26-29)."""

    def step(state: TrainState, x, y, z):
        rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            pred = model.apply({"params": params}, x)
            return dice_loss(pred * z, y * z, axis_name=_with_space(axis_name))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        return state, {"loss": loss}

    return step


def make_pseudo_unet_val_step(model, *, axis_name=None):
    def step(state: TrainState, x, y, z):
        pred = model.apply({"params": state.params}, x)
        loss = dice_loss(pred * z, y * z, axis_name=_with_space(axis_name))
        return state, {"loss": loss, "metric": loss}

    return step


def make_pseudo_punet_step(model: ProbabilisticUnet, tx, *, axis_name=None):
    """PseudoTrainerPUNet equivalent: ELBO on precomputed pseudo-labels y with
    consensus response z from disk (punet_target_trainer.py:99-133)."""

    def step(state: TrainState, x, y, z):
        rng, k_post = jax.random.split(state.rng)

        def loss_fn(params):
            return _punet_loss(
                model, params, x, y, k_post, consm=z, axis_name=axis_name
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        return state, aux

    return step


def make_pseudo_punet_val_step(
    model: ProbabilisticUnet, n_samples: int = N_MC_VAL, *, axis_name=None
):
    """punet_target_trainer.py:135-183: consensus-weighted loss + MC dice vs y."""

    def step(state: TrainState, x, y, z):
        rng, k_post, k_mc = jax.random.split(state.rng, 3)
        _, aux = _punet_loss(
            model, state.params, x, y, k_post, consm=z, axis_name=axis_name
        )
        pred = _mc_mean_probs(model, state.params, x, k_mc, n_samples, axis_name)
        dice = dice_score_jnp(pred, y, axis_name=_with_space(axis_name))
        state = state.replace(rng=rng)
        return state, {"loss": aux["loss"], "dice": dice, "metric": 1.0 - dice}

    return step


# ---------------------------------------------------------------------------
# mean teacher (separate self-training)
# ---------------------------------------------------------------------------


def make_mean_teacher_step(
    model: ProbabilisticUnet,
    tx,
    *,
    momentum: float = 0.999,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    """MeanTeacherTrainer._train_epoch_impl equivalent
    (mean_teacher_trainer.py:95-140): teacher MC-16 on weak view x1 ->
    (pseudo y, consensus z); student ELBO on (x2, y, z); flat-momentum EMA.

    The reference gates the EMA update on ``lr`` being truthy
    (mean_teacher_trainer.py:126-131) which in practice is always true —
    here it is unconditional.
    """

    def step(state: TrainState, x, x1, x2, gt):
        rng, k_t, k_post = jax.random.split(state.rng, 3)
        y, z = _mc_pseudo(
            model, state.teacher_params, x1, k_t, n_samples,
            do_consensus_masking, axis_name,
        )

        def loss_fn(params):
            return _punet_loss(
                model, params, x2, y, k_post, consm=z, axis_name=axis_name
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        teacher = ema_update(state.teacher_params, state.params, momentum)
        state = state.replace(teacher_params=teacher)
        return state, aux

    return step


def make_mean_teacher_val_step(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    """mean_teacher_trainer.py:142-191: teacher pseudo on x1, loss on (x2,y,z),
    model MC mean-prob dice vs pseudo y (metric) and vs true gt (gt_metric)."""

    def step(state: TrainState, x, x1, x2, gt):
        rng, k_t, k_post, k_mc = jax.random.split(state.rng, 4)
        y, z = _mc_pseudo(
            model, state.teacher_params, x1, k_t, n_samples,
            do_consensus_masking, axis_name,
        )
        _, aux = _punet_loss(
            model, state.params, x2, y, k_post, consm=z, axis_name=axis_name
        )
        pred = _mc_mean_probs(model, state.params, x2, k_mc, n_samples, axis_name)
        dice = dice_score_jnp(pred, y, axis_name=_with_space(axis_name))
        gt_dice = dice_score_jnp(pred, gt, axis_name=_with_space(axis_name))
        state = state.replace(rng=rng)
        return state, {
            "loss": aux["loss"],
            "dice": dice,
            "metric": 1.0 - dice,
            "gt_metric": 1.0 - gt_dice,
        }

    return step


# ---------------------------------------------------------------------------
# fixmatch (separate self-training, no teacher)
# ---------------------------------------------------------------------------


def make_fixmatch_step(
    model: ProbabilisticUnet,
    tx,
    *,
    source_distribution: Optional[jnp.ndarray] = None,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    """FixMatchTrainer._train_epoch_impl equivalent (fixmatch_trainer.py:61-109):
    the SAME model (gradient-stopped) does MC-16 on the weak view -> pseudo y,
    consensus z; optional distribution alignment rescales y by source/target
    class-frequency ratio; student ELBO on the strong view."""

    def step(state: TrainState, x, x1, x2, gt):
        rng, k_w, k_post = jax.random.split(state.rng, 3)
        y, z = _mc_pseudo(
            model, state.params, x1, k_w, n_samples, do_consensus_masking,
            axis_name,
        )

        if source_distribution is not None:
            y, ratio = distribution_alignment(
                y, jnp.asarray(source_distribution),
                axis_name=_with_space(axis_name),
            )
        else:
            ratio = jnp.zeros((2,))

        def loss_fn(params):
            return _punet_loss(
                model, params, x2, y, k_post, consm=z, axis_name=axis_name
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        return state, {
            "distr_ratio_bg": ratio[0],
            "distr_ratio_fg": ratio[1],
            **aux,
        }

    return step


def make_fixmatch_val_step(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    """fixmatch_trainer.py:111-160 (no distribution alignment at val time)."""

    def step(state: TrainState, x, x1, x2, gt):
        rng, k_w, k_post, k_mc = jax.random.split(state.rng, 4)
        y, z = _mc_pseudo(
            model, state.params, x1, k_w, n_samples, do_consensus_masking,
            axis_name,
        )
        _, aux = _punet_loss(
            model, state.params, x2, y, k_post, consm=z, axis_name=axis_name
        )
        pred = _mc_mean_probs(model, state.params, x2, k_mc, n_samples, axis_name)
        dice = dice_score_jnp(pred, y, axis_name=_with_space(axis_name))
        gt_dice = dice_score_jnp(pred, gt, axis_name=_with_space(axis_name))
        state = state.replace(rng=rng)
        return state, {
            "loss": aux["loss"],
            "dice": dice,
            "metric": 1.0 - dice,
            "gt_metric": 1.0 - gt_dice,
        }

    return step


# ---------------------------------------------------------------------------
# joint training: AdaMT (teacher) / AdaMatch (self)
# ---------------------------------------------------------------------------


def make_adamt_step(
    model: ProbabilisticUnet,
    tx,
    *,
    momentum: float = 0.999,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    """AdaMTTrainer._train_epoch_impl equivalent (adamt_trainer.py:83-137):
    supervised source ELBO + teacher-pseudo target ELBO, averaged; ramped EMA
    min(1 - 1/(step+1), momentum)."""

    def step(state: TrainState, xs, ys, xt, xt1, xt2, yt):
        rng, k_s, k_t, k_post = jax.random.split(state.rng, 4)
        y, z = _mc_pseudo(
            model, state.teacher_params, xt1, k_t, n_samples,
            do_consensus_masking, axis_name,
        )

        def loss_fn(params):
            sup, sup_aux = _punet_loss(
                model, params, xs, ys, k_s, axis_name=axis_name
            )
            tgt, tgt_aux = _punet_loss(
                model, params, xt2, y, k_post, consm=z, axis_name=axis_name
            )
            return (sup + tgt) / 2.0, {
                "loss": (sup_aux["loss"] + tgt_aux["loss"]) / 2.0,
                "supervised_loss": sup_aux["loss"],
                "target_loss": tgt_aux["loss"],
            }

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        m = ramped_momentum(state.step.astype(jnp.float32), momentum)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        teacher = ema_update(state.teacher_params, state.params, m)
        state = state.replace(teacher_params=teacher)
        return state, aux

    return step


def make_adamt_val_step(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    """adamt_trainer.py:139-189 — target-only validation."""

    def step(state: TrainState, xt, xt1, xt2, yt):
        rng, k_t, k_post, k_mc = jax.random.split(state.rng, 4)
        y, z = _mc_pseudo(
            model, state.teacher_params, xt1, k_t, n_samples,
            do_consensus_masking, axis_name,
        )
        _, aux = _punet_loss(
            model, state.params, xt2, y, k_post, consm=z, axis_name=axis_name
        )
        pred = _mc_mean_probs(model, state.params, xt2, k_mc, n_samples, axis_name)
        dice = dice_score_jnp(pred, y, axis_name=_with_space(axis_name))
        gt_dice = dice_score_jnp(pred, yt, axis_name=_with_space(axis_name))
        state = state.replace(rng=rng)
        return state, {
            "loss": aux["loss"],
            "dice": dice,
            "metric": 1.0 - dice,
            "gt_metric": 1.0 - gt_dice,
        }

    return step


def make_adamatch_step(
    model: ProbabilisticUnet,
    tx,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    """AdaMatchTrainer._train_epoch_impl equivalent (adamatch_trainer.py:56-116):
    like AdaMT but pseudo-labels come from the model itself (no teacher).
    The reference gates the consensus-weighted elbo on ``lr`` truthy
    (adamatch_trainer.py:87-94), which is always true in practice —
    unconditional here."""

    def step(state: TrainState, xs, ys, xt, xt1, xt2, yt):
        rng, k_s, k_w, k_post = jax.random.split(state.rng, 4)
        y, z = _mc_pseudo(
            model, state.params, xt1, k_w, n_samples, do_consensus_masking,
            axis_name,
        )

        def loss_fn(params):
            sup, sup_aux = _punet_loss(
                model, params, xs, ys, k_s, axis_name=axis_name
            )
            tgt, tgt_aux = _punet_loss(
                model, params, xt2, y, k_post, consm=z, axis_name=axis_name
            )
            return (sup + tgt) / 2.0, {
                "loss": (sup_aux["loss"] + tgt_aux["loss"]) / 2.0,
                "supervised_loss": sup_aux["loss"],
                "target_loss": tgt_aux["loss"],
            }

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        return state, aux

    return step


def make_adamatch_val_step(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
    axis_name=None,
):
    def step(state: TrainState, xt, xt1, xt2, yt):
        rng, k_w, k_post, k_mc = jax.random.split(state.rng, 4)
        y, z = _mc_pseudo(
            model, state.params, xt1, k_w, n_samples, do_consensus_masking,
            axis_name,
        )
        _, aux = _punet_loss(
            model, state.params, xt2, y, k_post, consm=z, axis_name=axis_name
        )
        pred = _mc_mean_probs(model, state.params, xt2, k_mc, n_samples, axis_name)
        dice = dice_score_jnp(pred, y, axis_name=_with_space(axis_name))
        gt_dice = dice_score_jnp(pred, yt, axis_name=_with_space(axis_name))
        state = state.replace(rng=rng)
        return state, {
            "loss": aux["loss"],
            "dice": dice,
            "metric": 1.0 - dice,
            "gt_metric": 1.0 - gt_dice,
        }

    return step


# ---------------------------------------------------------------------------
# supervised UNet (torch_em default_segmentation_trainer equivalent)
# ---------------------------------------------------------------------------


def make_supervised_unet_step(model, tx, *, axis_name=None):
    """Dice-loss supervised training of the plain UNet2d
    (reference LIVECell/livecell_unet.py:48-59 via torch_em
    default_segmentation_trainer: DiceLoss, Adam)."""

    def step(state: TrainState, x, y):
        rng, _ = jax.random.split(state.rng)

        def loss_fn(params):
            pred = model.apply({"params": params}, x)
            return dice_loss(pred, y, axis_name=_with_space(axis_name))

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        state = _apply_updates(tx, state, grads, rng, axis_name)
        return state, {"loss": loss}

    return step


def make_supervised_unet_val_step(model, *, axis_name=None):
    def step(state: TrainState, x, y):
        pred = model.apply({"params": state.params}, x)
        loss = dice_loss(pred, y, axis_name=_with_space(axis_name))
        return state, {"loss": loss, "metric": loss}

    return step


# ---------------------------------------------------------------------------
# TB image panels — the reference loggers' in-graph tensors
# ---------------------------------------------------------------------------
#
# Each factory returns a jittable ``panels(params, teacher_params, rng,
# *batch) -> dict[tag, array]`` producing the IMAGE TENSORS the matching
# reference logger puts on TensorBoard (pseudo-labels, consensus masks, MC
# samples, predictions — not just the input batch). The engine runs these in
# a SEPARATE forward-only program at ``log_image_interval`` steps on the
# first batch element only, so the hot train step is untouched; the panel
# tensors are recomputed with a panel-local RNG fold rather than smuggled out
# of the train step (statistically identical QC content, zero hot-path cost).


def _panel_keys(rng, n=3):
    return jax.random.split(jax.random.fold_in(rng, 0x9A7E15), n)


def _mc_sample_logits(model, params, x, key, n_samples):
    """n raw-logit prior samples (reference punet_trainer.py:15-17
    ``_sample``: ``[self.model.sample() for _ in range(n_samples)]``)."""
    params = jax.lax.stop_gradient(params)
    enc = model.apply({"params": params}, x, method="encode")
    return mc_decode_logits(
        model, params, enc.features, enc.prior, key, n_samples
    )


def make_punet_panels(model: ProbabilisticUnet, n_samples: int = 16):
    """PUNetLogger.add_image panel set (punet_trainer.py:110-114): input,
    target, and 16 raw prior samples (gridded host-side with
    ``make_grid(nrow=4, padding=4)``)."""

    def panels(params, teacher_params, rng, x, y):
        (k,) = _panel_keys(rng, 1)
        s = _mc_sample_logits(model, params, x[:1], k, n_samples)
        return {"input": x[0], "target": y[0], "samples": s[:, 0]}

    return panels


def make_pseudo_unet_panels(model):
    """PseudoLogger (UNet variant) panel set — torch_em TensorboardLogger
    ``add_image`` inherited by the reference's PseudoLogger
    (punet_target_trainer.py:80-89): input, target, prediction."""

    def panels(params, teacher_params, rng, x, y, z):
        pred = model.apply({"params": params}, x[:1])
        return {"input": x[0], "target": y[0], "prediction": pred[0]}

    return panels


def make_pseudo_punet_panels(model: ProbabilisticUnet, n_samples: int = 16):
    """PseudoTrainerPUNet logging (punet_target_trainer.py:120-124): input,
    target, and the ``_sample(16)`` grid (punet_target_trainer.py:95-97)."""

    def panels(params, teacher_params, rng, x, y, z):
        (k,) = _panel_keys(rng, 1)
        s = _mc_sample_logits(model, params, x[:1], k, n_samples)
        return {"input": x[0], "target": y[0], "samples": s[:, 0]}

    return panels


def make_mean_teacher_panels(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
):
    """MeanTeacherLogger.add_image panel set (mean_teacher_trainer.py:205-217):
    input, both augmented views, teacher pseudo-labels y, teacher consensus z,
    ground truth, and the model's MC mean-sigmoid prediction
    (``sample_from_model``, mean_teacher_trainer.py:90-93)."""

    def panels(params, teacher_params, rng, x, x1, x2, gt):
        k_t, k_m = _panel_keys(rng, 2)
        y, z = _mc_pseudo(
            model, teacher_params, x1[:1], k_t, n_samples,
            do_consensus_masking, None,
        )
        pred = _mc_mean_probs(model, params, x2[:1], k_m, n_samples)
        return {
            "input": x[0],
            "aug_inputs_1": x1[0],
            "aug_inputs_2": x2[0],
            "teacher_predictions": y[0],
            "teacher_consensus": z[0],
            "ground_truth": gt[0],
            "model_samples": pred[0],
        }

    return panels


def make_fixmatch_panels(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
):
    """FixMatchLogger.add_image components (fixmatch_trainer.py:174-196):
    the reference logs ONE ``weak-strong-labels-pred`` grid of
    [normed weak view, normed strong view, pseudo-labels, prediction]
    (``make_grid(nrow=2, padding=8)``); the four component images are
    returned here and gridded host-side by the trainer."""

    def panels(params, teacher_params, rng, x, x1, x2, gt):
        k_w, k_m = _panel_keys(rng, 2)
        y, z = _mc_pseudo(
            model, params, x1[:1], k_w, n_samples, do_consensus_masking, None
        )
        pred = _mc_mean_probs(model, params, x2[:1], k_m, n_samples)
        return {
            "weak_aug": x1[0],
            "strong_aug": x2[0],
            "pseudo_labels": y[0],
            "prediction": pred[0],
        }

    return panels


def make_adamt_panels(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
):
    """AdaMTLogger.add_image panel set (adamt_trainer.py:203-215): target
    inputs, both weak views, teacher pseudo y, teacher consensus z, target
    ground truth, model MC mean prediction. The reference writes both weak
    views under ONE tag (``weak_aug1`` twice — a tag collision that leaves
    only xt2 visible); here they get distinct ``weak_aug1``/``weak_aug2``
    tags so neither panel is lost."""

    def panels(params, teacher_params, rng, xt, xt1, xt2, yt):
        k_t, k_m = _panel_keys(rng, 2)
        y, z = _mc_pseudo(
            model, teacher_params, xt1[:1], k_t, n_samples,
            do_consensus_masking, None,
        )
        pred = _mc_mean_probs(model, params, xt2[:1], k_m, n_samples)
        return {
            "target_inputs": xt[0],
            "weak_aug1": xt1[0],
            "weak_aug2": xt2[0],
            "teacher_predictions": y[0],
            "teacher_consensus": z[0],
            "target_ground_truth": yt[0],
            "model_samples": pred[0],
        }

    return panels


def make_adamatch_panels(
    model: ProbabilisticUnet,
    *,
    do_consensus_masking: bool = False,
    n_samples: int = N_MC_TRAIN,
):
    """AdaMatchLogger.add_image panel set (adamatch_trainer.py:183-196):
    target inputs, weak/strong views, weak-model pseudo y + consensus z,
    target ground truth, model MC mean prediction."""

    def panels(params, teacher_params, rng, xt, xt1, xt2, yt):
        k_w, k_m = _panel_keys(rng, 2)
        y, z = _mc_pseudo(
            model, params, xt1[:1], k_w, n_samples, do_consensus_masking, None
        )
        pred = _mc_mean_probs(model, params, xt2[:1], k_m, n_samples)
        return {
            "target_inputs": xt[0],
            "weak_aug": xt1[0],
            "strong_aug": xt2[0],
            "weak_model_predictions": y[0],
            "weak_model_consensus": z[0],
            "target_ground_truth": yt[0],
            "model_samples": pred[0],
        }

    return panels


def make_supervised_unet_panels(model):
    """torch_em TensorboardLogger.add_image equivalent for the plain UNet
    trainer: input, target, prediction."""

    def panels(params, teacher_params, rng, x, y):
        pred = model.apply({"params": params}, x[:1])
        return {"input": x[0], "target": y[0], "prediction": pred[0]}

    return panels
