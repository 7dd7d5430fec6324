"""Benchmark: Mean-Teacher PUNet self-training throughput on TPU.

The BASELINE.json north star: PUNet Mean-Teacher training on LIVECell-shaped
patches with the teacher MC-16 forward + consensus mask fused into the same
XLA program as the student step. This benchmark measures end-to-end train-step
throughput (patches/sec/chip) at the reference configuration
(filters (64,128,256,512), latent 6, fcomb 3, MC-16 teacher, patch 512^2,
batch 2 — reference LIVECell/livecell_mt.py:29-41,94-113).

``vs_baseline`` compares against a torch-style "direct translation" step
implemented in JAX: 16 sequential full Fcomb decodes (no shared feature
term), consensus assembled sample-by-sample, EMA as a separate dispatch —
i.e. the reference's computation graph without the TPU-first fusions. The
baseline runs with the Pallas conv kernels DISABLED (plain XLA convs +
autodiff) so it keeps representing the reference's execution structure.

Budget discipline (round 3): the driver runs this under a hard timeout, so
the benchmark is shaped to always print its JSON line inside
``PDA_BENCH_BUDGET_S`` (default 420 s) wall-clock:

  * JAX's persistent compilation cache is enabled at ``.jax_cache/`` in the
    repo (verified to work through the axon remote-compile path — compile
    drops to ~0 s on a warm cache; a per-program first-execution load cost
    of a few seconds remains).
  * The FUSED step is built and timed FIRST. The naive baseline is only
    measured if enough budget remains (it needs several extra program
    compiles + loads); otherwise ``vs_baseline`` falls back to the last
    fully-measured ratio at the default config, flagged via
    ``"vs_baseline_source"``: ``"recorded"`` (budget skip),
    ``"recorded-after-error"`` (baseline crashed), or
    ``"unmeasured-config"`` with a null ratio at non-default geometries.
  * The transient-failure retry re-execs once but inherits the ORIGINAL
    deadline through the environment, so the worst case cannot double.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import os
import time

T0_WALL = time.time()
# Absolute deadline; survives the retry re-exec via PDA_BENCH_DEADLINE,
# which is exported only right before the re-exec (__main__ below) so merely
# IMPORTING this module (development/dump_hlo.py etc.) never leaks a stale
# deadline into the environment of unrelated child processes.
_DEADLINE = float(
    os.environ.get("PDA_BENCH_DEADLINE")
    or T0_WALL + float(os.environ.get("PDA_BENCH_BUDGET_S", 420))
)


def remaining() -> float:
    return _DEADLINE - time.time()


import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

BATCH = int(os.environ.get("PDA_BENCH_BATCH", 2))
HW = int(os.environ.get("PDA_BENCH_HW", 512))
N_MC = 16
FILTERS = (64, 128, 256, 512)
WARMUP = 3
ITERS = int(os.environ.get("PDA_BENCH_ITERS", 20))
DTYPE = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
    os.environ.get("PDA_BENCH_DTYPE", "bf16")
]

# Last fully-measured fused/naive time ratio at this exact config. Used only
# when the remaining budget cannot fit the baseline's compiles; flagged in
# the JSON. Valid ONLY on the device kind it was measured on — on any other
# backend the fallback emits null + "unmeasured-config" instead (a recorded
# v5e ratio says nothing about other hardware).
RECORDED_VS_BASELINE = 2.43  # round-5 live measurement (29.42 patches/s, median-of-3)
RECORDED_DEVICE_KIND = "TPU v5 lite"  # jax.devices()[0].device_kind at measurement

# Useful-FLOPs floor of the fused MT step at the DEFAULT config (512^2, bs 2,
# MC-16, bf16, flagship filters): 6.9 TFLOP/step (device-trace roofline audit,
# IMPLEMENTATION_STATUS.md round-2; includes the packed kernels' 1.33x MXU
# overwork) against v5e peak 197 TFLOP/s bf16 => ~35 ms. Used ONLY to report
# extra.whole_step_mxu_util = floor_ms / device_ms at the default config.
USEFUL_TFLOP_PER_STEP = 6.9
V5E_PEAK_TFLOPS_BF16 = 197.0


def build():
    from pda.models import ProbabilisticUnet
    from pda.train.optim import adam
    from pda.train.state import create_train_state
    from pda.train.steps import make_mean_teacher_step

    model = ProbabilisticUnet(
        input_channels=1,
        num_classes=1,
        num_filters=FILTERS,
        latent_dim=6,
        no_convs_fcomb=3,
        beta=1.0,
        rl_swap=True,
        consensus_masking=True,
        dtype=DTYPE,
    )
    tx = adam(1e-5)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    # init on CPU — the init program compiles pathologically on the TPU
    # remote-compile path; the train step itself compiles fast.
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(key, x0, x0)["params"]
        state = create_train_state(params, tx, key, with_teacher=True)
    state = jax.device_put(state, jax.devices()[0])
    step = jax.jit(
        make_mean_teacher_step(model, tx, do_consensus_masking=True),
        donate_argnums=0,
    )
    return model, tx, state, step


def build_naive(model, tx):
    """Direct-translation baseline: the reference's EXECUTION STRUCTURE.

    The reference (mean_teacher_trainer.py:95-140) runs, per training step:
      * one teacher forward dispatch,
      * a 16-iteration PYTHON loop of separate sample() dispatches, each a
        full Fcomb decode, materializing every sample map,
      * a separate consensus reduction,
      * a separate student forward/backward dispatch,
      * a separate parameter-loop EMA update.
    This baseline reproduces that dispatch/materialization structure in JAX
    (each piece its own jitted program, samples stacked in HBM); the fused
    step compiles all of it into ONE program with shared features and no
    sample stack."""
    import optax

    from pda.core import consensus_from_probs, ema_update
    from pda.train.steps import _punet_loss

    encode = jax.jit(
        lambda p, x: model.apply({"params": p}, x, method="encode")
    )
    decode_sig = jax.jit(
        lambda p, f, z: jax.nn.sigmoid(
            model.apply({"params": p}, f, z, method="decode")
        )
    )
    consensus = jax.jit(
        lambda stack: consensus_from_probs(stack, masking=True)
    )

    def student_update(state, x2, y, zc, k_post):
        def loss_fn(params):
            return _punet_loss(model, params, x2, y, k_post, consm=zc)

        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(
            step=state.step + 1, params=params, opt_state=opt_state
        ), loss

    student_update = jax.jit(student_update, donate_argnums=0)
    naive_ema = jax.jit(
        lambda state: state.replace(
            teacher_params=ema_update(state.teacher_params, state.params, 0.999)
        ),
        donate_argnums=0,
    )

    def naive_step(state, x, x1, x2, gt):
        rng, k_post = jax.random.split(state.rng)
        enc = encode(state.teacher_params, x1)
        samples = []
        key = rng
        for _ in range(N_MC):  # the reference's per-sample Python loop
            key, sub = jax.random.split(key)
            z = enc.prior.sample(sub)
            samples.append(decode_sig(state.teacher_params, enc.features, z))
        y, zc = consensus(jnp.stack(samples, axis=0))
        state, loss = student_update(state, x2, y, zc, k_post)
        state = state.replace(rng=rng)
        return naive_ema(state), loss

    return naive_step


def naive_infer_frame_seconds(model, iparams, img_np, n_mc=16, repeats=3):
    """Reference-STRUCTURE tiled MC-16 prediction, timed per frame: host-side
    reflect pad + per-tile crop, ONE device call for the tile encode, a
    sequential per-sample Python loop of separate decode dispatches
    (each sample a full Fcomb decode materialized on device), per-tile host
    fetch, host-side stitch — the execution shape of
    /root/reference/prob_utils/my_predictions/punet_predictions.py:15-63
    (predict_with_halo + `[sigmoid(sample()) for _ in range(n)]`).

    Used to put a measured baseline under extra.mc16_tiles_per_sec
    (VERDICT r4 item 5). Note: per-dispatch latency through the axon tunnel
    inflates this baseline relative to a local accelerator; the reported
    ratio is flagged tunnel-dispatch-inclusive."""
    import math

    h, w = img_np.shape[:2]
    bh, bw, hh, hw = 384, 384, 64, 64
    gy, gx = math.ceil(h / bh), math.ceil(w / bw)
    padded = np.pad(
        img_np,
        ((hh, gy * bh - h + hh), (hw, gx * bw - w + hw), (0, 0)),
        mode="reflect",
    )

    encode = jax.jit(
        lambda p, t: model.apply({"params": p}, t, method="encode")
    )
    decode_sig = jax.jit(
        lambda p, f, z: jax.nn.sigmoid(
            model.apply({"params": p}, f, z, method="decode")
        )
    )

    def one_frame(key):
        tiles_out = []
        for ty in range(gy):
            for tx in range(gx):
                tile = padded[
                    ty * bh : ty * bh + bh + 2 * hh,
                    tx * bw : tx * bw + bw + 2 * hw,
                ]
                tile = (tile - tile.mean()) / (tile.std() + 1e-7)
                t = jnp.asarray(tile[None].astype(np.float32))
                enc = encode(iparams, t)
                acc = None
                for _ in range(n_mc):  # the reference's per-sample loop
                    key_, key = jax.random.split(key)
                    z = enc.prior.sample(key_)
                    probs = decode_sig(iparams, enc.features, z)
                    acc = probs if acc is None else acc + probs
                tiles_out.append(np.asarray(acc[0]) / n_mc)  # per-tile fetch
        grid = np.stack(tiles_out).reshape(gy, gx, *tiles_out[0].shape)
        centers = grid[:, :, hh : hh + bh, hw : hw + bw]
        full = centers.transpose(0, 2, 1, 3, 4).reshape(
            gy * bh, gx * bw, -1
        )
        return full[:h, :w]

    one_frame(jax.random.PRNGKey(0))  # warm the two programs
    times = []
    for r in range(repeats):
        if times and remaining() < 30:
            break
        t0 = time.perf_counter()
        one_frame(jax.random.PRNGKey(r + 1))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def fence(state):
    """True device fence. The axon TPU platform's ``block_until_ready`` can
    acknowledge before execution completes (measured: impossible >1 PFLOP/s
    "throughputs"); a one-element host transfer that data-depends on the
    final state cannot return early."""
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(np.asarray(leaf.ravel()[0]))


def timed(run, state, batch, iters, repeats=3, min_budget_s=20.0):
    """Median over ``repeats`` timing loops of ``iters`` steps each.

    A single loop's mean wobbles run-to-run by up to ~15% on this platform
    (VERDICT r4 weak #2: the official vs_baseline swung across the 2x line
    on single measurements); the median of >= 3 loops is the reported
    number. Later repeats are skipped if the deadline approaches."""
    for _ in range(WARMUP):
        state = run(state, batch)
    fence(state)
    times = []
    for r in range(repeats):
        if times and remaining() < min_budget_s:
            break  # keep what we have rather than blow the deadline
        t0 = time.perf_counter()
        for _ in range(iters):
            state = run(state, batch)
        fence(state)
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times)), state


def device_ms_per_step(step, state, batch, n_steps=4):
    """Device-trace-derived ms/step: total leaf-op device time under
    ``jax.profiler`` divided by the traced step count (the same extraction
    as development/profile_step.py — wall ms/step includes host dispatch
    through the axon tunnel; this number is the honest device clock)."""
    import collections
    import glob
    import gzip
    import re
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="pda_bench_trace_")
    try:
        jax.profiler.start_trace(out)
        for _ in range(n_steps):
            state, _ = step(state, *batch)
        fence(state)
        jax.profiler.stop_trace()
        traces = sorted(
            glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                      recursive=True)
        )
        if not traces:
            return None, state
        with gzip.open(traces[-1], "rt") as f:
            data = json.load(f)
        events = [e for e in data.get("traceEvents", [])
                  if e.get("ph") == "X" and "dur" in e]
        pid_names = {}
        for e in data.get("traceEvents", []):
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
        device_pids = {pid for pid, name in pid_names.items() if "TPU" in name}
        if not device_pids:
            by_pid = collections.defaultdict(float)
            for e in events:
                by_pid[e["pid"]] += e["dur"]
            if not by_pid:
                return None, state
            device_pids = {max(by_pid, key=by_pid.get)}
        total_us = 0.0
        for e in events:
            if e["pid"] not in device_pids:
                continue
            name = e.get("name", "?")
            if name.startswith("jit_") or re.fullmatch(r"\d+", name):
                continue  # module envelopes / step-number lanes
            total_us += e["dur"]
        return (total_us / 1e3) / n_steps, state
    finally:
        shutil.rmtree(out, ignore_errors=True)


def main():
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.normal(size=(BATCH, HW, HW, 1)).astype(np.float32))
        for _ in range(4)
    )

    model, tx, state, step = build()

    def run_fused(state, batch):
        state, _ = step(state, *batch)
        return state

    t_fused, state = timed(run_fused, state, batch, ITERS)
    patches_per_sec = BATCH / t_fused

    # Device-trace clock (VERDICT r4 item 2): leaf-op device ms/step + MXU
    # utilization against the audited useful-FLOPs floor. Budget-gated; the
    # trace costs a few seconds on a warm step.
    device_ms = None
    mxu_util = None
    if remaining() > float(os.environ.get("PDA_BENCH_TRACE_BUDGET_S", 240)):
        try:
            device_ms, state = device_ms_per_step(step, state, batch)
        except Exception:
            import traceback

            traceback.print_exc()  # never lose the primary metric
    if device_ms:
        floor_ms = USEFUL_TFLOP_PER_STEP / V5E_PEAK_TFLOPS_BF16 * 1e3
        if (BATCH == 2 and HW == 512 and DTYPE == jnp.bfloat16
                and jax.devices()[0].device_kind == RECORDED_DEVICE_KIND):
            mxu_util = floor_ms / device_ms
    del state  # free HBM before the baseline builds its own state

    # The naive baseline needs ~5 extra program compiles + first-exec loads
    # plus (WARMUP + max(ITERS//4, 5)) slow steps; only attempt it when the
    # budget clearly fits, else report the recorded ratio (flagged). The
    # recorded ratio was measured at the DEFAULT config on RECORDED_DEVICE_KIND
    # only — at any other geometry/dtype/device there is no honest fallback
    # number, so emit null with a distinct source instead of publishing an
    # inapplicable ratio.
    default_config = (
        BATCH == 2 and HW == 512 and DTYPE == jnp.bfloat16
        and jax.devices()[0].device_kind == RECORDED_DEVICE_KIND
    )
    vs_baseline = None
    source = "measured"
    naive_budget_s = float(os.environ.get("PDA_BENCH_NAIVE_BUDGET_S", 150))
    if (os.environ.get("PDA_BENCH_SKIP_NAIVE") == "1"
            or remaining() < naive_budget_s):
        vs_baseline = RECORDED_VS_BASELINE if default_config else None
        source = "recorded" if default_config else "unmeasured-config"
    else:
        # the baseline models the reference's execution structure: XLA convs
        # + autodiff, not our fused kernels
        os.environ["PDA_PALLAS_CONV"] = "0"
        try:
            naive_step = build_naive(model, tx)
            from pda.train.state import create_train_state

            with jax.default_device(jax.devices("cpu")[0]):
                state2 = create_train_state(
                    model.init(
                        jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 1)),
                        jnp.zeros((1, 64, 64, 1)),
                    )["params"],
                    tx,
                    jax.random.PRNGKey(1),
                    with_teacher=True,
                )
            state2 = jax.device_put(state2, jax.devices()[0])

            def run_naive(state, batch):
                state, _ = naive_step(state, *batch)
                return state

            t_naive, _ = timed(run_naive, state2, batch, max(ITERS // 4, 5))
            vs_baseline = t_naive / t_fused
        except Exception:
            # never lose the fused number to a baseline failure — but make
            # the failure VISIBLE (stderr + a distinct source tag) so a
            # permanently broken baseline can't masquerade as a benign
            # budget skip republishing the recorded ratio forever
            import traceback

            traceback.print_exc()
            vs_baseline = RECORDED_VS_BASELINE if default_config else None
            source = "recorded-after-error" if default_config else "unmeasured-config"
        finally:
            os.environ.pop("PDA_PALLAS_CONV", None)

    # BASELINE.json names a second inference metric ("MC-16 consensus
    # tiles/sec"): measure the tiled predictor at the reference geometry
    # (LIVECell 520x704 frame, 384^2 blocks / 64 halo,
    # punet_predictions.py:44-46) when budget remains; its program comes from
    # the same persistent cache. Reported as "extra" so the driver's primary
    # metric line stays unchanged.
    extra = {}
    if device_ms is not None:
        extra["device_ms_per_step"] = round(device_ms, 2)
    if mxu_util is not None:
        extra["whole_step_mxu_util"] = round(mxu_util, 3)
    if (remaining() > float(os.environ.get("PDA_BENCH_INFER_BUDGET_S", 120))
            and os.environ.get("PDA_BENCH_SKIP_INFER") != "1"):
        try:
            from pda.infer.predict import _tiled_punet_probs
            from pda.infer.tiling import grid_shape
            from pda.models.punet import init_params_cpu

            iparams = jax.device_put(
                init_params_cpu(
                    model, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1))
                ),
                jax.devices()[0],
            )
            h, w = 520, 704
            block, halo = (384, 384), (64, 64)
            img = jnp.asarray(
                np.random.default_rng(1).normal(size=(h, w, 1)).astype(np.float32)
            )
            ikey = jax.random.PRNGKey(0)
            n_tiles = int(np.prod(grid_shape((h, w), block)))

            def run_infer():
                return _tiled_punet_probs(
                    model, iparams, img, ikey, 16, block, halo
                )

            out = run_infer()
            float(np.asarray(out).ravel()[0])  # true sync
            # median of 3 loops, same discipline as the train-step timing;
            # 20-iter loops for comparability with the recorded round-3/4
            # measurements (the per-loop fence amortizes differently at
            # shorter lengths)
            times_i = []
            iters_i = 20
            for _ in range(3):
                if times_i and remaining() < 30:
                    break
                t0 = time.perf_counter()
                for _ in range(iters_i):
                    out = run_infer()
                float(np.asarray(out).ravel()[0])
                times_i.append((time.perf_counter() - t0) / iters_i)
            dt = float(np.median(times_i))
            extra.update(
                mc16_tiles_per_sec=round(n_tiles / dt, 1),
                mc16_frames_per_sec=round(1.0 / dt, 2),
            )
            # regression guard vs the recorded round-3 measurement (112.1
            # tiles/s, development/bench_infer.py) — a >10% drop rides into
            # the artifact FLAGGED instead of unexamined (VERDICT r4 weak 4)
            recorded_tiles = 119.0  # round-5 defaults, bench_infer.py
            if n_tiles / dt < 0.9 * recorded_tiles:
                extra["mc16_regression_vs_recorded"] = round(
                    (n_tiles / dt) / recorded_tiles - 1.0, 3
                )
            # reference-structure baseline for the SECOND metric
            # (VERDICT r4 item 5): host-tiled, per-tile dispatches,
            # sequential MC loop — BASELINE.json's "MC-16 consensus
            # tiles/sec" finally gets a measured "vs" denominator
            if remaining() > 60:
                t_naive_f = naive_infer_frame_seconds(
                    model, iparams, np.asarray(img)
                )
                extra["mc16_vs_baseline"] = round(t_naive_f / dt, 2)
                extra["mc16_baseline_note"] = (
                    "reference-structure tiled MC (per-tile dispatches, "
                    "sequential sample loop); tunnel-dispatch-inclusive"
                )
        except Exception:
            import traceback

            traceback.print_exc()  # never lose the primary metric

    print(
        json.dumps(
            {
                "metric": "mt_train_patches_per_sec_per_chip_512px",
                "value": round(patches_per_sec, 3),
                "unit": "patches/s",
                "vs_baseline": (
                    round(vs_baseline, 3) if vs_baseline is not None else None
                ),
                "vs_baseline_source": source,
                "extra": extra or None,
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    # The axon TPU tunnel occasionally drops a device transfer mid-run
    # (FAILED_PRECONDITION / socket resets). A wedged TPU client cannot be
    # recovered in-process, so retry ONCE in a fresh interpreter before
    # giving up — the driver records whatever this prints as the round's
    # benchmark artifact. The retry inherits the original deadline via
    # PDA_BENCH_DEADLINE (set at the top), so it cannot double the budget;
    # its compiles come from the persistent cache, so it restarts fast.
    import sys
    import traceback

    try:
        main()
    except Exception:
        if os.environ.get("PDA_BENCH_RETRIED") or remaining() < 120:
            raise
        traceback.print_exc()
        print("bench.py: transient failure, retrying in a fresh process",
              file=sys.stderr)
        os.environ["PDA_BENCH_RETRIED"] = "1"
        os.environ["PDA_BENCH_DEADLINE"] = repr(_DEADLINE)
        os.execv(sys.executable, [sys.executable, os.path.abspath(__file__)])
