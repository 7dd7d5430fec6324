"""On-chip A/B equivalence check: fused Pallas kernel stack vs plain XLA.

The per-kernel equivalence tests (tests/test_kernels.py, test_flat_pipeline.py)
pin the kernel math in Pallas *interpret* mode on CPU. This script closes the
remaining gap — the compiled Mosaic kernels on a real TPU — by running the
flagship Mean-Teacher step's computation twice from identical state/batch:

  A: PDA_PALLAS_CONV=1  (production: fused forward+backward Pallas kernels)
  B: PDA_PALLAS_CONV=0  (plain XLA convolutions + the hand-written VJP)

and comparing
  * the teacher's MC-16 pseudo-label map y and consensus mask z (forward),
  * the student loss, and
  * the raw loss gradients, per-leaf relative L2 + global cosine.

Why not compare Adam-updated params (the first version did): one Adam step
moves every element by ±lr regardless of gradient magnitude (m/(sqrt(v)+eps)
is ±1 at step 1), so a rounding-level gradient difference flips a whole
update element — the comparison measures sign agreement of near-zero noise,
not kernel correctness.

Tolerances: TPU f32 matmuls run as multiple bf16 MXU passes; XLA's HIGHEST
precision (used by the f32 conv path) takes more passes than Mosaic's
default, so the two paths round differently at ~1e-4 relative per layer.
bf16 runs are accepted with correspondingly looser bounds.

Usage:  python development/ab_step_check.py [hw] [f32|bf16]
        (defaults: 256 f32; pass 512 bf16 for the exact bench geometry)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    hw = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    dtype_name = sys.argv[2] if len(sys.argv) > 2 else "f32"

    from pda.models import ProbabilisticUnet
    from pda.train.optim import adam
    from pda.train.state import create_train_state
    from pda.train.steps import _mc_pseudo, _punet_loss

    model = ProbabilisticUnet(
        input_channels=1,
        num_classes=1,
        num_filters=(64, 128, 256, 512),
        latent_dim=6,
        no_convs_fcomb=3,
        beta=1.0,
        rl_swap=True,
        consensus_masking=True,
        dtype={"f32": jnp.float32, "bf16": jnp.bfloat16}[dtype_name],
    )
    tx = adam(1e-5)
    key = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, 64, 64, 1), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        params = model.init(key, x0, x0)["params"]
        state_host = create_train_state(params, tx, key, with_teacher=True)

    rng = np.random.default_rng(0)
    batch = 2
    x1, x2 = (
        jnp.asarray(rng.normal(size=(batch, hw, hw, 1)).astype(np.float32))
        for _ in range(2)
    )
    _, k_t, k_post = jax.random.split(state_host.rng, 3)

    def make_compute():
        # a FRESH function object per leg: jax caches traces keyed on the
        # function identity, so reusing one `compute` across env-flag flips
        # would silently serve the first leg's program to the second
        def compute(state):
            y, z = _mc_pseudo(model, state.teacher_params, x1, k_t, 16, True)

            def loss_fn(params):
                return _punet_loss(model, params, x2, y, k_post, consm=z)

            (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return y, z, loss, grads

        return compute

    results = {}
    for label, flag in (("pallas", "1"), ("xla", "0")):
        os.environ["PDA_PALLAS_CONV"] = flag
        fn = jax.jit(make_compute())  # fresh trace: env is read at trace time
        state = jax.device_put(state_host, jax.devices()[0])
        y, z, loss, grads = fn(state)
        results[label] = (
            np.asarray(y, np.float64),
            np.asarray(z, np.float64),
            float(np.asarray(loss)),
            jax.tree_util.tree_map(lambda a: np.asarray(a, np.float64), grads),
        )
        print(f"{label}: loss={results[label][2]:.6f}")
    os.environ.pop("PDA_PALLAS_CONV", None)

    ya, za, loss_a, ga = results["pallas"]
    yb, zb, loss_b, gb = results["xla"]

    y_diff = float(np.max(np.abs(ya - yb)))  # probabilities in [0, 1]
    z_diff = float(np.max(np.abs(za - zb)))  # consensus weights in [0, 1]
    loss_rel = abs(loss_a - loss_b) / max(abs(loss_b), 1e-12)

    leaves_a, _ = jax.tree_util.tree_flatten_with_path(ga)
    leaves_b = jax.tree_util.tree_leaves(gb)
    gnorm = np.sqrt(sum(float(np.sum(b * b)) for b in leaves_b))
    worst = (0.0, "")
    dot = naa = nbb = 0.0
    for (path, a), b in zip(leaves_a, leaves_b):
        dot += float(np.sum(a * b))
        naa += float(np.sum(a * a))
        nbb += float(np.sum(b * b))
        # leaf L2 difference relative to the leaf's own norm, floored by a
        # fraction of the global norm so near-zero leaves don't divide by ~0
        rel = float(np.linalg.norm(a - b)) / max(
            float(np.linalg.norm(b)), 1e-4 * gnorm
        )
        if rel > worst[0]:
            worst = (rel, jax.tree_util.keystr(path))
    cos = dot / max(np.sqrt(naa * nbb), 1e-30)

    tols = {
        "f32": dict(y=2e-3, loss=2e-3, leaf=5e-2, cos=1e-4),
        "bf16": dict(y=3e-2, loss=2e-2, leaf=3e-1, cos=1e-2),
    }[dtype_name]
    print(
        f"pseudo-label max|dy| {y_diff:.2e} (tol {tols['y']:.0e}); "
        f"consensus max|dz| {z_diff:.2e}\n"
        f"loss rel diff {loss_rel:.2e} (tol {tols['loss']:.0e}); "
        f"grad cosine 1-{1 - cos:.2e} (tol {tols['cos']:.0e}); "
        f"worst grad leaf rel L2 {worst[0]:.2e} at {worst[1]} "
        f"(tol {tols['leaf']:.0e})"
    )
    ok = (
        y_diff < tols["y"]
        and z_diff < 0.5  # z is near-binary; any disagreement is threshold flip
        and loss_rel < tols["loss"]
        and (1 - cos) < tols["cos"]
        and worst[0] < tols["leaf"]
    )
    assert ok, "A/B MISMATCH"
    print(f"AB OK: pallas == xla at hw={hw} {dtype_name}")


if __name__ == "__main__":
    main()
