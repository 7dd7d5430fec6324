"""Inference-path throughput on TPU: tiled MC prediction + pseudo-label gen.

Measures the two BASELINE.json inference metrics at the reference geometry:

  * tiled punet_prediction: LIVECell-shaped 520x704 frame, 384^2 blocks with
    64-px halo (reference punet_predictions.py:44-46), MC-16 mean -> reports
    TILES/sec and frames/sec;
  * punet_pseudo_prediction core (whole padded frame, MC-16 mean +
    unanimity consensus, reference punet_predictions.py:96-124) ->
    frames/sec.

Device-time measurement forces a host transfer per repetition (the axon
platform's block_until_ready can return early). Run on a real TPU.

Usage: python development/bench_infer.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from pda.infer.predict import _full_punet_pseudo, _tiled_punet_probs
    from pda.infer.tiling import grid_shape
    from pda.models import ProbabilisticUnet
    from pda.models.punet import init_params_cpu

    model = ProbabilisticUnet(
        input_channels=1,
        num_classes=1,
        num_filters=(64, 128, 256, 512),
        latent_dim=6,
        no_convs_fcomb=3,
        dtype=jnp.bfloat16,
    )
    params = init_params_cpu(
        model, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1, 64, 64, 1))
    )
    params = jax.device_put(params, jax.devices()[0])

    h, w = 520, 704  # LIVECell frame
    block, halo = (384, 384), (64, 64)
    img = jnp.asarray(
        np.random.default_rng(0).normal(size=(h, w, 1)).astype(np.float32)
    )
    key = jax.random.PRNGKey(0)
    gh, gw = grid_shape((h, w), block)
    n_tiles = gh * gw

    def timed(fn, iters=20):
        out = fn()
        float(jnp.asarray(out).ravel()[0])  # true sync (see module docstring)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        float(jnp.asarray(out).ravel()[0])
        return (time.perf_counter() - t0) / iters

    dt = timed(lambda: _tiled_punet_probs(
        model, params, img, key, 16, block, halo))
    print(
        f"tiled punet_prediction 520x704 MC-16: {dt * 1e3:8.2f} ms/frame "
        f"({n_tiles / dt:6.1f} tiles/s, {1 / dt:5.2f} frames/s)",
        flush=True,
    )

    dt = timed(lambda: _full_punet_pseudo(model, params, img, key, 16, True))
    print(
        f"pseudo+consensus 520x704 MC-16:      {dt * 1e3:8.2f} ms/frame "
        f"({1 / dt:5.2f} frames/s)",
        flush=True,
    )

    # Mesh path (shard_map): on the single available chip this runs the
    # SAME manual-SPMD program structure multi-chip inference uses (tile
    # batch partitioned over the mesh axis, fused Pallas kernels alive per
    # shard, global-batch latent noise slices) with a 1-device mesh — the
    # number pins the shard_map wrapper's overhead vs the plain path.
    from pda.parallel.mesh import get_mesh, replicated

    mesh = get_mesh(len(jax.devices()))
    params_m = jax.device_put(params, replicated(mesh))
    dt = timed(lambda: _tiled_punet_probs(
        model, params_m, img, key, 16, block, halo, mesh, shard_map=True))
    print(
        f"tiled prediction, shard_map mesh({mesh.devices.size}): "
        f"{dt * 1e3:8.2f} ms/frame "
        f"({n_tiles / dt:6.1f} tiles/s, {1 / dt:5.2f} frames/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
