"""Dump the optimized HLO of the flagship MT train step (TPU backend).

Writes the post-optimization module under --xla_dump_to (set by the caller)
and prints the top fusion computations by a crude size heuristic. Used to
correlate trace op groups (ConvBlock_* fusions, copies, reshapes) with the
actual HLO the compiler built.

Usage:
  XLA_FLAGS="--xla_dump_to=/tmp/hlo_dump --xla_dump_hlo_as_text" \
      python development/dump_hlo.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    import bench

    # a persistent-cache hit skips compilation entirely and nothing gets
    # dumped — force a real compile for this process
    jax.config.update("jax_compilation_cache_dir", None)

    model, tx, state, step = bench.build()
    key = jax.random.PRNGKey(1)
    batch = tuple(
        jax.random.normal(key, (bench.BATCH, bench.HW, bench.HW, 1), jnp.float32)
        for _ in range(4)
    )
    state, metrics = step(state, *batch)
    jax.block_until_ready(metrics)
    print("step ran; dump written")


if __name__ == "__main__":
    main()
