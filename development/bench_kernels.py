"""Kernel-level microbenchmarks for the fused conv-block paths.

Times each PUNet block geometry (the 512^2 MT train step's components)
through the three implementations:

  * ``xla``    — XLA convolutions with the hand-written VJP
                 (pda.models.blocks.conv3_relu)
  * ``pallas`` — fused whole-block Pallas kernels
                 (pda.kernels.conv_block / conv_block_bwd)
  * ``packed`` — lane-packed variants for Cout <= 64
                 (pda.kernels.conv_block_packed[_bwd])

plus the Monte-Carlo Fcomb tail (XLA batched vs the fused MC-consensus
kernel, unpacked and lane-packed).

Timing uses an in-jit ``lax.scan`` chain — each iteration's input depends on
the previous output — so results are robust to dispatch caching and measure
steady-state device time. Run on a real TPU; CPU numbers are meaningless.

Usage:  python development/bench_kernels.py [conv|mc]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

DT = jnp.bfloat16
B = 2
ITERS = 20

#: (name, H, Cin, Cout) of every ConvBlock in the flagship PUNet at 512^2
GEOMS = [
    ("bb-L0", 512, 1, 64),
    ("bb-L1", 256, 64, 128),
    ("bb-L2", 128, 128, 256),
    ("bb-L3", 64, 256, 512),
    ("dec-U1", 128, 768, 256),
    ("dec-U2", 256, 384, 128),
    ("dec-U3", 512, 192, 64),
    ("post-L0", 512, 2, 64),
]


def time_chain(body, x0, iters=ITERS):
    """ms per iteration of ``body`` under a sequential scan dependency."""

    @jax.jit
    def run(x):
        def f(c, _):
            return body(c), ()

        return lax.scan(f, x, None, length=iters)[0]

    def fence(o):
        # axon's block_until_ready can ack early; a dependent one-element
        # host transfer is a true fence
        float(jnp.asarray(o.ravel()[0]))

    out = run(x0)
    fence(out)
    t0 = time.perf_counter()
    out = run(x0)
    fence(out)
    return (time.perf_counter() - t0) / iters * 1e3


def bench_conv():
    from pda.models.blocks import (
        conv3_relu,
        conv3_relu_packed,
        conv3_relu_pallas,
    )

    key = jax.random.PRNGKey(0)
    impls = {"xla": conv3_relu, "pallas": conv3_relu_pallas,
             "packed": conv3_relu_packed}
    for name, h, ci, co in GEOMS:
        x = jax.random.normal(key, (B, h, h, ci), DT)
        w1 = jax.random.normal(key, (3, 3, ci, co), jnp.float32) * 0.05
        w2 = jax.random.normal(key, (3, 3, co, co), jnp.float32) * 0.05
        w3 = jax.random.normal(key, (3, 3, co, co), jnp.float32) * 0.05
        b = jnp.zeros((co,), jnp.float32)
        for label, fn in impls.items():
            if label == "packed" and co > 64:
                continue
            tf = time_chain(
                lambda c: c + jnp.mean(fn(c, w1, b, w2, b, w3, b)).astype(c.dtype), x
            )
            gfn = jax.grad(
                lambda c, *w: jnp.sum(fn(c, *w).astype(jnp.float32))
            )
            tb = time_chain(
                lambda c: c + gfn(c, w1, b, w2, b, w3, b).astype(c.dtype) * 1e-6, x
            )
            print(
                f"{name:8s} {label:7s} H={h:3d} {ci:3d}->{co:3d}"
                f"  fwd {tf:7.3f} ms  fwd+bwd {tb:7.3f} ms",
                flush=True,
            )


def bench_mc():
    from pda.core import consensus_from_probs
    from pda.kernels.mc_consensus import mc_consensus_decode

    HW, C, S = 512, 64, 16
    key = jax.random.PRNGKey(0)
    feat = jax.random.normal(key, (B, HW, HW, C), DT)
    z_terms = jax.random.normal(key, (S, B, C), jnp.float32)
    mid_k = jax.random.normal(key, (1, C, C), jnp.float32) * 0.1
    mid_b = jnp.zeros((1, C))
    last_k = jax.random.normal(key, (C, 1), jnp.float32) * 0.1
    last_b = jnp.zeros((1,))

    def xla_tail(f, z_terms):
        def one(z):
            h = jnp.maximum(f + z[:, None, None, :].astype(f.dtype), 0.0)
            h = jnp.maximum(
                jnp.einsum("bhwc,cd->bhwd", h, mid_k[0].astype(f.dtype))
                + mid_b[0].astype(f.dtype),
                0.0,
            )
            return (
                jnp.einsum("bhwc,cd->bhwd", h, last_k.astype(f.dtype)) + last_b
            ).astype(jnp.float32)

        probs = jax.nn.sigmoid(jax.vmap(one)(z_terms))
        return consensus_from_probs(probs, masking=True)

    def timed(fn):
        return time_chain(
            lambda c: c
            + (lambda yz: (jnp.mean(yz[0]) + jnp.mean(yz[1])).astype(c.dtype))(
                fn(c, z_terms)
            ),
            feat,
            iters=10,
        )

    print(f"xla tail: {timed(xla_tail):.3f} ms", flush=True)
    for pack in (False, True):
        for bs in (False, True):
            fn = lambda f, z, pack=pack, bs=bs: mc_consensus_decode(
                f, z, mid_k, mid_b, last_k, last_b,
                n_samples=S, masking=True, row_tile=512, pack=pack,
                batch_samples=bs,
            )
            print(
                f"kernel pack={pack} batch={bs}: {timed(fn):.3f} ms",
                flush=True,
            )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "conv"
    print(f"backend={jax.default_backend()}")
    if which == "conv":
        bench_conv()
    else:
        bench_mc()
