"""Device-trace timing utility — the only trustworthy clock on this platform.

Wall-clock timing of individual jit calls through the axon tunnel carries
~1-2.4 ms of per-dispatch RPC overhead, and even chained-in-one-jit wall
measurements retain ~0.3 ms/link of scheduling noise (see the measurement
correction in IMPLEMENTATION_STATUS.md: the round-2 "137/205 GB/s Pallas
streaming floor" was this artifact). The device trace is ground truth: this
module runs a function under ``jax.profiler`` and aggregates the TPU device
lane's events.

Library use:
    from development.trace_op import device_time, op_table
    us = device_time(lambda x: my_kernel(x), (x0,), match="chained.")
    op_table(step_fn, args)          # ranked per-op device table

CLI (traces the flagship MT step and prints the ranked op table):
    python development/trace_op.py

Pitfalls this module dodges (measured on this chip, 2026-08):
  * per-jit-call dispatch floor -> everything runs CHAINED inside one jit,
    with a data dependence between links so XLA cannot hoist;
  * XLA fuses unbarriered elementwise chains -> the chain threads a scalar
    from each link's OUTPUT into the next link's INPUT;
  * Mosaic dead-code-eliminates unused matmul output lanes -> the scalar is
    taken from the real output, keeping the whole computation live;
  * ``block_until_ready`` can acknowledge early under axon -> completion is
    forced by a host transfer that data-depends on the final value.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _device_events(trace_dir):
    """All complete events on the TPU device lane of the newest trace."""
    traces = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    )
    if not traces:
        raise RuntimeError(f"no trace.json.gz under {trace_dir}")
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    ev = data.get("traceEvents", [])
    device_pids = {
        e["pid"]
        for e in ev
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    if not device_pids:  # fall back: the lane with the fewest host markers
        raise RuntimeError("no TPU device lane in trace (ran on CPU?)")
    return [
        e
        for e in ev
        if e.get("ph") == "X" and "dur" in e and e.get("pid") in device_pids
    ]


def _fence(y):
    leaf = jax.tree_util.tree_leaves(y)[0]
    float(np.asarray(jax.device_get(leaf.ravel()[0]), np.float32))


def trace_fn(fn, args, *, reps: int = 3, trace_dir: str | None = None):
    """jit ``fn``, warm it, run ``reps`` traced calls; return device events."""
    f = jax.jit(fn)
    y = f(*args)
    _fence(y)
    d = trace_dir or tempfile.mkdtemp(prefix="trace_op_")
    jax.profiler.start_trace(d)
    for _ in range(reps):
        y = f(*args)
    _fence(y)
    jax.profiler.stop_trace()
    return _device_events(d), reps


def device_time(op, args, *, chain: int = 10, reps: int = 3, match: str = "chained."):
    """Average device microseconds per execution of ``op`` (a single-array ->
    single-array callable), measured by chaining ``chain`` data-dependent
    links inside one jit and averaging the matching device events."""

    def chained(a):
        acc = jnp.zeros((), a.dtype)
        for _ in range(chain):
            o = op(a + acc)
            acc = jax.tree_util.tree_leaves(o)[0].ravel()[0].astype(a.dtype)
        return acc

    events, _ = trace_fn(chained, (args,), reps=reps)
    tot = n = 0
    for e in events:
        if e["name"].startswith(match):
            tot += e["dur"]
            n += 1
    if n == 0:
        raise RuntimeError(
            f"no device events matched {match!r}; names: "
            f"{sorted({e['name'] for e in events})[:10]}"
        )
    return tot / n


def op_table(fn, args, *, reps: int = 3, top: int = 40):
    """Print ranked per-op device time for one call of ``fn(*args)``."""
    events, n_calls = trace_fn(fn, args, reps=reps)
    agg = collections.Counter()
    cnt = collections.Counter()
    total = 0
    for e in events:
        name = e["name"]
        if name.startswith("jit_"):
            total += e["dur"]
            continue
        if name.isdigit():  # per-queue envelope markers, not ops
            continue
        agg[name] += e["dur"]
        cnt[name] += 1
    print(f"total device time: {total / (n_calls * 1e3):.3f} ms/call")
    for name, d in agg.most_common(top):
        print(f"{d / (n_calls * 1e3):8.3f} ms x{cnt[name] // n_calls:4d}  {name[:90]}")
    return agg, cnt, n_calls


def main():
    import bench

    model, tx, state, step = bench.build()
    rng = np.random.default_rng(0)
    batch = tuple(
        jnp.asarray(rng.normal(size=(bench.BATCH, bench.HW, bench.HW, 1)), jnp.float32)
        for _ in range(4)
    )

    def run(state, *batch):
        new_state, metrics = step(state, *batch)
        return new_state, metrics

    op_table(run, (state, *batch))


if __name__ == "__main__":
    main()
