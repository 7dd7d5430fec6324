"""Capture a device trace of the flagship MT train step and rank ops.

Runs the same step as bench.py under ``jax.profiler``, then parses the
trace.json.gz event dump and prints per-op total device time, grouped by
a cleaned op-name prefix. Use this to find where the step's milliseconds
actually go before touching any kernel.

Usage:  python development/profile_step.py [out_dir]
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out = args[0] if args else "/tmp/pda_profile"
    import bench

    model, tx, state, step = bench.build()
    key = jax.random.PRNGKey(1)
    batch = tuple(
        jax.random.normal(key, (bench.BATCH, bench.HW, bench.HW, 1), jnp.float32)
        for _ in range(4)
    )

    for _ in range(3):
        state, metrics = step(state, *batch)
    jax.block_until_ready(metrics)

    jax.profiler.start_trace(out)
    for _ in range(5):
        state, metrics = step(state, *batch)
    jax.block_until_ready(metrics)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(os.path.join(out, "**", "*.trace.json.gz"),
                              recursive=True))
    if not traces:
        print("no trace.json.gz found under", out)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    # Find TPU device-op events: pick the process/threads with the most
    # total event duration that are not python/host threads.
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # group by pid to find device lanes
    by_pid = collections.defaultdict(float)
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    for e in events:
        by_pid[e["pid"]] += e["dur"]
    print("processes by total event time:")
    for pid, tot in sorted(by_pid.items(), key=lambda kv: -kv[1])[:8]:
        print(f"  pid={pid} {pid_names.get(pid, '?'):40s} {tot/1e3:10.2f} ms")

    device_pids = [pid for pid, name in pid_names.items()
                   if "TPU" in name or "/device:" in name.lower()]
    if not device_pids:
        # fall back: the busiest non-python pid
        device_pids = [max(by_pid, key=by_pid.get)]

    import re

    instances = "--instances" in sys.argv

    op_tot = collections.Counter()
    op_cnt = collections.Counter()
    for e in events:
        if e["pid"] not in device_pids:
            continue
        name = e.get("name", "?")
        # leaf XLA ops only: skip the module envelope and step-number lanes
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        if instances:
            group = name
        else:
            group = re.sub(r"[.\d]+$", "", name)
            group = re.sub(r"\d+$", "", group)
        op_tot[group] += e["dur"]
        op_cnt[group] += 1
    total = sum(op_tot.values())
    print(f"\nleaf-op total: {total/1e3:.2f} ms over 5 steps "
          f"=> {total/5e3:.2f} ms/step")
    print(f"{'op group':56s} {'ms/step':>9s} {'%':>6s} {'count':>6s}")
    for name, dur in op_tot.most_common(45):
        print(f"{name[:56]:56s} {dur/5e3:9.3f} {100*dur/total:6.2f} "
              f"{op_cnt[name]//5:6d}")


if __name__ == "__main__":
    main()
