"""Host data-pipeline throughput: can the loader keep a chip (or a v5e-8) fed?

Measures the two-view (weak/weak) LIVECell-style patch pipeline —
random crop + joint geometric augs + two weak augmentations per patch
(reference DualImageCollectionDataset, my_image_collection_dataset.py:187-372)
— in patches/sec, with the native C++ fused augmentation
(native/pda_native.cpp) vs the numpy fallback, across worker counts.

The MT train step consumes batch_size patches per step; at the measured
TPU step rate (see bench.py) the loader must sustain
  batch_size * steps/sec * n_chips
patches/sec. This script prints that margin.

Usage: python development/bench_loader.py [--hw 512] [--batch 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_loader(imgs, labels, hw, batch, workers, native: bool):
    os.environ["PDA_NATIVE_AUGS"] = "1" if native else "0"
    # re-import to honor the env var
    import importlib

    import pda.experiments.common as common
    importlib.reload(common)
    from pda.data import DualImageCollectionDataset, Loader

    aug = common.weak_augmentations()
    ds = DualImageCollectionDataset(
        imgs, labels, patch_shape=(hw, hw),
        augmentation1=aug, augmentation2=aug,
    )
    return Loader(ds, batch_size=batch, shuffle=True, seed=0, num_workers=workers)


def measure(loader, seconds=6.0):
    it = iter(loader)
    next(it)  # warm
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        n += batch[0].shape[0]
    return n / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--step_rate", type=float, default=None,
                    help="measured TPU train steps/sec (from bench.py) for the margin print")
    args = ap.parse_args()

    from pda.data.synthetic import make_dataset_arrays

    imgs, labels = make_dataset_arrays(n_images=8, shape=(args.hw + 64, args.hw + 64), seed=0)
    labels = [(l > 0).astype(np.float32) for l in labels]

    from pda.data import native
    rows = []
    for use_native in ([True, False] if native.available() else [False]):
        for workers in (0, 4, 8, 16):
            loader = build_loader(imgs, labels, args.hw, args.batch, workers, use_native)
            pps = measure(loader)
            rows.append((use_native, workers, pps))
            print(f"native={use_native!s:5s} workers={workers:2d}: {pps:8.1f} patches/s",
                  flush=True)

    best = max(r[2] for r in rows)
    import os
    cores = len(os.sched_getaffinity(0))
    print(f"\nbest host throughput: {best:.1f} patches/s on {cores} core(s)")
    if cores == 1:
        print("NOTE: single-core host — the loader samples inline (worker "
              "pools can only add overhead here); per-core rate is the "
              "number that scales on real multi-core v5e hosts.")
    if args.step_rate:
        need1 = args.batch * args.step_rate
        print(f"needed for 1 chip:  {need1:8.1f} patches/s  (margin {best/need1:5.1f}x)")
        print(f"needed for v5e-8:   {need1*8:8.1f} patches/s  (margin {best/(need1*8):5.1f}x)")


if __name__ == "__main__":
    main()
