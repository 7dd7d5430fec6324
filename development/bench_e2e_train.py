"""END-TO-END Mean-Teacher training throughput: real Loader + augs + fit().

VERDICT r3 next-round item 3: bench.py feeds pre-built device arrays; this
script measures ``MeanTeacherTrainer.fit`` at the same geometry (512^2
patches, batch 2, MC-16, flagship PUNet, bf16) with the ACTUAL host
pipeline — synthetic TIFF-like images on disk, two weak-augmented views per
patch through the native C++ aug kernels (reference analog:
num_workers=16 torch DataLoader, LIVECell/livecell_punet.py:14-37) — and
reports patches/s next to bench.py's synthetic-batch number.

On THIS host (1 CPU core) the loader cannot parallelize; the script reports
both the pure-host pipeline rate and the overlapped fit() rate so the
device/host overlap is visible. Run on a real TPU:

    python development/bench_e2e_train.py [--steps 40] [--hw 512]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--workers", type=int, default=0)
    args = ap.parse_args()

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import jax.numpy as jnp
    import numpy as np

    from pda.data import DualImageCollectionDataset, Loader
    from pda.data.synthetic import make_dataset_arrays
    from pda.experiments.common import weak_augmentations
    from pda.models import ProbabilisticUnet
    from pda.train import MeanTeacherTrainer

    hw, bs = args.hw, args.batch
    # LIVECell-sized frames on "disk" (in-memory arrays exercise the same
    # sampling/aug path; TIFF decode adds ~nothing vs the elastic warp cost)
    raws, labels = make_dataset_arrays(8, (hw + 64, hw + 64), seed=0)
    aug = weak_augmentations()
    # n_samples makes one epoch cover every measured step: fit() then runs
    # exactly ONE validation epoch (like a real experiment's cadence, where
    # epochs are hundreds of steps), instead of validating every 4 steps
    ds = DualImageCollectionDataset(
        raws, labels, patch_shape=(hw, hw),
        augmentation1=aug, augmentation2=aug,
        n_samples=max(args.steps * bs, 8),
    )
    val_ds = DualImageCollectionDataset(
        raws[:2], labels[:2], patch_shape=(hw, hw),
        augmentation1=aug, augmentation2=aug,
    )
    train = Loader(ds, bs, shuffle=True, seed=0, num_workers=args.workers)
    val = Loader(val_ds, 1, shuffle=False, seed=1, num_workers=0)

    # 1) pure host pipeline rate (no device work)
    it = iter(train)
    next(it)
    n, t0 = 0, time.perf_counter()
    while time.perf_counter() - t0 < 6.0:
        try:
            b = next(it)
        except StopIteration:
            it = iter(train)
            b = next(it)
        n += b[0].shape[0]
    host_rate = n / (time.perf_counter() - t0)
    print(f"host pipeline alone: {host_rate:6.2f} patches/s", flush=True)

    # 2) fit() end-to-end (overlapped host + device)
    model = ProbabilisticUnet(
        num_filters=(64, 128, 256, 512), latent_dim=6, no_convs_fcomb=3,
        beta=1.0, rl_swap=True, consensus_masking=True, dtype=jnp.bfloat16,
    )
    trainer = MeanTeacherTrainer(
        "bench-e2e", model, train, val,
        learning_rate=1e-5, save_root="/tmp/pda_bench_e2e", logger=False,
        do_consensus_masking=True,
    )
    trainer.initialize()
    # warm the step program + first-exec load outside the measurement
    first = next(iter(train))
    batch = trainer._put(first)
    trainer.state, _ = trainer._train_step_jit(trainer.state, *batch)
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    float(np.asarray(leaf.ravel()[0]))  # true sync (axon block_until_ready lies)

    t0 = time.perf_counter()
    stats = trainer.fit(args.steps)
    leaf = jax.tree_util.tree_leaves(trainer.state.params)[0]
    float(np.asarray(leaf.ravel()[0]))
    dt = time.perf_counter() - t0
    fit_rate = args.steps * bs / dt
    print(f"fit() end-to-end:    {fit_rate:6.2f} patches/s "
          f"({args.steps} steps, {dt:.1f}s wall, incl. 1 validation epoch)",
          flush=True)
    print(f"throughput summary:  {stats}", flush=True)


if __name__ == "__main__":
    main()
