"""Qualitative figure generator: MC samples + consensus panels for one image.

TPU-native equivalent of reference development/plot_livecell.py:50-156: load a
source PUNet checkpoint, run MC-8 prior sampling + consensus on one chosen
test image, and save CLAHE-enhanced panels (input / mean prediction /
per-sample maps / consensus response) as a figure.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def clahe(img: np.ndarray) -> np.ndarray:
    """CLAHE contrast enhancement for display (reference uses skimage
    equalize_adapthist; cv2 here)."""
    import cv2

    u8 = ((img - img.min()) / (np.ptp(img) + 1e-7) * 255).astype("uint8")
    return cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8)).apply(u8)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", type=str, required=True, help="Input TIFF/PNG")
    parser.add_argument("--checkpoint", type=str, required=True,
                        help="Checkpoint dir (with best.ckpt) of a source PUNet")
    parser.add_argument("--out", type=str, default="./livecell_panels.png")
    parser.add_argument("--n_samples", type=int, default=8)
    args = parser.parse_args()

    import imageio.v3 as imageio
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from pda.core import consensus_from_logits
    from pda.experiments import livecell_punet
    from pda.infer.tiling import pad_to_divisible
    from pda.models.punet import init_params_cpu, mc_decode_logits
    from pda.train import load_params

    model = livecell_punet()
    x0 = jnp.zeros((1, 64, 64, 1))
    template = init_params_cpu(model, x0, x0)
    params = load_params(args.checkpoint, template)

    img = np.asarray(imageio.imread(args.image)).astype(np.float32)
    if img.ndim == 3:
        img = img[..., 0]
    norm = (img - img.mean()) / (img.std() + 1e-7)
    padded, (h, w) = pad_to_divisible(jnp.asarray(norm[..., None]), (16, 16))

    enc = model.apply({"params": params}, padded[None], method="encode")
    logits = mc_decode_logits(
        model, params, enc.features, enc.prior, jax.random.PRNGKey(0), args.n_samples
    )
    probs = np.asarray(jax.nn.sigmoid(logits))[:, 0, :h, :w, 0]
    pseudo, consensus = consensus_from_logits(logits)
    pseudo = np.asarray(pseudo)[0, :h, :w, 0]
    consensus = np.asarray(consensus)[0, :h, :w, 0]

    n = args.n_samples
    fig, axes = plt.subplots(2, max(3, (n + 1) // 2), figsize=(18, 7))
    axes = axes.ravel()
    axes[0].imshow(clahe(img), cmap="gray")
    axes[0].set_title("input (CLAHE)")
    axes[1].imshow(pseudo, cmap="viridis", vmin=0, vmax=1)
    axes[1].set_title("mean prediction")
    axes[2].imshow(consensus, cmap="magma", vmin=0, vmax=1)
    axes[2].set_title("consensus response")
    for i in range(min(n, len(axes) - 3)):
        axes[3 + i].imshow(probs[i], cmap="viridis", vmin=0, vmax=1)
        axes[3 + i].set_title(f"sample {i + 1}")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150)
    print(f"saved panels to {args.out}")


if __name__ == "__main__":
    main()
