"""Convert reference PyTorch PUNet checkpoints to pda parameter pytrees.

Lets a user of the reference implementation port trained checkpoints
(``checkpoints/<name>/best.pt`` with ``model_state`` / ``teacher_state``
dicts, reference torch_em DefaultTrainer format) into this framework and get
the same predictions — the practical route to Dice parity without retraining.

Key mapping (reference prob_utils/my_models/probabilistic_unet.py layout ->
pda.models.punet layout, NCHW -> NHWC):

  unet.contracting_path.{i}.layers.{k}     -> unet/ConvBlock_{i}/Conv_{j}
  unet.upsampling_path.{i}.conv_block....  -> unet/UpBlock_{i}/ConvBlock_0/Conv_{j}
  prior.encoder.layers.{k}                 -> prior/EncoderPyramid_0/ConvBlock_{i}/Conv_{j}
  prior.conv_layer (1x1 conv)              -> prior/head (Dense)
  posterior.*                              -> posterior/*
  fcomb.layers.0 (1x1 on concat[feat, z])  -> fcomb/feat_proj + fcomb/z_proj
  fcomb.layers.{2,4,...}                   -> fcomb/mid_{m}
  fcomb.last_layer                         -> fcomb/last_layer

Conv kernels transpose (O, I, kh, kw) -> (kh, kw, I, O); 1x1 convs become
Dense kernels (I, O). The first fcomb layer's kernel is split row-wise into
the feature rows (feat_proj, no bias) and latent rows (z_proj, carries the
bias) — algebraically identical to the reference's concat-then-conv.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(w) -> np.ndarray:
    """(O, I, kh, kw) torch conv kernel -> (kh, kw, I, O)."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def _dense_from_1x1(w) -> np.ndarray:
    """(O, I, 1, 1) torch 1x1 conv kernel -> (I, O) dense kernel."""
    w = np.asarray(w)
    assert w.shape[2] == w.shape[3] == 1, w.shape
    return w[:, :, 0, 0].T


def _np(t) -> np.ndarray:
    try:  # torch tensor
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _conv_block(state: Dict, prefix: str, conv_indices) -> Dict:
    out = {}
    for j, k in enumerate(conv_indices):
        out[f"Conv_{j}"] = {
            "kernel": _conv(_np(state[f"{prefix}.{k}.weight"])),
            "bias": _np(state[f"{prefix}.{k}.bias"]),
        }
    return out


def _encoder_pyramid(state: Dict, prefix: str, n_blocks: int, n_convs: int) -> Dict:
    """The reference Encoder is ONE nn.Sequential with pools interleaved
    (probabilistic_unet.py:44-63): block 0 convs at 0,2,4; each later block is
    preceded by a pool, so indices advance by 2*n_convs + 1 per block."""
    out = {}
    idx = 0
    for i in range(n_blocks):
        if i > 0:
            idx += 1  # AvgPool
        conv_indices = [idx + 2 * j for j in range(n_convs)]
        out[f"ConvBlock_{i}"] = _conv_block(state, prefix, conv_indices)
        idx += 2 * n_convs
    return out


def convert_punet_state_dict(
    state: Dict,
    *,
    num_filters=(64, 128, 256, 512),
    no_convs_fcomb: int = 3,
    no_convs_per_block: int = 3,
) -> Dict:
    """torch ``model_state`` dict -> pda ProbabilisticUnet params pytree.

    The latent dimension needs no parameter: it is implicit in the encoder
    head / Fcomb weight shapes being copied."""
    depth = len(num_filters)
    n = no_convs_per_block
    params: Dict = {"unet": {}, "prior": {}, "posterior": {}, "fcomb": {}}

    # UNet down path: DownConvBlock i has its own Sequential; pool occupies
    # index 0 for i > 0 (unet_blocks.py:12-28).
    for i in range(depth):
        base = [1, 3, 5] if i > 0 else [0, 2, 4]
        base = base[:n]
        params["unet"][f"ConvBlock_{i}"] = _conv_block(
            state, f"unet.contracting_path.{i}.layers", base
        )
    # Up path: UpConvBlock i wraps a pool-less DownConvBlock (unet_blocks.py:47).
    for i in range(depth - 1):
        params["unet"][f"UpBlock_{i}"] = {
            "ConvBlock_0": _conv_block(
                state, f"unet.upsampling_path.{i}.conv_block.layers", [0, 2, 4][:n]
            )
        }

    for name in ("prior", "posterior"):
        params[name]["EncoderPyramid_0"] = _encoder_pyramid(
            state, f"{name}.encoder.layers", depth, n
        )
        params[name]["head"] = {
            "kernel": _dense_from_1x1(_np(state[f"{name}.conv_layer.weight"])),
            "bias": _np(state[f"{name}.conv_layer.bias"]),
        }

    # Fcomb: first layer splits into feat/z projections.
    c0 = num_filters[0]
    w0 = _dense_from_1x1(_np(state["fcomb.layers.0.weight"]))  # (C0+L, C0)
    b0 = _np(state["fcomb.layers.0.bias"])
    params["fcomb"]["feat_proj"] = {"kernel": w0[:c0]}
    params["fcomb"]["z_proj"] = {"kernel": w0[c0:], "bias": b0}
    for m in range(no_convs_fcomb - 2):
        k = 2 * (m + 1)  # ReLU interleaved in the Sequential
        params["fcomb"][f"mid_{m}"] = {
            "kernel": _dense_from_1x1(_np(state[f"fcomb.layers.{k}.weight"])),
            "bias": _np(state[f"fcomb.layers.{k}.bias"]),
        }
    params["fcomb"]["last_layer"] = {
        "kernel": _dense_from_1x1(_np(state["fcomb.last_layer.weight"])),
        "bias": _np(state["fcomb.last_layer.bias"]),
    }
    return params


def convert_unet_state_dict(state: Dict, *, depth: int = 4) -> Dict:
    """torch_em ``UNet2d`` ``model_state`` dict -> pda ``UNet2d`` params.

    torch_em layout (torch_em model/unet.py; the reference trains this via
    LIVECell/livecell_unet.py:39-45):

      encoder.blocks.{i}.block.{j}   ConvBlock2d: InstanceNorm at 0/3 (no
                                     params), convs at 1/4 (norm=None: 0/2)
      base.block.{j}                 same ConvBlock2d layout
      decoder.samplers.{i}.conv      Upsampler2d's 1x1 conv (after bilinear)
      decoder.blocks.{i}.block.{j}   ConvBlock2d
      out_conv                       1x1 head

    pda layout (models/unet.py::UNet2d, flax auto-naming): encoder blocks
    ``_DoubleConv_0..depth-1``, base ``_DoubleConv_{depth}``, decoder blocks
    ``_DoubleConv_{depth+1+i}``, sampler convs ``Conv_0..depth-1``, head
    ``Conv_{depth}``. The parameterless InstanceNorm holds no weights on
    either side. Affine-norm checkpoints (torch_em ``InstanceNormTrackStats``
    etc.) are rejected with a clear error."""
    for k in state:
        affine_norm = (".block.0.weight" in k or ".block.3.weight" in k) and \
            state[k].ndim == 1
        # track_running_stats=True with affine=False stores ONLY
        # running_mean/running_var — those change eval-time normalization
        # too, so reject rather than silently dropping them.
        running_stats = k.endswith(".running_mean") or k.endswith(".running_var")
        if affine_norm or running_stats:
            raise ValueError(
                f"checkpoint carries affine/track-stats norm parameters "
                f"({k}); only torch_em's default parameterless InstanceNorm "
                f"(or norm=None) layout is supported"
            )

    def block(prefix: str) -> Dict:
        # conv indices 1/4 with the norm layers present, 0/2 without
        idx = (1, 4) if f"{prefix}.block.1.weight" in state else (0, 2)
        return {
            f"Conv_{j}": {
                "kernel": _conv(_np(state[f"{prefix}.block.{k}.weight"])),
                "bias": _np(state[f"{prefix}.block.{k}.bias"]),
            }
            for j, k in enumerate(idx)
        }

    params: Dict = {}
    for i in range(depth):
        params[f"_DoubleConv_{i}"] = block(f"encoder.blocks.{i}")
    params[f"_DoubleConv_{depth}"] = block("base")
    for i in range(depth):
        params[f"Conv_{i}"] = {
            "kernel": _conv(_np(state[f"decoder.samplers.{i}.conv.weight"])),
            "bias": _np(state[f"decoder.samplers.{i}.conv.bias"]),
        }
        params[f"_DoubleConv_{depth + 1 + i}"] = block(f"decoder.blocks.{i}")
    params[f"Conv_{depth}"] = {
        "kernel": _conv(_np(state["out_conv.weight"])),
        "bias": _np(state["out_conv.bias"]),
    }
    return params


def load_torch_unet_checkpoint(
    path: str, *, key: str = "model_state", depth: int = 4
) -> Dict:
    """Load a torch_em-trained UNet2d ``best.pt``/``latest.pt`` and convert
    the selected state dict to a pda ``UNet2d`` params pytree."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob[key] if key in blob else blob
    return convert_unet_state_dict(state, depth=depth)


def load_torch_checkpoint(
    path: str,
    *,
    key: str = "model_state",
    num_filters=(64, 128, 256, 512),
    no_convs_fcomb: int = 3,
    no_convs_per_block: int = 3,
) -> Dict:
    """Load a reference ``best.pt``/``latest.pt`` and convert the selected
    state (``model_state`` or ``teacher_state``) to a pda params pytree."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    state = blob[key] if key in blob else blob
    return convert_punet_state_dict(
        state,
        num_filters=num_filters,
        no_convs_fcomb=no_convs_fcomb,
        no_convs_per_block=no_convs_per_block,
    )
