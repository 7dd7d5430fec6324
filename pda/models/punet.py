"""Probabilistic U-Net — flax.linen, NHWC, pure-functional protocol.

TPU-native re-design of reference prob_utils/my_models/probabilistic_unet.py.
The reference's stateful protocol (``forward`` mutates
``self.prior_latent_space`` / ``self.unet_features``; ``sample`` /
``reconstruct`` read them back, probabilistic_unet.py:285-322) becomes three
pure methods:

  encode(x, segm=None) -> PUNetEncoding(features, prior, posterior)
  decode(features, z)  -> segmentation logits
  decode_feature_term / decode_from_term -> the MC fast path

Monte-Carlo sampling = vmap(decode_from_term) over a batch of latent draws;
the UNet features AND the first Fcomb matmul are computed once and shared by
all samples, so MC-16 costs 16 tiny latent projections + fcomb tails instead
of 16 full forwards (the reference's per-sample Python loop,
punet_trainer.py:16, recomputes nothing but still launches 16 sequential
decode graphs; here the whole stack is one XLA program).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.distributions import DiagGaussian
from .blocks import EncoderPyramid, he_normal, orthogonal, trunc_normal_bias
from .unet import PUNetBackbone


class PUNetEncoding(NamedTuple):
    """Everything ``encode`` produces; replaces the reference's mutated attrs."""

    features: jax.Array  # (B, H, W, num_filters[0]) UNet decoder features, or
    #                      a margin-0 flat when feat_geom is set
    prior: DiagGaussian  # (B, latent_dim)
    posterior: Optional[DiagGaussian]  # (B, latent_dim) when segm was given
    #: layout of ``features``: None = image (B, H, W, C); else
    #: (packed: bool, h: int, w: int) for the flat-pipeline layouts —
    #: decode through :func:`fcomb_decode_flat` / :func:`mc_decode_logits`
    feat_geom: Optional[tuple] = None


class GaussianEncoder(nn.Module):
    """Conv net parametrizing an axis-aligned Gaussian over the latent space.

    Reference ``AxisAlignedConvGaussian`` (probabilistic_unet.py:72-142):
    conv pyramid -> global spatial mean -> 1x1 conv (here: Dense) to
    2*latent_dim -> split mu / log_sigma. The posterior variant concatenates
    the segmentation mask to the input channels (:39-42, :113-118).
    """

    num_filters: Sequence[int]
    latent_dim: int = 6
    n_convs_per_block: int = 3
    dtype: jnp.dtype = jnp.float32

    def _flat_plan(self, x: jax.Array):
        from .flat_ops import module_flat_plan

        return module_flat_plan(
            x, self.num_filters, self.n_convs_per_block, with_decoder=False
        )

    @nn.compact
    def __call__(self, x: jax.Array, segm: Optional[jax.Array] = None) -> DiagGaussian:
        if segm is not None:
            x = jnp.concatenate([x, segm.astype(x.dtype)], axis=-1)
        plan = self._flat_plan(x)
        if plan is not None:
            from . import flat_ops

            encf, (eh, ew), last_packed = EncoderPyramid(
                self.num_filters, self.n_convs_per_block, dtype=self.dtype
            )(x, flat_plan=plan)
            # ring columns are exact zeros: the flat sum / (H*W) IS the
            # global spatial mean (reference :126-127)
            enc = (
                flat_ops.mean_flat_packed(encf, eh, ew, self.num_filters[-1])
                if last_packed
                else flat_ops.mean_flat(encf, eh, ew)
            )
        else:
            enc = EncoderPyramid(
                self.num_filters, self.n_convs_per_block, dtype=self.dtype
            )(x)
            # Global spatial mean (reference :126-127) — one fused reduction.
            enc = jnp.mean(enc, axis=(1, 2))
            from .blocks import global_mean_rows_sharded, space_axis

            if space_axis() is not None:
                # row-sharded: complete the mean across the row shards
                enc = global_mean_rows_sharded(enc, space_axis())
        mu_log_sigma = nn.Dense(
            2 * self.latent_dim,
            kernel_init=orthogonal,
            bias_init=trunc_normal_bias(),
            dtype=self.dtype,
            name="head",
        )(enc)
        mu_log_sigma = mu_log_sigma.astype(jnp.float32)  # latent stats stay f32
        return DiagGaussian(
            mu_log_sigma[:, : self.latent_dim], mu_log_sigma[:, self.latent_dim :]
        )


class Fcomb(nn.Module):
    """Combine a latent sample with the UNet feature map via 1x1 convs.

    Reference ``Fcomb`` (probabilistic_unet.py:145-214) tiles z to
    (B, L, H, W), concatenates, and runs ``no_convs_fcomb - 1`` 1x1 Conv+ReLU
    plus a final 1x1 conv. A 1x1 conv on ``concat([features, z_tiled])`` is
    algebraically ``features @ W_f + z @ W_z + b`` with z constant over space —
    so we split the first layer into a spatial matmul (``feature_term``) and a
    per-sample vector projection, never materializing the tiled z and letting
    MC sampling share the expensive half across all draws.

    Parameter subsets: ``feat_proj``/``z_proj``/``mid_*`` correspond to the
    reference's ``fcomb.layers`` (the L2-regularized subset,
    punet_trainer.py:33); ``last_layer`` is excluded there, as in the
    reference.
    """

    num_filters0: int
    latent_dim: int
    num_classes: int = 1
    no_convs_fcomb: int = 4
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.feat_proj = nn.Dense(
            self.num_filters0,
            use_bias=False,
            kernel_init=orthogonal,
            dtype=self.dtype,
        )
        self.z_proj = nn.Dense(
            self.num_filters0,
            kernel_init=orthogonal,
            bias_init=trunc_normal_bias(),
            dtype=self.dtype,
        )
        self.mid = [
            nn.Dense(
                self.num_filters0,
                kernel_init=orthogonal,
                bias_init=trunc_normal_bias(),
                dtype=self.dtype,
                name=f"mid_{i}",
            )
            for i in range(self.no_convs_fcomb - 2)
        ]
        self.last_layer = nn.Dense(
            self.num_classes,
            kernel_init=orthogonal,
            bias_init=trunc_normal_bias(),
            dtype=self.dtype,
        )

    def feature_term(self, features: jax.Array) -> jax.Array:
        """The z-independent half of the first 1x1 conv; compute once per MC batch."""
        return self.feat_proj(features)

    def decode_from_term(self, feat_term: jax.Array, z: jax.Array) -> jax.Array:
        """Finish decoding given the precomputed feature term and one z draw."""
        h = nn.relu(feat_term + self.z_proj(z.astype(self.dtype))[:, None, None, :])
        for layer in self.mid:
            h = nn.relu(layer(h))
        return self.last_layer(h).astype(jnp.float32)

    def __call__(self, features: jax.Array, z: jax.Array) -> jax.Array:
        return self.decode_from_term(self.feature_term(features), z)


class ProbabilisticUnet(nn.Module):
    """Probabilistic U-Net (https://arxiv.org/abs/1806.05034), TPU-native.

    Reference class: probabilistic_unet.py:217-371. Defaults mirror the
    reference module defaults (:231-234); the experiment scripts override to
    ``num_filters=(64, 128, 256, 512), no_convs_fcomb=3, beta=1.0,
    rl_swap=True`` (e.g. LIVECell/livecell_punet.py:47-56).

    ``beta`` / ``rl_swap`` / ``consensus_masking`` are loss hyperparameters
    carried on the module for API fidelity; the loss itself is the pure
    function :func:`pda.core.losses.neg_elbo`.
    """

    input_channels: int = 1
    num_classes: int = 1
    num_filters: Sequence[int] = (32, 64, 128, 192)
    latent_dim: int = 6
    no_convs_per_block: int = 3
    no_convs_fcomb: int = 4
    beta: float = 10.0
    consensus_masking: bool = False
    rl_swap: bool = False
    #: analytic KL in the ELBO; False = single-posterior-sample MC estimate
    #: (reference elbo(..., analytic_kl), probabilistic_unet.py:341-354)
    analytic_kl: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.unet = PUNetBackbone(
            num_filters=tuple(self.num_filters),
            n_convs_per_block=self.no_convs_per_block,
            num_classes=None,  # apply_last_layer=False: Fcomb is the head
            dtype=self.dtype,
        )
        self.prior = GaussianEncoder(
            num_filters=tuple(self.num_filters),
            latent_dim=self.latent_dim,
            n_convs_per_block=self.no_convs_per_block,
            dtype=self.dtype,
        )
        self.posterior = GaussianEncoder(
            num_filters=tuple(self.num_filters),
            latent_dim=self.latent_dim,
            n_convs_per_block=self.no_convs_per_block,
            dtype=self.dtype,
        )
        self.fcomb = Fcomb(
            num_filters0=self.num_filters[0],
            latent_dim=self.latent_dim,
            num_classes=self.num_classes,
            no_convs_fcomb=self.no_convs_fcomb,
            dtype=self.dtype,
        )

    def encode(
        self,
        x: jax.Array,
        segm: Optional[jax.Array] = None,
        flat_features: bool = False,
    ) -> PUNetEncoding:
        """Prior (+posterior if segm given) stats and UNet features.

        Reference ``forward`` (probabilistic_unet.py:285-293) minus the
        hidden state: everything is returned.

        ``flat_features=True`` (hot-path option): on the flat pipeline the
        feature map is returned in its margin-0 flat layout with
        ``feat_geom`` set, skipping the flat->image conversion (and its pad
        VJP) — decode through :func:`fcomb_decode_flat`. Falls back to the
        image layout (feat_geom=None) off the flat pipeline.
        """
        posterior = self.posterior(x, segm) if segm is not None else None
        prior = self.prior(x)
        geom = None
        if flat_features:
            features = self.unet(x, keep_flat=True)
            if isinstance(features, tuple):
                features, packed = features
                geom = (packed, x.shape[1], x.shape[2])
        else:
            features = self.unet(x)
        return PUNetEncoding(
            features=features, prior=prior, posterior=posterior, feat_geom=geom
        )

    def decode(self, features: jax.Array, z: jax.Array) -> jax.Array:
        """Segmentation logits from features + one latent draw (reference
        ``sample``/``reconstruct`` tail, :295-322)."""
        return self.fcomb(features, z)

    def decode_feature_term(self, features: jax.Array) -> jax.Array:
        return self.fcomb.feature_term(features)

    def decode_from_term(self, feat_term: jax.Array, z: jax.Array) -> jax.Array:
        return self.fcomb.decode_from_term(feat_term, z)

    def __call__(self, x: jax.Array, segm: Optional[jax.Array] = None) -> PUNetEncoding:
        """Init entry point: encodes AND decodes once (with the prior mean) so
        every submodule — including Fcomb — gets its parameters created."""
        enc = self.encode(x, segm)
        self.decode(enc.features, enc.prior.mu)
        return enc


# ---------------------------------------------------------------------------
# Functional conveniences over (model, params)
# ---------------------------------------------------------------------------


def init_params_cpu(model, *example_inputs, seed: int = 0):
    """Initialize parameters on the CPU backend.

    The init program (orthogonal/QR initializers) compiles pathologically
    slowly through the TPU remote-compile path, while forward/train programs
    compile in seconds — so inits always run on CPU and the arrays are
    transferred on first use. Use this anywhere a parameter template or fresh
    params are needed outside the Trainer engine (which does the same).
    """
    with jax.default_device(jax.devices("cpu")[0]):
        return model.init(jax.random.PRNGKey(seed), *example_inputs)["params"]


def encode(model: ProbabilisticUnet, params, x, segm=None) -> PUNetEncoding:
    return model.apply({"params": params}, x, segm, method="encode")


def decode(model: ProbabilisticUnet, params, features, z) -> jax.Array:
    return model.apply({"params": params}, features, z, method="decode")


def _mid_keys(fcomb_params):
    """Fcomb mid-layer keys in NUMERIC order (lexicographic sorted() would
    put mid_10 before mid_2 once no_convs_fcomb >= 13, silently diverging
    from Fcomb.decode_from_term's numeric iteration)."""
    return sorted(
        (k for k in fcomb_params if k.startswith("mid_")),
        key=lambda k: int(k.split("_")[1]),
    )


def _bd2(w: jax.Array) -> jax.Array:
    from .flat_ops import block_diag2

    return block_diag2(w)


def fcomb_feature_term_flat(
    model: ProbabilisticUnet, fcomb_params, feat_flat: jax.Array, packed: bool
) -> jax.Array:
    """The z-independent first-layer half ON THE FLAT LAYOUT.

    1x1 convs are per-position matmuls, so the Fcomb tail runs on the
    backbone's margin-0 flat (packed or not) unchanged — per-pixel values are
    identical to the image path; ring columns carry garbage that the final
    slice drops. Packed rows (two positions per 128 lanes) use block-diagonal
    kernels: full-K MXU contractions at half the row count."""
    dt = model.dtype
    wf = fcomb_params["feat_proj"]["kernel"].astype(dt)
    if packed:
        wf = _bd2(wf)
    return jnp.dot(feat_flat.astype(dt), wf)


def fcomb_decode_from_term_flat(
    model: ProbabilisticUnet, fcomb_params, term: jax.Array, geom, z: jax.Array
) -> jax.Array:
    """Finish the flat decode for one z draw -> IMAGE logits (B, H, W, nc).

    Mirrors Fcomb.decode_from_term exactly (same dtypes/order: bf16 Dense
    chain, f32 cast after the last layer); the flat->image boundary is a
    reshape + ring-column slice of the 1-channel logits instead of the
    64-channel feature map."""
    packed, h, w = geom
    dt = model.dtype
    zp = fcomb_params["z_proj"]
    zt = z.astype(dt) @ zp["kernel"].astype(dt) + zp["bias"].astype(dt)
    if packed:
        zt = jnp.concatenate([zt, zt], axis=-1)
    hid = nn.relu(term + zt[:, None, :])
    for m in _mid_keys(fcomb_params):
        wk = fcomb_params[m]["kernel"].astype(dt)
        bk = fcomb_params[m]["bias"].astype(dt)
        if packed:
            wk, bk = _bd2(wk), jnp.concatenate([bk, bk])
        hid = nn.relu(hid @ wk + bk)
    wl = fcomb_params["last_layer"]["kernel"].astype(dt)
    bl = fcomb_params["last_layer"]["bias"].astype(dt)
    if packed:
        wl, bl = _bd2(wl), jnp.concatenate([bl, bl])
    logits = (hid @ wl + bl).astype(jnp.float32)
    from . import flat_ops

    if packed:
        return flat_ops.from_flat_packed(logits, h, w)
    return flat_ops.from_flat(logits, h, w)


def fcomb_decode_flat(
    model: ProbabilisticUnet, fcomb_params, feat_flat, geom, z
) -> jax.Array:
    """Full flat decode (feature term + one z draw) -> image logits."""
    term = fcomb_feature_term_flat(model, fcomb_params, feat_flat, geom[0])
    return fcomb_decode_from_term_flat(model, fcomb_params, term, geom, z)


def mc_decode_logits(
    model: ProbabilisticUnet,
    params,
    features: jax.Array,
    dist: DiagGaussian,
    key: jax.Array,
    n_samples: int,
    feat_geom=None,
    axis_name=None,
) -> jax.Array:
    """(n_samples, B, H, W, C) logits from one feature map + n latent draws.

    The feature term is computed once; the per-sample tail is vmapped. This is
    the fused replacement for the reference's ``[model.sample() for _ in
    range(n)]`` loops (punet_trainer.py:16, mean_teacher_trainer.py:74).
    With ``feat_geom`` (from ``encode(flat_features=True)``) the tail runs on
    the flat layout and only the 1-channel per-sample logits convert to image.
    ``axis_name``: inside shard_map, the latent draws come from the global-
    batch noise slice (pda.core.distributions.sharded_normal).
    """
    zs = dist.sample_n(key, n_samples, axis_name=axis_name)  # (n, B, L)
    if feat_geom is not None:
        fc = params["fcomb"]
        term = fcomb_feature_term_flat(model, fc, features, feat_geom[0])
        return jax.vmap(
            lambda z: fcomb_decode_from_term_flat(model, fc, term, feat_geom, z)
        )(zs)
    feat_term = model.apply({"params": params}, features, method="decode_feature_term")

    def _decode(z):
        return model.apply({"params": params}, feat_term, z, method="decode_from_term")

    return jax.vmap(_decode)(zs)


def mc_predict_probs(
    model: ProbabilisticUnet,
    params,
    x: jax.Array,
    key: jax.Array,
    n_samples: int,
) -> jax.Array:
    """Mean sigmoid over n prior samples — the PUNet inference primitive.

    Reference: _custom_punet_prediction (punet_predictions.py:29-33).
    Returns (B, H, W, C) mean probabilities.
    """
    enc = encode(model, params, x)
    logits = mc_decode_logits(model, params, enc.features, enc.prior, key, n_samples)
    return jnp.mean(jax.nn.sigmoid(logits), axis=0)
