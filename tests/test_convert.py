"""Torch-checkpoint converter tests.

Builds a synthetic torch state_dict with the reference's exact key layout
(verified against probabilistic_unet.py / unet_blocks.py Sequential ordering)
and checks the converted pytree (a) matches our params template structurally
and (b) the fcomb first-layer split reproduces concat-then-matmul.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pda.models import ProbabilisticUnet
from pda.models.convert import convert_punet_state_dict

FILTERS = (4, 8, 12, 16)
LATENT = 6
N_FCOMB = 3
N_PER_BLOCK = 3


def synthetic_torch_state(rng):
    """State dict with the reference module's key names and torch layouts."""
    torch = pytest.importorskip("torch")
    state = {}

    def conv(name, i, o, k=3):
        state[f"{name}.weight"] = torch.from_numpy(
            rng.normal(size=(o, i, k, k)).astype(np.float32)
        )
        state[f"{name}.bias"] = torch.from_numpy(
            rng.normal(size=(o,)).astype(np.float32)
        )

    # unet down: DownConvBlock(0) no pool -> convs at layers.0/2/4;
    # blocks 1.. have pool at 0 -> convs at 1/3/5 (unet_blocks.py:14-26).
    # First conv of block i takes FILTERS[i-1] channels (working wiring; the
    # HEAD snapshot's Unet has the same swapped-lines bug as the Encoder).
    for i, f in enumerate(FILTERS):
        fin = 1 if i == 0 else FILTERS[i - 1]
        idxs = [0, 2, 4] if i == 0 else [1, 3, 5]
        for j, k in enumerate(idxs):
            conv(f"unet.contracting_path.{i}.layers.{k}", fin if j == 0 else f, f)
    # unet up: input = skip + below channels (unet.py:39-43)
    ups = []
    out = FILTERS[-1]
    for i in range(len(FILTERS) - 2, -1, -1):
        fin = out + FILTERS[i]
        out = FILTERS[i]
        ups.append((fin, out))
    for i, (fin, fout) in enumerate(ups):
        for j, k in enumerate([0, 2, 4]):
            conv(
                f"unet.upsampling_path.{i}.conv_block.layers.{k}",
                fin if j == 0 else fout,
                fout,
            )

    # prior / posterior encoders: one Sequential, pools interleaved.
    # NOTE: block i's first conv takes num_filters[i-1] input channels — the
    # WORKING wiring (upstream SimonKohl code / older reference commits). The
    # reference snapshot at HEAD swapped probabilistic_unet.py:50-51 so its
    # Encoder crashes on any non-uniform num_filters (verified empirically);
    # checkpoints can only exist from the working wiring, so the converter
    # targets that.
    for name, in_ch in (("prior", 1), ("posterior", 2)):
        idx = 0
        for i, f in enumerate(FILTERS):
            if i > 0:
                idx += 1
            fin = in_ch if i == 0 else FILTERS[i - 1]
            for j in range(N_PER_BLOCK):
                conv(f"{name}.encoder.layers.{idx + 2 * j}", fin if j == 0 else f, f)
            idx += 2 * N_PER_BLOCK
        conv(f"{name}.conv_layer", FILTERS[-1], 2 * LATENT, k=1)

    conv("fcomb.layers.0", FILTERS[0] + LATENT, FILTERS[0], k=1)
    conv("fcomb.layers.2", FILTERS[0], FILTERS[0], k=1)
    conv("fcomb.last_layer", FILTERS[0], 1, k=1)
    return state


@pytest.fixture(scope="module")
def converted():
    rng = np.random.default_rng(0)
    state = synthetic_torch_state(rng)
    return state, convert_punet_state_dict(
        state, num_filters=FILTERS, no_convs_fcomb=N_FCOMB
    )


class TestConverter:
    def test_structure_matches_template(self, converted):
        _, params = converted
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=N_FCOMB,
            rl_swap=True, beta=1.0,
        )
        x0 = jnp.zeros((1, 32, 32, 1))
        template = model.init(jax.random.PRNGKey(0), x0, x0)["params"]

        t_paths = {
            "/".join(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(template)[0][0:0] or []
        }
        # compare key paths + shapes
        flat_t = jax.tree_util.tree_leaves_with_path(template)
        flat_c = jax.tree_util.tree_leaves_with_path(params)
        paths_t = {jax.tree_util.keystr(p): v.shape for p, v in flat_t}
        paths_c = {jax.tree_util.keystr(p): np.asarray(v).shape for p, v in flat_c}
        assert paths_t == paths_c

    def test_converted_params_run_forward(self, converted):
        _, params = converted
        model = ProbabilisticUnet(
            num_filters=FILTERS, no_convs_fcomb=N_FCOMB,
            rl_swap=True, beta=1.0,
        )
        params = jax.tree_util.tree_map(jnp.asarray, params)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 1))
        enc = model.apply({"params": params}, x, method="encode")
        logits = model.apply(
            {"params": params}, enc.features, enc.prior.mu, method="decode"
        )
        assert logits.shape == (1, 32, 32, 1)
        assert bool(jnp.all(jnp.isfinite(logits)))

    def test_fcomb_split_equals_concat_matmul(self, converted):
        state, params = converted
        torch = pytest.importorskip("torch")
        w0 = state["fcomb.layers.0.weight"].numpy()[:, :, 0, 0]  # (C0, C0+L)
        b0 = state["fcomb.layers.0.bias"].numpy()
        feat = np.random.default_rng(2).normal(size=(5, FILTERS[0])).astype(np.float32)
        z = np.random.default_rng(3).normal(size=(5, LATENT)).astype(np.float32)
        ref = np.concatenate([feat, z], axis=1) @ w0.T + b0
        ours = (
            feat @ np.asarray(params["fcomb"]["feat_proj"]["kernel"])
            + z @ np.asarray(params["fcomb"]["z_proj"]["kernel"])
            + np.asarray(params["fcomb"]["z_proj"]["bias"])
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
