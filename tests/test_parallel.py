"""Distributed tests on the virtual 8-device CPU mesh.

SURVEY.md section 4 point 4: the same jitted step under different mesh shapes
must produce the same loss for the same global batch — the JAX analog of
multi-node testing without a cluster.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pda.models import ProbabilisticUnet
from pda.parallel import batch_sharding, get_mesh, replicated, shard_batch
from pda.train.optim import adam
from pda.train.state import create_train_state
from pda.train.steps import (
    make_adamt_step,
    make_mean_teacher_step,
    make_supervised_punet_step,
)

FILTERS = (4, 8, 12, 16)


def _model(masking=False):
    return ProbabilisticUnet(
        num_filters=FILTERS, no_convs_fcomb=3, beta=1.0,
        rl_swap=True, consensus_masking=masking,
    )


def _state(model, tx, with_teacher=False):
    x0 = jnp.zeros((1, 32, 32, 1))
    params = model.init(jax.random.PRNGKey(0), x0, x0)["params"]
    return create_train_state(
        params, tx, jax.random.PRNGKey(1), with_teacher=with_teacher
    )


@pytest.fixture(scope="module")
def batch8():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(8, 32, 32, 1)).astype(np.float32)
    y = (rng.random((8, 32, 32, 1)) > 0.5).astype(np.float32)
    return x, y


class TestMeshEquivalence:
    def test_eight_devices_available(self):
        assert len(jax.devices()) >= 8

    def test_supervised_loss_same_on_1_and_8_device_mesh(self, batch8):
        x, y = batch8
        losses = {}
        for n in (1, 8):
            mesh = get_mesh(n)
            model = _model()
            tx = adam(1e-3)
            state = jax.device_put(_state(model, tx), replicated(mesh))
            step = jax.jit(make_supervised_punet_step(model, tx), donate_argnums=0)
            xb = jax.device_put(x, batch_sharding(mesh))
            yb = jax.device_put(y, batch_sharding(mesh))
            state, metrics = step(state, xb, yb)
            losses[n] = float(metrics["loss"])
        # identical params+batch+rng -> same loss regardless of mesh
        assert abs(losses[1] - losses[8]) / abs(losses[1]) < 1e-4, losses

    def test_supervised_params_same_after_step(self, batch8):
        x, y = batch8
        leaves = {}
        for n in (1, 8):
            mesh = get_mesh(n)
            model = _model()
            tx = adam(1e-3)
            state = jax.device_put(_state(model, tx), replicated(mesh))
            step = jax.jit(make_supervised_punet_step(model, tx), donate_argnums=0)
            xb = jax.device_put(x, batch_sharding(mesh))
            yb = jax.device_put(y, batch_sharding(mesh))
            state, _ = step(state, xb, yb)
            leaves[n] = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        np.testing.assert_allclose(leaves[1], leaves[8], rtol=1e-4, atol=1e-6)

    def test_mean_teacher_step_on_mesh(self, batch8):
        x, _ = batch8
        mesh = get_mesh(8)
        model = _model(masking=True)
        tx = adam(1e-3)
        state = jax.device_put(
            _state(model, tx, with_teacher=True), replicated(mesh)
        )
        step = jax.jit(
            make_mean_teacher_step(model, tx, do_consensus_masking=True),
            donate_argnums=0,
        )
        b = shard_batch(mesh, (x, x, x, x))
        state, metrics = step(state, *b)
        assert np.isfinite(float(metrics["loss"]))

    def test_adamt_full_step_on_mesh(self, batch8):
        x, y = batch8
        mesh = get_mesh(8)
        model = _model(masking=True)
        tx = adam(1e-3)
        state = jax.device_put(
            _state(model, tx, with_teacher=True), replicated(mesh)
        )
        step = jax.jit(
            make_adamt_step(model, tx, do_consensus_masking=True), donate_argnums=0
        )
        b = shard_batch(mesh, (x, y, x, x, x, y))
        state, metrics = step(state, *b)
        assert np.isfinite(float(metrics["loss"]))
        # teacher stays replicated and finite
        t0 = jax.tree_util.tree_leaves(state.teacher_params)[0]
        assert bool(jnp.all(jnp.isfinite(t0)))
