"""Parity of the fused AdamW (train/fused_optim.py) against the optax chain
it replaces (optim.make_optimizer: clip_by_global_norm -> adamw ->
apply_if_finite), plus non-finite containment semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from jen1_tpu.config import OptimizerConfig
from jen1_tpu.train.fused_optim import fused_adamw_apply, fused_adamw_init
from jen1_tpu.train.optim import make_lr_schedule, make_optimizer


def tree_rand(key, scale=1.0):
    k = jax.random.split(key, 4)
    return {
        "dense": {"kernel": scale * jax.random.normal(k[0], (16, 32)),
                  "bias": scale * jax.random.normal(k[1], (32,))},
        "conv": {"kernel": scale * jax.random.normal(k[2], (5, 8, 8))},
        "scale": scale * jax.random.normal(k[3], (7,)),
    }


@pytest.fixture(scope="module")
def oc():
    return OptimizerConfig()


class TestParity:
    @pytest.mark.parametrize("grad_scale", [1e-3, 1.0, 50.0])
    def test_matches_optax_chain(self, oc, grad_scale):
        """5 steps, grads small (clip inactive), unit, and large (clip
        ACTIVE at ||g||>0.7): fused params == optax-chain params."""
        params = tree_rand(jax.random.PRNGKey(0))
        tx = make_optimizer(oc, grad_accum_every=1)
        opt_state = tx.init(params)
        fstate = fused_adamw_init(params)
        p_ref, p_fused = params, params
        sched = make_lr_schedule(oc)
        for step in range(5):
            grads = tree_rand(jax.random.PRNGKey(100 + step), grad_scale)
            updates, opt_state = tx.update(grads, opt_state, p_ref)
            p_ref = optax.apply_updates(p_ref, updates)
            p_fused, fstate, gnorm = fused_adamw_apply(
                grads, fstate, p_fused, lr=sched, b1=oc.beta_1,
                b2=oc.beta_2, eps=1e-8, weight_decay=oc.weight_decay,
                clip=oc.grad_clip)
            assert np.isclose(float(gnorm), float(optax.global_norm(grads)),
                              rtol=1e-5)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-7)
        assert int(fstate.count) == 5

    def test_jit_and_donation_safe(self, oc):
        params = tree_rand(jax.random.PRNGKey(1))
        fstate = fused_adamw_init(params)
        grads = tree_rand(jax.random.PRNGKey(2))
        f = jax.jit(lambda g, s, p: fused_adamw_apply(
            g, s, p, lr=3e-5, b1=0.9, b2=0.95, eps=1e-8,
            weight_decay=0.1, clip=0.7))
        p2, s2, n = f(grads, fstate, params)
        assert np.isfinite(float(n))
        for a in jax.tree.leaves(p2):
            assert np.isfinite(np.asarray(a)).all()


class TestNonFinite:
    def test_nan_grad_skips_update(self, oc):
        params = tree_rand(jax.random.PRNGKey(3))
        fstate = fused_adamw_init(params)
        grads = tree_rand(jax.random.PRNGKey(4))
        grads["dense"]["kernel"] = grads["dense"]["kernel"].at[0, 0].set(
            jnp.nan)
        p2, s2, gnorm = fused_adamw_apply(
            grads, fstate, params, lr=3e-5, b1=0.9, b2=0.95, eps=1e-8,
            weight_decay=0.1, clip=0.7)
        assert not np.isfinite(float(gnorm))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(s2.count) == 0
        assert int(s2.notfinite_count) == 1
        # a following finite step proceeds and resets the counter
        g2 = tree_rand(jax.random.PRNGKey(5))
        p3, s3, _ = fused_adamw_apply(
            g2, s2, p2, lr=3e-5, b1=0.9, b2=0.95, eps=1e-8,
            weight_decay=0.1, clip=0.7)
        assert int(s3.count) == 1
        assert int(s3.notfinite_count) == 0
        changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(p2), jax.tree.leaves(p3)))
        assert changed
