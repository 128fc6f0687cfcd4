"""flatten_optimizer knob: same math as the per-leaf optimizer, correct
gating under sharded meshes. (Perf verdict: measured slower at B=3 on v5e,
so default-off — benchmarks/TRAIN_STEP_TPU.md 'Flatten-optimizer A/B'.)"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from jen1_tpu.config import OptimizerConfig
from jen1_tpu.train.optim import make_optimizer


def _params():
    return {
        "a": jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)),
                         jnp.float32),
        "b": {"w": jnp.ones((2,), jnp.float32)},
    }


def _grads():
    return {
        "a": jnp.asarray(np.random.default_rng(1).standard_normal((4, 3)),
                         jnp.float32),
        "b": {"w": jnp.asarray([0.5, -2.0], jnp.float32)},
    }


def _run(opt, params, grads, steps=3):
    state = opt.init(params)
    for _ in range(steps):
        updates, state = opt.update(grads, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
    return params


class TestFlattenOptimizer:
    def test_same_trajectory_as_per_leaf(self):
        cfg_flat = OptimizerConfig(flatten_optimizer=True)
        cfg_leaf = dataclasses.replace(cfg_flat, flatten_optimizer=False)
        p1 = _run(make_optimizer(cfg_flat), _params(), _grads())
        p2 = _run(make_optimizer(cfg_leaf), _params(), _grads())
        for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)

    def test_flatten_ok_false_overrides_config(self):
        cfg = OptimizerConfig(flatten_optimizer=True)
        opt = make_optimizer(cfg, flatten_ok=False)
        state = opt.init(_params())
        # per-leaf state keeps the params' tree structure in the moments
        leaves = jax.tree.leaves(state)
        assert any(leaf.shape == (4, 3) for leaf in leaves
                   if hasattr(leaf, "shape"))

    def test_flattened_state_is_single_vector(self):
        cfg = OptimizerConfig(flatten_optimizer=True)
        opt = make_optimizer(cfg)
        state = opt.init(_params())
        shapes = {leaf.shape for leaf in jax.tree.leaves(state)
                  if hasattr(leaf, "shape") and leaf.size > 1}
        assert shapes == {(14,)}, shapes  # 4*3 + 2 concatenated

    def test_trainer_gates_flatten_on_tp_mesh(self):
        from jen1_tpu.parallel.mesh import make_mesh

        assert len(jax.devices()) == 8
        mesh = make_mesh(dp=4, tp=2)
        # mirrors trainer.__init__'s gate
        assert dict(mesh.shape).get("tp", 1) > 1
