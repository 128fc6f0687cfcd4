"""utils/shape_cache: disk-cached eval_shape trees (VERDICT r3 weak #7)."""

import jax
import jax.numpy as jnp
import pytest

from jen1_tpu.utils.shape_cache import cached_shapes, zeros_like_shapes


def _build():
    return {
        "params": {
            "dense": {
                "kernel": jax.ShapeDtypeStruct((4, 8), jnp.bfloat16),
                "bias": jax.ShapeDtypeStruct((8,), jnp.float32),
            },
            "scales": [
                jax.ShapeDtypeStruct((2,), jnp.int32),
                jax.ShapeDtypeStruct((3, 3), jnp.float32),
            ],
        }
    }


def test_roundtrip_and_hit(tmp_path):
    calls = []

    def builder():
        calls.append(1)
        return _build()

    d = str(tmp_path)
    first = cached_shapes("k1", builder, directory=d)
    assert calls == [1]
    second = cached_shapes("k1", builder, directory=d)
    assert calls == [1], "second call must load from disk, not rebuild"
    assert jax.tree.structure(first) == jax.tree.structure(second)
    for a, b in zip(jax.tree.leaves(first), jax.tree.leaves(second)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_key_separates_entries(tmp_path):
    d = str(tmp_path)
    cached_shapes("ka", _build, directory=d)
    other = cached_shapes(
        "kb", lambda: {"x": jax.ShapeDtypeStruct((1,), jnp.float32)},
        directory=d)
    assert list(other) == ["x"]


def test_corrupt_entry_falls_back(tmp_path):
    d = str(tmp_path)
    cached_shapes("kc", _build, directory=d)
    import os

    (entry,) = os.listdir(d)
    with open(os.path.join(d, entry), "w") as f:
        f.write("{not json")
    out = cached_shapes("kc", _build, directory=d)  # must rebuild, not raise
    assert "params" in out


def test_bypass_env(tmp_path, monkeypatch):
    monkeypatch.setenv("JEN1_TPU_NO_SHAPE_CACHE", "1")
    calls = []

    def builder():
        calls.append(1)
        return _build()

    d = str(tmp_path)
    cached_shapes("kd", builder, directory=d)
    cached_shapes("kd", builder, directory=d)
    assert calls == [1, 1]
    import os

    assert not os.path.exists(d) or not os.listdir(d)


def test_zeros_like_shapes_matches_tree():
    shapes = _build()
    z = zeros_like_shapes(shapes)
    for s, v in zip(jax.tree.leaves(shapes), jax.tree.leaves(z)):
        assert v.shape == s.shape and v.dtype == s.dtype
        assert float(jnp.sum(jnp.abs(v.astype(jnp.float32)))) == 0.0


def test_matches_real_eval_shape(tmp_path):
    """Cache round-trip of an actual flax init eval_shape (FrozenDict)."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    m = M()
    x = jnp.zeros((2, 3))
    builder = lambda: jax.eval_shape(  # noqa: E731
        lambda r: m.init(r, x), jax.random.PRNGKey(0))
    fresh = builder()
    d = str(tmp_path)
    cached_shapes("ke", builder, directory=d)
    loaded = cached_shapes("ke", lambda: pytest.fail("must hit"), directory=d)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(fresh),
        jax.tree_util.tree_leaves_with_path(loaded),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        assert a.shape == b.shape and a.dtype == b.dtype
    # apply accepts the decoded (plain-dict) tree
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), loaded)
    m.apply(params, x)
