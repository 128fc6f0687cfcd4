"""int8-weight Pallas matmul: correctness (interpret mode on CPU) and the
qweights wiring through OmniConv1d.

The kernel exists as OPT-IN infrastructure: the measured e2e verdict
(benchmarks/INT8_WEIGHTS_TPU.md) is that int8 weights cannot beat XLA on
this model's B=1 shapes — the CFG-doubled deep-level matmuls sit near the
v5e compute ridge, so weight-read savings don't convert to wall time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jen1_tpu.ops.conv import OmniConv1d, conv1d
from jen1_tpu.ops.int8_matmul import (
    conv1d_int8w,
    matmul_int8w,
    quantize_conv_params,
    quantize_weight,
)


class TestQuantize:
    def test_roundtrip_error_bounded(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.standard_normal((96, 32)) * 0.3, jnp.float32)
        w8, s = quantize_weight(w)
        assert w8.dtype == jnp.int8 and s.shape == (32,)
        err = jnp.abs(w8.astype(jnp.float32) * s - w)
        # per-channel symmetric: error <= scale/2 per element
        assert float(jnp.max(err / s)) <= 0.5 + 1e-6

    def test_preserves_exact_zero(self):
        w8, s = quantize_weight(jnp.zeros((8, 4)))
        assert int(jnp.abs(w8).max()) == 0


class TestMatmul:
    @pytest.mark.parametrize("m,k,n", [(130, 96, 72), (282, 3072, 128)])
    def test_matches_dequant_reference(self, m, k, n):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, n)) * 0.05, jnp.float32)
        w8, s = quantize_weight(w)
        ref = x @ (w8.astype(jnp.float32) * s)
        out = matmul_int8w(x, w8, s)
        assert out.shape == (m, n)
        scale = float(jnp.max(jnp.abs(ref))) + 1e-6
        assert float(jnp.max(jnp.abs(out - ref))) / scale < 5e-3


class TestConv:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("dilation", [1, 2])
    def test_matches_conv1d_on_dequantized_weights(self, causal, dilation):
        rng = np.random.default_rng(2)
        b, l, cin, cout, k = 2, 37, 24, 16, 3
        x = jnp.asarray(rng.standard_normal((b, l, cin)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.1, jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout), jnp.float32)
        w8, s = quantize_weight(w.reshape(k * cin, cout))
        wdq = (w8.astype(jnp.float32) * s).reshape(k, cin, cout)
        ref = conv1d(x, wdq, bias, causal=causal, dilation=dilation)
        out = conv1d_int8w(x, w8.reshape(k, cin, cout), s, bias,
                           causal=causal, dilation=dilation)
        assert out.shape == ref.shape
        assert float(jnp.max(jnp.abs(out - ref))) < 1e-2


class TestModuleWiring:
    def test_omniconv_uses_qweights_when_provided(self):
        mod = OmniConv1d(out_channels=16, kernel_size=3)
        x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 20, 12)),
                        jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x)
        base = mod.apply(variables, x)
        q = quantize_conv_params(variables, min_weight_bytes=0,
                                 min_weight_bytes_k1=0)
        assert set(q) == {"kernel8", "scale"}
        out = mod.apply({"params": variables["params"], "qweights": q}, x)
        assert out.shape == base.shape
        # int8 path engaged: close to, but not bit-identical with, the fp path
        diff = float(jnp.max(jnp.abs(out - base)))
        assert 0 < diff < 5e-2

    def test_threshold_excludes_small_kernels(self):
        mod = OmniConv1d(out_channels=16, kernel_size=3)
        x = jnp.zeros((1, 20, 12), jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x)
        q = quantize_conv_params(variables)  # default thresholds: 4 MB / 1 MB
        assert q == {}

    def test_strided_conv_ignores_qweights(self):
        mod = OmniConv1d(out_channels=16, kernel_size=5, stride=2)
        x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 20, 12)),
                        jnp.float32)
        variables = mod.init(jax.random.PRNGKey(0), x)
        base = mod.apply(variables, x)
        q = quantize_conv_params(variables, min_weight_bytes=0,
                                 min_weight_bytes_k1=0)
        out = mod.apply({"params": variables["params"], "qweights": q}, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(base))

    def test_quantize_walks_nested_tree(self):
        tree = {
            "params": {
                "unet": {
                    "project": {"kernel": jnp.ones((3, 8, 4)), "bias": jnp.ones(4)},
                    "leaf": jnp.ones((2, 2)),
                }
            }
        }
        q = quantize_conv_params(tree, min_weight_bytes=0)
        assert set(q["unet"]["project"]) == {"kernel8", "scale"}
        assert "leaf" not in q.get("unet", {})
