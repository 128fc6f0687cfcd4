"""Unit tests for low-level ops, including parity goldens against torch CPU.

The reference implementation is torch; comparing our channels-last XLA ops to
torch's channels-first ops with identical weights is the op-level parity bar
(SURVEY §4 implication (b)).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from jen1_tpu.ops.conv import conv1d, conv_transpose1d
from jen1_tpu.ops.norm import GroupNorm, LayerNorm
from jen1_tpu.ops.attention import dot_product_attention


def _np(x):
    return np.asarray(x)


class TestConv1d:
    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("kernel,stride,dilation", [(3, 1, 1), (9, 4, 1), (5, 2, 1), (3, 1, 2), (1, 1, 1)])
    def test_matches_torch(self, causal, kernel, stride, dilation):
        rng = np.random.default_rng(0)
        B, L, Cin, Cout = 2, 32, 6, 8
        x = rng.normal(size=(B, L, Cin)).astype(np.float32)
        w = rng.normal(size=(kernel, Cin, Cout)).astype(np.float32) * 0.2
        b = rng.normal(size=(Cout,)).astype(np.float32)

        y = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                   stride=stride, dilation=dilation, causal=causal)

        # torch reference: replicate the reference Conv1d padding rule
        # (jen1/model/blocks.py:44-51) on (B, C, L).
        xt = torch.from_numpy(x.transpose(0, 2, 1))
        pad = (kernel - 1) * dilation
        xt = F.pad(xt, (pad, 0) if causal else (pad // 2, pad // 2))
        wt = torch.from_numpy(w.transpose(2, 1, 0))  # (Cout, Cin, K)
        yt = F.conv1d(xt, wt, torch.from_numpy(b), stride=stride, dilation=dilation)
        yt = yt.numpy().transpose(0, 2, 1)

        assert y.shape == yt.shape
        np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-4)

    def test_causal_no_future_leak(self):
        rng = np.random.default_rng(1)
        B, L, C = 1, 16, 4
        x = rng.normal(size=(B, L, C)).astype(np.float32)
        w = rng.normal(size=(3, C, C)).astype(np.float32)
        y1 = _np(conv1d(jnp.asarray(x), jnp.asarray(w), causal=True))
        x2 = x.copy()
        x2[:, 10:] += 100.0
        y2 = _np(conv1d(jnp.asarray(x2), jnp.asarray(w), causal=True))
        np.testing.assert_array_equal(y1[:, :10], y2[:, :10])

    @pytest.mark.parametrize("causal", [False, True])
    @pytest.mark.parametrize("kernel,dilation", [(3, 1), (1, 1), (5, 2)])
    def test_dot_impl_matches_xla(self, monkeypatch, causal, kernel,
                                  dilation):
        """JEN1_CONV_IMPL=dot (K shifted dot_generals, the MFU experiment)
        must be numerically identical to the lax.conv path."""
        rng = np.random.default_rng(2)
        B, L, Cin, Cout = 2, 32, 6, 8
        x = jnp.asarray(rng.normal(size=(B, L, Cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(kernel, Cin, Cout)).astype(np.float32) * 0.2)
        b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))
        ref = _np(conv1d(x, w, b, dilation=dilation, causal=causal))
        monkeypatch.setenv("JEN1_CONV_IMPL", "dot")
        out = _np(conv1d(x, w, b, dilation=dilation, causal=causal))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
        # strided convs keep the lax.conv path under the flag
        s_ref = conv1d(x, w, b, stride=2)
        assert s_ref.shape[1] == L // 2


class TestConvTranspose1d:
    @pytest.mark.parametrize("factor", [2, 4, 5])
    def test_matches_torch(self, factor):
        rng = np.random.default_rng(2)
        B, L, Cin, Cout = 2, 12, 6, 4
        k = factor * 2
        padding = factor // 2 + factor % 2
        output_padding = factor % 2
        x = rng.normal(size=(B, L, Cin)).astype(np.float32)
        w = rng.normal(size=(k, Cin, Cout)).astype(np.float32) * 0.2
        b = rng.normal(size=(Cout,)).astype(np.float32)

        y = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                             stride=factor, padding=padding,
                             output_padding=output_padding)

        xt = torch.from_numpy(x.transpose(0, 2, 1))
        wt = torch.from_numpy(w.transpose(1, 2, 0))  # (Cin, Cout, K)
        yt = F.conv_transpose1d(xt, wt, torch.from_numpy(b), stride=factor,
                                padding=padding, output_padding=output_padding)
        yt = yt.numpy().transpose(0, 2, 1)
        assert y.shape == yt.shape, (y.shape, yt.shape)
        np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-4)

    def test_length_multiplies_exactly(self):
        for factor in (2, 4):
            x = jnp.ones((1, 10, 3))
            w = jnp.ones((factor * 2, 3, 5))
            y = conv_transpose1d(x, w, stride=factor, padding=factor // 2,
                                 output_padding=0)
            assert y.shape == (1, 10 * factor, 5)


class TestNorms:
    def test_groupnorm_matches_torch(self):
        rng = np.random.default_rng(3)
        B, L, C, G = 2, 20, 8, 4
        x = rng.normal(size=(B, L, C)).astype(np.float32)
        gn = GroupNorm(num_groups=G)
        params = gn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        scale = rng.normal(size=(C,)).astype(np.float32)
        bias = rng.normal(size=(C,)).astype(np.float32)
        params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
        y = gn.apply(params, jnp.asarray(x))

        tgn = torch.nn.GroupNorm(G, C)
        with torch.no_grad():
            tgn.weight.copy_(torch.from_numpy(scale))
            tgn.bias.copy_(torch.from_numpy(bias))
        yt = tgn(torch.from_numpy(x.transpose(0, 2, 1))).detach().numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-4)

    def test_layernorm_matches_torch(self):
        rng = np.random.default_rng(4)
        B, N, C = 2, 7, 10
        x = rng.normal(size=(B, N, C)).astype(np.float32)
        ln = LayerNorm()
        scale = rng.normal(size=(C,)).astype(np.float32)
        bias = rng.normal(size=(C,)).astype(np.float32)
        params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
        y = ln.apply(params, jnp.asarray(x))
        tln = torch.nn.LayerNorm(C)
        with torch.no_grad():
            tln.weight.copy_(torch.from_numpy(scale))
            tln.bias.copy_(torch.from_numpy(bias))
        yt = tln(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-4)


class TestAttention:
    def test_matches_torch_sdpa(self):
        rng = np.random.default_rng(5)
        B, H, N, D = 2, 3, 11, 8
        q = rng.normal(size=(B, H, N, D)).astype(np.float32)
        k = rng.normal(size=(B, H, N, D)).astype(np.float32)
        v = rng.normal(size=(B, H, N, D)).astype(np.float32)
        for causal in (False, True):
            y = dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                      causal=causal)
            yt = F.scaled_dot_product_attention(
                torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
                is_causal=causal).numpy()
            np.testing.assert_allclose(_np(y), yt, rtol=1e-4, atol=1e-4)

    def test_causal_no_future_leak(self):
        rng = np.random.default_rng(6)
        B, H, N, D = 1, 2, 9, 4
        q = rng.normal(size=(B, H, N, D)).astype(np.float32)
        k = rng.normal(size=(B, H, N, D)).astype(np.float32)
        v = rng.normal(size=(B, H, N, D)).astype(np.float32)
        y1 = _np(dot_product_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True))
        k2, v2 = k.copy(), v.copy()
        k2[:, :, 5:] += 10.0
        v2[:, :, 5:] += 10.0
        y2 = _np(dot_product_attention(jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), causal=True))
        np.testing.assert_allclose(y1[:, :, :5], y2[:, :, :5], rtol=1e-5, atol=1e-5)
