"""STFT/iSTFT tests (reference utils/module.py:104-184 capability)."""

import numpy as np
import jax.numpy as jnp
import pytest

from jen1_tpu.ops.stft import STFT


class TestSTFT:
    def test_roundtrip(self):
        stft = STFT(num_fft=256, hop_length=64, window_length=256)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 2, 1024)).astype(np.float32)) * 0.5
        a, b = stft.encode(x)
        assert a.shape[2] == 256 // 2 + 1  # freq bins
        y = stft.decode(a, b, length=1024)
        np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-3)

    def test_encode1d_shapes(self):
        stft = STFT(num_fft=128, hop_length=32, window_length=128)
        x = jnp.zeros((1, 2, 512))
        pair = stft.encode1d(x)
        f = 128 // 2 + 1
        assert pair.shape[1] == 2 * 2 * f  # stacked (mag, phase) x channels
        y = stft.decode1d(pair, length=512)
        assert y.shape == (1, 2, 512)

    def test_matches_torch_stft(self):
        import torch

        stft = STFT(num_fft=128, hop_length=32, window_length=128)
        rng = np.random.default_rng(1)
        x = rng.normal(size=(1, 1, 512)).astype(np.float32)
        a, b = stft.encode(jnp.asarray(x))
        ours = np.asarray(a)[0, 0]

        t = torch.stft(
            torch.from_numpy(x[0]),
            n_fft=128,
            hop_length=32,
            win_length=128,
            window=torch.hann_window(128),
            return_complex=True,
            normalized=True,
        )
        ref = t.abs().numpy()[0]
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
