"""STFT/iSTFT helper (reference: utils/module.py:104-184).

torch.stft semantics: center=True reflect padding, Hann window,
normalized=True (scale by win_length^-0.5), onesided rfft. The 1-D codecs
(`encode1d`/`decode1d`) flatten (channel, freq) for the UNet's use_stft path
(off by default: reference config.py:64-65).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


class STFT:
    def __init__(
        self,
        num_fft: int = 1023,
        hop_length: int = 256,
        window_length: Optional[int] = None,
        length: Optional[int] = None,
        use_complex: bool = False,
    ):
        self.num_fft = num_fft
        self.hop_length = hop_length or num_fft // 4
        self.window_length = window_length or num_fft
        self.length = length
        self.use_complex = use_complex
        self.window = jnp.asarray(np.hanning(self.window_length + 1)[:-1], jnp.float32)

    # x: (B, C, T) reference layout (this helper mirrors the torch utility)
    def encode(self, wave: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, c, t = wave.shape
        x = wave.reshape(b * c, t).astype(jnp.float32)
        pad = self.num_fft // 2
        x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        n_frames = 1 + (x.shape[1] - self.num_fft) // self.hop_length
        idx = (
            np.arange(self.num_fft)[None, :]
            + np.arange(n_frames)[:, None] * self.hop_length
        )
        frames = x[:, idx] * self.window[None, None, :]
        spec = jnp.fft.rfft(frames, n=self.num_fft, axis=-1)
        spec = spec * (self.window_length**-0.5)  # torch normalized=True
        spec = spec.transpose(0, 2, 1)  # (BC, F, L)
        if self.use_complex:
            a, bpart = jnp.real(spec), jnp.imag(spec)
        else:
            a, bpart = jnp.abs(spec), jnp.angle(spec)
        f, l = a.shape[1], a.shape[2]
        return a.reshape(b, c, f, l), bpart.reshape(b, c, f, l)

    def decode(
        self, stft_a: jnp.ndarray, stft_b: jnp.ndarray, length: Optional[int] = None
    ) -> jnp.ndarray:
        b, c, f, l = stft_a.shape
        a = stft_a.reshape(b * c, f, l)
        bb = stft_b.reshape(b * c, f, l)
        if self.use_complex:
            spec = a + 1j * bb
        else:
            spec = a * jnp.exp(1j * bb)
        spec = spec / (self.window_length**-0.5)
        frames = jnp.fft.irfft(spec.transpose(0, 2, 1), n=self.num_fft, axis=-1)
        frames = frames * self.window[None, None, :]

        total = self.num_fft + (l - 1) * self.hop_length
        out = jnp.zeros((b * c, total), jnp.float32)
        norm = jnp.zeros((total,), jnp.float32)
        win_sq = self.window**2
        for i in range(l):
            s = i * self.hop_length
            out = out.at[:, s : s + self.num_fft].add(frames[:, i])
            norm = norm.at[s : s + self.num_fft].add(win_sq)
        out = out / jnp.maximum(norm[None, :], 1e-11)
        pad = self.num_fft // 2
        out = out[:, pad:]
        length = length or self.length
        if length is not None:
            out = out[:, :length]
        else:
            out = out[:, : total - 2 * pad]
        return out.reshape(b, c, -1)

    def encode1d(self, wave: jnp.ndarray, stacked: bool = True):
        a, bpart = self.encode(wave)
        b, c, f, l = a.shape
        a = a.reshape(b, c * f, l)
        bpart = bpart.reshape(b, c * f, l)
        return jnp.concatenate([a, bpart], axis=1) if stacked else (a, bpart)

    def decode1d(self, stft_pair: jnp.ndarray, length: Optional[int] = None):
        f = self.num_fft // 2 + 1
        a, bpart = jnp.split(stft_pair, 2, axis=1)
        b, cf, l = a.shape
        a = a.reshape(b, cf // f, f, l)
        bpart = bpart.reshape(b, cf // f, f, l)
        return self.decode(a, bpart, length=length)
