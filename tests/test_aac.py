"""Native AAC/M4A ingestion (native/aacio.cpp over the system FFmpeg libs).

Closes the last L1 format delta vs the torch reference, which ingests
anything torchaudio/ffmpeg decodes (reference dataset/dataloader.py:41,86):
WAV/FLAC/MP3/Ogg already have native shims; this covers AAC in both the
MP4 (.m4a) and raw ADTS (.aac) containers.

Fixtures are encoded with FFmpeg's own AAC encoder through the shim's
fixture export — a real encoder bitstream; the unit under test is the
shim's demux/decode/window/interleave logic, not the codec. AAC is lossy
and its encoder delay is container-dependent, so source comparison is
alignment-searched correlation; windowed reads are asserted EXACTLY equal
to the full decode (the dataloader's random-window contract).
"""

from __future__ import annotations

import numpy as np
import pytest

from jen1_tpu.data import native_io
from jen1_tpu.data.audio_io import get_duration_sec, load_audio

pytestmark = pytest.mark.skipif(
    not native_io.aac_available(),
    reason="native aacio not built or FFmpeg libs absent",
)


def tone(t=44100, ch=2, sr=44100, seed=0):
    x = np.arange(t) / sr
    rng = np.random.default_rng(seed)
    chans = [
        0.5 * np.sin(2 * np.pi * 440.0 * (1.0 + 0.1 * c) * x)
        + 0.05 * rng.standard_normal(t)
        for c in range(ch)
    ]
    return np.stack(chans, 1).astype(np.float32)


def best_alignment(out: np.ndarray, src: np.ndarray, max_lag: int = 4096):
    """(corr, lag) maximizing normalized correlation of channel 0 over the
    first second — AAC encoder delay is not edit-list-trimmed by every
    demuxer, so tests align before comparing."""
    n = min(len(src), 44100)
    b = src[:n, 0].astype(np.float64)
    best = (-1.0, 0)
    for lag in range(0, max_lag, 16):
        a = out[lag:lag + n, 0].astype(np.float64)
        if len(a) < n:
            break
        c = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        if c > best[0]:
            best = (c, lag)
    # refine around the coarse peak
    for lag in range(max(0, best[1] - 16), best[1] + 16):
        a = out[lag:lag + n, 0].astype(np.float64)
        if len(a) < n:
            break
        c = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
        if c > best[0]:
            best = (c, lag)
    return best


@pytest.mark.parametrize("ext", ["m4a", "aac"])
@pytest.mark.parametrize("ch", [1, 2])
def test_decode_matches_source(tmp_path, ext, ch):
    sr = 44100
    src = tone(t=sr, ch=ch, sr=sr)
    p = str(tmp_path / f"t.{ext}")
    native_io.aac_write_fixture(p, src, sr)

    out, got_sr = native_io.aac_read(p)
    assert got_sr == sr
    assert out.shape[1] == ch
    # within source length + encoder delay/padding (a few AAC frames)
    assert abs(out.shape[0] - src.shape[0]) <= 4 * 1024
    corr, lag = best_alignment(out, src)
    assert corr > 0.97, f"decoded/source correlation {corr} at lag {lag}"
    assert np.isfinite(out).all() and np.abs(out).max() < 1.5


@pytest.mark.parametrize("ext", ["m4a", "aac"])
def test_info_and_duration(tmp_path, ext):
    sr = 32000
    src = tone(t=2 * sr, ch=2, sr=sr)
    p = str(tmp_path / f"d.{ext}")
    native_io.aac_write_fixture(p, src, sr)
    got_sr, got_ch, frames = native_io.aac_info(p)
    assert (got_sr, got_ch) == (sr, 2)
    # info decode-counts: exact up to encoder delay+padding
    assert abs(frames - 2 * sr) <= 4 * 1024
    assert abs(get_duration_sec(p) - 2.0) < 0.2


@pytest.mark.parametrize("ext", ["m4a", "aac"])
def test_windowed_read_is_sample_exact(tmp_path, ext):
    """A windowed read must equal the same slice of the full decode — the
    dataloader's random-window path depends on this."""
    sr = 44100
    src = tone(t=sr, ch=2, sr=sr, seed=3)
    p = str(tmp_path / f"s.{ext}")
    native_io.aac_write_fixture(p, src, sr)
    full, _ = native_io.aac_read(p)
    start, num = 10007, 4096
    win, _ = native_io.aac_read(p, start, num)
    assert win.shape == (num, 2)
    np.testing.assert_array_equal(win, full[start:start + num])


def test_read_past_eof_zero_pads(tmp_path):
    sr = 44100
    src = tone(t=8192, ch=2, sr=sr)
    p = str(tmp_path / "z.m4a")
    native_io.aac_write_fixture(p, src, sr)
    _, _, frames = native_io.aac_info(p)
    out, _ = native_io.aac_read(p, frames - 100, 400)
    assert out.shape == (400, 2)
    assert np.abs(out[-100:]).max() == 0.0  # tail zero-padded
    assert np.abs(out[:100]).max() > 0.0


@pytest.mark.parametrize("ext", ["m4a", "aac"])
def test_load_audio_dispatches_aac(tmp_path, ext):
    sr = 44100
    src = tone(t=8192, ch=2, sr=sr)
    p = str(tmp_path / f"l.{ext}")
    native_io.aac_write_fixture(p, src, sr)
    out, got_sr = load_audio(p, start_frame=128, num_frames=1024)
    assert got_sr == sr and out.shape == (1024, 2)
    full, _ = native_io.aac_read(p)
    np.testing.assert_array_equal(out, full[128:128 + 1024])


def test_dataset_scan_accepts_m4a(tmp_path):
    """m4a files -> MusicDataset windowing (the reference's 'anything
    torchaudio decodes' corpus contract, dataloader.py:41,86)."""
    from jen1_tpu.data.dataset import MusicDataset

    sr = 44100
    (tmp_path / "audios").mkdir()
    for i in range(2):
        native_io.aac_write_fixture(
            str(tmp_path / "audios" / f"c{i}.m4a"),
            tone(t=sr, sr=sr, seed=i), sr)
    ds = MusicDataset(
        dataset_dir=str(tmp_path), sr=sr, channels=2, min_duration=0,
        max_duration=10, sample_duration=0.25,
    )
    assert len(ds) >= 4  # ~1 s of audio per file in 0.25 s windows
    win, meta = ds[0]
    assert win.shape[0] == int(0.25 * sr) and np.isfinite(win).all()
