"""Native MP3 ingestion (native/mp3io.cpp over the system libmpg123).

Closes VERDICT r3 missing #2 / next-#7: the torch reference ingests mp3
through torchaudio (reference dataset/dataloader.py:41,86), absent in this
image. Fixtures are self-generated with the system libmp3lame via ctypes
(the FLAC suite's self-generated-fixture pattern), so the tests exercise a
REAL third-party encoder's bitstream, not our own writer.

MP3 is lossy: assertions are correlation/SNR against the source signal plus
sample-accurate seek self-consistency, not exact equality.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np
import pytest

from jen1_tpu.data import native_io
from jen1_tpu.data.audio_io import get_duration_sec, load_audio

pytestmark = pytest.mark.skipif(
    not native_io.mp3_available(),
    reason="native mp3io not built or libmpg123 absent",
)


def _lame():
    for name in ("libmp3lame.so.0", "libmp3lame.so"):
        try:
            lib = ctypes.CDLL(name)
            break
        except OSError:
            lib = None
    if lib is None:
        pytest.skip("libmp3lame not available to build fixtures")
    lib.lame_init.restype = ctypes.c_void_p
    for f in ("lame_set_in_samplerate", "lame_set_num_channels",
              "lame_set_brate", "lame_set_quality", "lame_set_bWriteVbrTag",
              "lame_init_params", "lame_close"):
        getattr(lib, f).argtypes = [ctypes.c_void_p] + (
            [ctypes.c_int] if f.startswith("lame_set") else [])
        getattr(lib, f).restype = ctypes.c_int
    lib.lame_encode_buffer_interleaved.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_short), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.lame_encode_buffer_interleaved.restype = ctypes.c_int
    lib.lame_encode_buffer.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_short),
        ctypes.POINTER(ctypes.c_short), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.lame_encode_buffer.restype = ctypes.c_int
    lib.lame_encode_flush.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int]
    lib.lame_encode_flush.restype = ctypes.c_int
    lib.lame_get_lametag_frame.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte), ctypes.c_size_t]
    lib.lame_get_lametag_frame.restype = ctypes.c_size_t
    return lib


def encode_mp3(path: str, audio: np.ndarray, sr: int, brate: int = 192):
    """audio: (T, ch) float32 in [-1, 1] -> CBR mp3 with a LAME gapless tag
    (the tag placeholder frame is patched after flush, as the lame CLI
    does, so decoders can trim encoder delay/padding exactly)."""
    lame = _lame()
    t, ch = audio.shape
    pcm = np.clip(audio * 32767.0, -32768, 32767).astype("<i2")
    g = lame.lame_init()
    lame.lame_set_in_samplerate(g, sr)
    lame.lame_set_num_channels(g, ch)
    lame.lame_set_brate(g, brate)
    lame.lame_set_quality(g, 2)
    lame.lame_set_bWriteVbrTag(g, 1)
    assert lame.lame_init_params(g) >= 0
    buf = (ctypes.c_ubyte * (int(1.25 * t) + 7200))()
    out = bytearray()
    if ch == 2:
        n = lame.lame_encode_buffer_interleaved(
            g, pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_short)), t,
            buf, len(buf))
    else:
        mono = np.ascontiguousarray(pcm[:, 0])
        p = mono.ctypes.data_as(ctypes.POINTER(ctypes.c_short))
        n = lame.lame_encode_buffer(g, p, p, t, buf, len(buf))
    assert n >= 0, f"lame encode failed: {n}"
    out += bytes(buf[:n])
    n = lame.lame_encode_flush(g, buf, len(buf))
    assert n >= 0
    out += bytes(buf[:n])
    tag = (ctypes.c_ubyte * 8192)()
    tag_len = lame.lame_get_lametag_frame(g, tag, len(tag))
    if 0 < tag_len <= len(tag):
        out[:tag_len] = bytes(tag[:tag_len])
    lame.lame_close(g)
    with open(path, "wb") as f:
        f.write(bytes(out))


def tone(t=44100, ch=2, sr=44100, seed=0):
    x = np.arange(t) / sr
    rng = np.random.default_rng(seed)
    chans = [
        0.5 * np.sin(2 * np.pi * 440.0 * (1.0 + 0.1 * c) * x)
        + 0.05 * rng.standard_normal(t)
        for c in range(ch)
    ]
    return np.stack(chans, 1).astype(np.float32)


@pytest.mark.parametrize("ch", [1, 2])
def test_decode_matches_source(tmp_path, ch):
    sr = 44100
    src = tone(t=sr, ch=ch, sr=sr)
    p = str(tmp_path / "t.mp3")
    encode_mp3(p, src, sr)

    out, got_sr = native_io.mp3_read(p)
    assert got_sr == sr
    assert out.shape[1] == ch
    # gapless tag -> decoded length == source length (exactly, for LAME CBR)
    assert abs(out.shape[0] - src.shape[0]) <= 1152  # one MPEG granule max
    n = min(out.shape[0], src.shape[0])
    a, b = out[:n, 0].astype(np.float64), src[:n, 0].astype(np.float64)
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert corr > 0.97, f"decoded/source correlation {corr}"
    assert np.isfinite(out).all() and np.abs(out).max() < 1.5


def test_info_and_duration(tmp_path):
    sr = 32000
    src = tone(t=2 * sr, ch=2, sr=sr)
    p = str(tmp_path / "d.mp3")
    encode_mp3(p, src, sr)
    got_sr, got_ch, frames = native_io.mp3_info(p)
    assert (got_sr, got_ch) == (sr, 2)
    assert abs(frames - 2 * sr) <= 1152
    assert abs(get_duration_sec(p) - 2.0) < 0.05


def test_seek_is_sample_accurate(tmp_path):
    """A windowed read must equal the same slice of the full decode — the
    dataloader's random-window path depends on this."""
    sr = 44100
    src = tone(t=sr, ch=2, sr=sr, seed=3)
    p = str(tmp_path / "s.mp3")
    encode_mp3(p, src, sr)
    full, _ = native_io.mp3_read(p)
    start, num = 10007, 4096
    win, _ = native_io.mp3_read(p, start, num)
    assert win.shape == (num, 2)
    np.testing.assert_allclose(win, full[start:start + num], atol=1e-4)


def test_read_past_eof_zero_pads(tmp_path):
    sr = 44100
    src = tone(t=4096, ch=2, sr=sr)
    p = str(tmp_path / "z.mp3")
    encode_mp3(p, src, sr)
    _, _, frames = native_io.mp3_info(p)
    out, _ = native_io.mp3_read(p, frames - 100, 400)
    assert out.shape == (400, 2)
    assert np.abs(out[-100:]).max() == 0.0  # tail zero-padded
    assert np.abs(out[:100]).max() > 0.0


def test_load_audio_dispatches_mp3(tmp_path):
    sr = 44100
    src = tone(t=8192, ch=2, sr=sr)
    p = str(tmp_path / "l.mp3")
    encode_mp3(p, src, sr)
    out, got_sr = load_audio(p, start_frame=128, num_frames=1024)
    assert got_sr == sr and out.shape == (1024, 2)
    full, _ = native_io.mp3_read(p)
    np.testing.assert_allclose(out, full[128:128 + 1024], atol=1e-4)


def test_preprocess_scan_accepts_mp3(tmp_path):
    """mp3 file -> dataset scan path (the jen1-preprocess entry ingests it
    without soundfile/torchaudio): duration probing must work through
    get_duration_sec on a directory of mp3s."""
    sr = 44100
    for i in range(2):
        encode_mp3(str(tmp_path / f"c{i}.mp3"), tone(t=sr // 2, sr=sr), sr)
    durs = [get_duration_sec(str(tmp_path / f"c{i}.mp3")) for i in range(2)]
    assert all(abs(d - 0.5) < 0.05 for d in durs)
