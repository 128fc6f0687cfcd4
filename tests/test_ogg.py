"""Native Ogg/Vorbis ingestion (native/oggio.cpp over the system
libvorbisfile).

Closes the last compressed-corpus capability delta vs the torch reference,
which ingests ogg through torchaudio (reference dataset/dataloader.py:41,86),
absent in this image. Fixtures are self-generated with the system
libvorbisenc/libvorbis/libogg via ctypes (the mp3/FLAC suites'
self-generated-fixture pattern), so the tests exercise a REAL third-party
encoder's bitstream, not our own writer.

Vorbis is lossy: assertions are correlation against the source signal plus
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
    not native_io.ogg_available(),
    reason="native oggio not built or libvorbisfile absent",
)


class OggPage(ctypes.Structure):
    _fields_ = [
        ("header", ctypes.POINTER(ctypes.c_ubyte)),
        ("header_len", ctypes.c_long),
        ("body", ctypes.POINTER(ctypes.c_ubyte)),
        ("body_len", ctypes.c_long),
    ]


class OggPacket(ctypes.Structure):
    _fields_ = [
        ("packet", ctypes.POINTER(ctypes.c_ubyte)),
        ("bytes", ctypes.c_long),
        ("b_o_s", ctypes.c_long),
        ("e_o_s", ctypes.c_long),
        ("granulepos", ctypes.c_int64),
        ("packetno", ctypes.c_int64),
    ]


def _libs():
    """(libvorbis, libvorbisenc, libogg) or skip. All struct-typed args are
    passed as oversized opaque buffers (create_string_buffer): the encoder
    owns their contents; only ogg_page/ogg_packet fields are read here, and
    those layouts are ABI-frozen since libogg 1.0."""
    out = []
    for names in (("libvorbis.so.0", "libvorbis.so"),
                  ("libvorbisenc.so.2", "libvorbisenc.so"),
                  ("libogg.so.0", "libogg.so")):
        lib = None
        for n in names:
            try:
                lib = ctypes.CDLL(n)
                break
            except OSError:
                pass
        if lib is None:
            pytest.skip(f"{names[0]} not available to build fixtures")
        out.append(lib)
    return out


def encode_ogg(path: str, audio: np.ndarray, sr: int, quality: float = 0.6):
    """audio: (T, ch) float32 in [-1, 1] -> VBR Ogg/Vorbis (the canonical
    libvorbis encoder_example.c sequence)."""
    vorbis, venc, ogg = _libs()
    t, ch = audio.shape

    vi = ctypes.create_string_buffer(512)     # vorbis_info (~56 B real)
    vc = ctypes.create_string_buffer(256)     # vorbis_comment (~32 B real)
    vd = ctypes.create_string_buffer(4096)    # vorbis_dsp_state
    vb = ctypes.create_string_buffer(4096)    # vorbis_block
    os_ = ctypes.create_string_buffer(8192)   # ogg_stream_state (~408 B real)
    og = OggPage()
    op = OggPacket()
    hdr, hdr_comm, hdr_code = OggPacket(), OggPacket(), OggPacket()

    venc.vorbis_encode_init_vbr.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_float]
    vorbis.vorbis_analysis_buffer.restype = ctypes.POINTER(
        ctypes.POINTER(ctypes.c_float))

    vorbis.vorbis_info_init(vi)
    assert venc.vorbis_encode_init_vbr(vi, ch, sr,
                                       ctypes.c_float(quality)) == 0
    vorbis.vorbis_comment_init(vc)
    assert vorbis.vorbis_analysis_init(vd, vi) == 0
    assert vorbis.vorbis_block_init(vd, vb) == 0
    assert ogg.ogg_stream_init(os_, 17) == 0

    chunks = []

    def pump(flush):
        fn = ogg.ogg_stream_flush if flush else ogg.ogg_stream_pageout
        while fn(os_, ctypes.byref(og)) > 0:
            chunks.append(ctypes.string_at(og.header, og.header_len))
            chunks.append(ctypes.string_at(og.body, og.body_len))

    assert vorbis.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(hdr), ctypes.byref(hdr_comm),
        ctypes.byref(hdr_code)) == 0
    for h in (hdr, hdr_comm, hdr_code):
        ogg.ogg_stream_packetin(os_, ctypes.byref(h))
    pump(flush=True)  # audio data must start on a fresh page

    pos = 0
    block = 1024
    while True:
        n = min(block, t - pos)
        if n > 0:
            buf = vorbis.vorbis_analysis_buffer(vd, block)
            for c in range(ch):
                col = np.ascontiguousarray(audio[pos:pos + n, c], np.float32)
                ctypes.memmove(buf[c], col.ctypes.data, 4 * n)
            pos += n
        assert vorbis.vorbis_analysis_wrote(vd, n) == 0  # n==0 marks EOS
        while vorbis.vorbis_analysis_blockout(vd, vb) == 1:
            assert vorbis.vorbis_analysis(vb, None) == 0
            assert vorbis.vorbis_bitrate_addblock(vb) == 0
            while vorbis.vorbis_bitrate_flushpacket(
                    vd, ctypes.byref(op)) == 1:
                ogg.ogg_stream_packetin(os_, ctypes.byref(op))
                pump(flush=False)
        if n == 0:
            break
    pump(flush=True)

    ogg.ogg_stream_clear(os_)
    vorbis.vorbis_block_clear(vb)
    vorbis.vorbis_dsp_clear(vd)
    vorbis.vorbis_comment_clear(vc)
    vorbis.vorbis_info_clear(vi)
    with open(path, "wb") as f:
        f.write(b"".join(chunks))


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
    p = str(tmp_path / "t.ogg")
    encode_ogg(p, src, sr)

    out, got_sr = native_io.ogg_read(p)
    assert got_sr == sr
    assert out.shape[1] == ch
    # Vorbis granulepos is sample-exact: decoded length == source length
    assert out.shape[0] == src.shape[0]
    a = out[:, 0].astype(np.float64)
    b = src[:, 0].astype(np.float64)
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
    assert corr > 0.97, f"decoded/source correlation {corr}"
    assert np.isfinite(out).all() and np.abs(out).max() < 1.5


def test_info_and_duration(tmp_path):
    sr = 32000
    src = tone(t=2 * sr, ch=2, sr=sr)
    p = str(tmp_path / "d.ogg")
    encode_ogg(p, src, sr)
    got_sr, got_ch, frames = native_io.ogg_info(p)
    assert (got_sr, got_ch) == (sr, 2)
    assert frames == 2 * sr
    assert abs(get_duration_sec(p) - 2.0) < 1e-6


def test_seek_is_sample_accurate(tmp_path):
    """A windowed read must equal the same slice of the full decode — the
    dataloader's random-window path depends on this."""
    sr = 44100
    src = tone(t=sr, ch=2, sr=sr, seed=3)
    p = str(tmp_path / "s.ogg")
    encode_ogg(p, src, sr)
    full, _ = native_io.ogg_read(p)
    start, num = 10007, 4096
    win, _ = native_io.ogg_read(p, start, num)
    assert win.shape == (num, 2)
    np.testing.assert_allclose(win, full[start:start + num], atol=1e-6)


def test_read_past_eof_zero_pads(tmp_path):
    sr = 44100
    src = tone(t=8192, ch=2, sr=sr)
    p = str(tmp_path / "z.ogg")
    encode_ogg(p, src, sr)
    _, _, frames = native_io.ogg_info(p)
    out, _ = native_io.ogg_read(p, frames - 100, 400)
    assert out.shape == (400, 2)
    assert np.abs(out[-100:]).max() == 0.0  # tail zero-padded
    assert np.abs(out[:100]).max() > 0.0


def test_load_audio_dispatches_ogg(tmp_path):
    sr = 44100
    src = tone(t=8192, ch=2, sr=sr)
    p = str(tmp_path / "l.ogg")
    encode_ogg(p, src, sr)
    out, got_sr = load_audio(p, start_frame=128, num_frames=1024)
    assert got_sr == sr and out.shape == (1024, 2)
    full, _ = native_io.ogg_read(p)
    np.testing.assert_allclose(out, full[128:128 + 1024], atol=1e-6)


def test_preprocess_scan_accepts_ogg(tmp_path):
    """ogg file -> dataset scan path (the jen1-preprocess entry ingests it
    without soundfile/torchaudio)."""
    sr = 44100
    for i in range(2):
        encode_ogg(str(tmp_path / f"c{i}.ogg"), tone(t=sr // 2, sr=sr), sr)
    durs = [get_duration_sec(str(tmp_path / f"c{i}.ogg")) for i in range(2)]
    assert all(abs(d - 0.5) < 1e-6 for d in durs)
