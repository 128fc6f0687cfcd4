"""ctypes bindings for the native audio decoders (native/wavio.cpp,
native/flacio.cpp).

Builds the shared libraries on first use (g++ is in the image; pybind11 is
not, so the ABI is plain C via ctypes). Falls back gracefully when no
compiler is available — data/audio_io.py keeps the pure-Python path for WAV
(FLAC has no pure-Python path; soundfile/torchaudio remain the fallback
when importable).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "wavio.cpp")
_LIB_DIR = os.path.join(_REPO_ROOT, "native", "build")
_LIB = os.path.join(_LIB_DIR, "libjen1wavio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _build() -> bool:
    os.makedirs(_LIB_DIR, exist_ok=True)
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            if not _build():
                _failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _failed = True
            return None
        lib.jen1_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.jen1_wav_info.restype = ctypes.c_int
        lib.jen1_wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.jen1_wav_read.restype = ctypes.c_int64
        lib.jen1_wav_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.jen1_wav_read_batch.restype = ctypes.c_int64
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def wav_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, num_frames); raises on failure."""
    lib = get_lib()
    assert lib is not None, "native wavio unavailable"
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.jen1_wav_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(frames))
    if rc != 0:
        raise IOError(f"jen1_wav_info({path}) failed: {rc}")
    return sr.value, ch.value, frames.value


def wav_read(
    path: str, start_frame: int = 0, num_frames: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Decode to (frames, channels) float32; zero-padded past EOF."""
    lib = get_lib()
    assert lib is not None, "native wavio unavailable"
    sr, ch, total = wav_info(path)
    if num_frames is None:
        num_frames = max(total - start_frame, 0)
    out = np.empty((num_frames, ch), np.float32)
    rc = lib.jen1_wav_read(
        path.encode(),
        ctypes.c_int64(start_frame),
        ctypes.c_int64(num_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise IOError(f"jen1_wav_read({path}) failed: {rc}")
    return out, sr


_FLAC_SRC = os.path.join(_REPO_ROOT, "native", "flacio.cpp")
_FLAC_LIB = os.path.join(_LIB_DIR, "libjen1flacio.so")
_flac_lib: Optional[ctypes.CDLL] = None
_flac_failed = False


def get_flac_lib() -> Optional[ctypes.CDLL]:
    global _flac_lib, _flac_failed
    with _lock:
        if _flac_lib is not None or _flac_failed:
            return _flac_lib
        if not os.path.exists(_FLAC_LIB) or os.path.getmtime(
            _FLAC_LIB
        ) < os.path.getmtime(_FLAC_SRC):
            os.makedirs(_LIB_DIR, exist_ok=True)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _FLAC_LIB,
                     _FLAC_SRC],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                _flac_failed = True
                return None
        try:
            lib = ctypes.CDLL(_FLAC_LIB)
        except OSError:
            _flac_failed = True
            return None
        lib.jen1_flac_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.jen1_flac_info.restype = ctypes.c_int
        lib.jen1_flac_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.jen1_flac_read.restype = ctypes.c_int64
        _flac_lib = lib
        return _flac_lib


def flac_available() -> bool:
    return get_flac_lib() is not None


def flac_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, num_frames); raises on failure."""
    lib = get_flac_lib()
    assert lib is not None, "native flacio unavailable"
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.jen1_flac_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                            ctypes.byref(frames))
    if rc != 0:
        raise IOError(f"jen1_flac_info({path}) failed: {rc}")
    return sr.value, ch.value, frames.value


def flac_read(
    path: str, start_frame: int = 0, num_frames: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Decode to (frames, channels) float32; zero-padded past EOF."""
    lib = get_flac_lib()
    assert lib is not None, "native flacio unavailable"
    sr, ch, total = flac_info(path)
    if num_frames is None:
        num_frames = max(total - start_frame, 0)
    out = np.empty((num_frames, ch), np.float32)
    rc = lib.jen1_flac_read(
        path.encode(),
        ctypes.c_int64(start_frame),
        ctypes.c_int64(num_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise IOError(f"jen1_flac_read({path}) failed: {rc}")
    return out, sr


_MP3_SRC = os.path.join(_REPO_ROOT, "native", "mp3io.cpp")
_MP3_LIB = os.path.join(_LIB_DIR, "libjen1mp3io.so")
_mp3_lib: Optional[ctypes.CDLL] = None
_mp3_failed = False


def get_mp3_lib() -> Optional[ctypes.CDLL]:
    """mp3io shim: decodes through the system libmpg123 (dlopen'ed at
    runtime by native/mp3io.cpp — no dev headers or link-time dep). Returns
    None when g++ or libmpg123 is unavailable."""
    global _mp3_lib, _mp3_failed
    with _lock:
        if _mp3_lib is not None or _mp3_failed:
            return _mp3_lib
        if not os.path.exists(_MP3_LIB) or os.path.getmtime(
            _MP3_LIB
        ) < os.path.getmtime(_MP3_SRC):
            os.makedirs(_LIB_DIR, exist_ok=True)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _MP3_LIB,
                     _MP3_SRC, "-ldl"],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                _mp3_failed = True
                return None
        try:
            lib = ctypes.CDLL(_MP3_LIB)
        except OSError:
            _mp3_failed = True
            return None
        lib.jen1_mp3_available.argtypes = []
        lib.jen1_mp3_available.restype = ctypes.c_int
        lib.jen1_mp3_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.jen1_mp3_info.restype = ctypes.c_int
        lib.jen1_mp3_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.jen1_mp3_read.restype = ctypes.c_int64
        if lib.jen1_mp3_available() != 1:  # libmpg123 missing at runtime
            _mp3_failed = True
            return None
        _mp3_lib = lib
        return _mp3_lib


def mp3_available() -> bool:
    return get_mp3_lib() is not None


def mp3_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, num_frames); raises on failure."""
    lib = get_mp3_lib()
    assert lib is not None, "native mp3io unavailable"
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.jen1_mp3_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(frames))
    if rc != 0:
        raise IOError(f"jen1_mp3_info({path}) failed: {rc}")
    return sr.value, ch.value, frames.value


def mp3_read(
    path: str, start_frame: int = 0, num_frames: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Decode to (frames, channels) float32; zero-padded past EOF.
    Sample-accurate seeks via mpg123's scanned frame index."""
    lib = get_mp3_lib()
    assert lib is not None, "native mp3io unavailable"
    sr, ch, total = mp3_info(path)
    if num_frames is None:
        num_frames = max(total - start_frame, 0)
    out = np.empty((num_frames, ch), np.float32)
    rc = lib.jen1_mp3_read(
        path.encode(),
        ctypes.c_int64(start_frame),
        ctypes.c_int64(num_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise IOError(f"jen1_mp3_read({path}) failed: {rc}")
    return out, sr


_OGG_SRC = os.path.join(_REPO_ROOT, "native", "oggio.cpp")
_OGG_LIB = os.path.join(_LIB_DIR, "libjen1oggio.so")
_ogg_lib: Optional[ctypes.CDLL] = None
_ogg_failed = False


def get_ogg_lib() -> Optional[ctypes.CDLL]:
    """oggio shim: decodes through the system libvorbisfile (dlopen'ed at
    runtime by native/oggio.cpp — no dev headers or link-time dep). Returns
    None when g++ or libvorbisfile is unavailable."""
    global _ogg_lib, _ogg_failed
    with _lock:
        if _ogg_lib is not None or _ogg_failed:
            return _ogg_lib
        if not os.path.exists(_OGG_LIB) or os.path.getmtime(
            _OGG_LIB
        ) < os.path.getmtime(_OGG_SRC):
            os.makedirs(_LIB_DIR, exist_ok=True)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _OGG_LIB,
                     _OGG_SRC, "-ldl"],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                _ogg_failed = True
                return None
        try:
            lib = ctypes.CDLL(_OGG_LIB)
        except OSError:
            _ogg_failed = True
            return None
        lib.jen1_ogg_available.argtypes = []
        lib.jen1_ogg_available.restype = ctypes.c_int
        lib.jen1_ogg_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.jen1_ogg_info.restype = ctypes.c_int
        lib.jen1_ogg_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.jen1_ogg_read.restype = ctypes.c_int64
        if lib.jen1_ogg_available() != 1:  # libvorbisfile missing at runtime
            _ogg_failed = True
            return None
        _ogg_lib = lib
        return _ogg_lib


def ogg_available() -> bool:
    return get_ogg_lib() is not None


def ogg_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, num_frames); raises on failure."""
    lib = get_ogg_lib()
    assert lib is not None, "native oggio unavailable"
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.jen1_ogg_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(frames))
    if rc != 0:
        raise IOError(f"jen1_ogg_info({path}) failed: {rc}")
    return sr.value, ch.value, frames.value


def ogg_read(
    path: str, start_frame: int = 0, num_frames: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Decode to (frames, channels) float32; zero-padded past EOF.
    Sample-accurate seeks via the Ogg page granule positions."""
    lib = get_ogg_lib()
    assert lib is not None, "native oggio unavailable"
    sr, ch, total = ogg_info(path)
    if num_frames is None:
        num_frames = max(total - start_frame, 0)
    out = np.empty((num_frames, ch), np.float32)
    rc = lib.jen1_ogg_read(
        path.encode(),
        ctypes.c_int64(start_frame),
        ctypes.c_int64(num_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise IOError(f"jen1_ogg_read({path}) failed: {rc}")
    return out, sr


def wav_read_batch(
    paths: Sequence[str], starts: Sequence[int], frames: int, channels: int
) -> np.ndarray:
    """One FFI call decodes a whole (B, frames, channels) training batch."""
    lib = get_lib()
    assert lib is not None, "native wavio unavailable"
    b = len(paths)
    out = np.empty((b, frames, channels), np.float32)
    c_paths = (ctypes.c_char_p * b)(*[p.encode() for p in paths])
    c_starts = (ctypes.c_int64 * b)(*[int(s) for s in starts])
    rc = lib.jen1_wav_read_batch(
        c_paths,
        c_starts,
        ctypes.c_int64(frames),
        ctypes.c_int32(channels),
        ctypes.c_int64(b),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"jen1_wav_read_batch failed: {rc}")
    return out


_AAC_SRC = os.path.join(_REPO_ROOT, "native", "aacio.cpp")
_AAC_LIB = os.path.join(_LIB_DIR, "libjen1aacio.so")
_aac_lib: Optional[ctypes.CDLL] = None
_aac_failed = False


def get_aac_lib() -> Optional[ctypes.CDLL]:
    """aacio shim: AAC/M4A (and anything libavformat demuxes) through the
    system FFmpeg libraries. Unlike mp3io/oggio this links libavformat/
    libavcodec/libavutil directly (their struct-heavy API needs the real
    headers, which this image ships); absent libs make the build or the
    CDLL load fail and callers fall back gracefully."""
    global _aac_lib, _aac_failed
    with _lock:
        if _aac_lib is not None or _aac_failed:
            return _aac_lib
        if not os.path.exists(_AAC_LIB) or os.path.getmtime(
            _AAC_LIB
        ) < os.path.getmtime(_AAC_SRC):
            os.makedirs(_LIB_DIR, exist_ok=True)
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-o", _AAC_LIB,
                     _AAC_SRC, "-lavformat", "-lavcodec", "-lavutil"],
                    check=True,
                    capture_output=True,
                )
            except Exception:
                _aac_failed = True
                return None
        try:
            lib = ctypes.CDLL(_AAC_LIB)
        except OSError:
            _aac_failed = True
            return None
        lib.jen1_aac_available.argtypes = []
        lib.jen1_aac_available.restype = ctypes.c_int
        lib.jen1_aac_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.jen1_aac_info.restype = ctypes.c_int
        lib.jen1_aac_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.jen1_aac_read.restype = ctypes.c_int64
        lib.jen1_aac_write_fixture.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.jen1_aac_write_fixture.restype = ctypes.c_int
        if lib.jen1_aac_available() != 1:
            _aac_failed = True
            return None
        _aac_lib = lib
        return _aac_lib


def aac_available() -> bool:
    return get_aac_lib() is not None


def aac_info(path: str) -> Tuple[int, int, int]:
    """(sample_rate, channels, num_frames); frames is an EXACT decode count
    (container duration metadata is unreliable for ADTS). Raises on
    failure."""
    lib = get_aac_lib()
    assert lib is not None, "native aacio unavailable"
    sr = ctypes.c_int32()
    ch = ctypes.c_int32()
    frames = ctypes.c_int64()
    rc = lib.jen1_aac_info(path.encode(), ctypes.byref(sr), ctypes.byref(ch),
                           ctypes.byref(frames))
    if rc != 0:
        raise IOError(f"jen1_aac_info({path}) failed: {rc}")
    return sr.value, ch.value, frames.value


def aac_read(
    path: str, start_frame: int = 0, num_frames: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Decode to (frames, channels) float32; zero-padded past EOF. Windows
    are sample-exact (sequential decode + skip; AAC containers have no
    reliable sample-accurate seek index)."""
    lib = get_aac_lib()
    assert lib is not None, "native aacio unavailable"
    sr, ch, total = aac_info(path)
    if num_frames is None:
        num_frames = max(total - start_frame, 0)
    out = np.empty((num_frames, ch), np.float32)
    rc = lib.jen1_aac_read(
        path.encode(),
        ctypes.c_int64(start_frame),
        ctypes.c_int64(num_frames),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc < 0:
        raise IOError(f"jen1_aac_read({path}) failed: {rc}")
    return out, sr


def aac_write_fixture(path: str, audio: np.ndarray, sr: int,
                      bitrate: int = 192_000) -> None:
    """Encode (frames, ch) float32 via FFmpeg's AAC encoder (.m4a/.mp4
    boxes or raw ADTS .aac by extension). Test-fixture helper only."""
    lib = get_aac_lib()
    assert lib is not None, "native aacio unavailable"
    audio = np.ascontiguousarray(audio, np.float32)
    rc = lib.jen1_aac_write_fixture(
        path.encode(),
        audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(audio.shape[0]),
        ctypes.c_int32(audio.shape[1]),
        ctypes.c_int32(sr),
        ctypes.c_int32(bitrate),
    )
    if rc != 0:
        raise IOError(f"jen1_aac_write_fixture({path}) failed: {rc}")
