"""Dependency-free audio I/O.

PCM WAV via the stdlib `wave` module (16/24/32-bit int and 32-bit float),
with optional soundfile/torchaudio fallbacks when importable (mp3 etc.). The
reference leans on torchaudio (dataset/dataloader.py:41,86) which is not in
this image.
"""

from __future__ import annotations

import wave
from typing import Optional, Tuple

import numpy as np


def read_wav(
    path: str, start_frame: int = 0, num_frames: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Returns (audio (T, channels) float32 in [-1, 1], sample_rate)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_ch = w.getnchannels()
        width = w.getsampwidth()
        total = w.getnframes()
        start_frame = min(start_frame, total)
        if num_frames is None:
            num_frames = total - start_frame
        w.setpos(start_frame)
        raw = w.readframes(min(num_frames, total - start_frame))

    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        # could be int32 or float32; wave gives no format info — assume int32
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 2**23, ints - 2**24, ints)
        data = ints.astype(np.float32) / 8388608.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    return data.reshape(-1, n_ch), sr


def write_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """audio: (T, channels) float32 in [-1, 1] -> 16-bit PCM WAV."""
    audio = np.clip(np.asarray(audio, np.float32), -1.0, 1.0)
    if audio.ndim == 1:
        audio = audio[:, None]
    ints = (audio * 32767.0).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(audio.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())


def load_audio(
    path: str, start_frame: int = 0, num_frames: Optional[int] = None
) -> Tuple[np.ndarray, int]:
    """Read any supported format: WAV/FLAC/MP3/OGG via the native C++
    decoders (native/{wavio,flacio,mp3io,oggio}.cpp) when built, else
    stdlib (WAV), else soundfile/torchaudio."""
    if path.lower().endswith(".mp3"):
        try:
            from jen1_tpu.data import native_io

            if native_io.mp3_available():
                return native_io.mp3_read(path, start_frame, num_frames)
        except Exception:
            pass
    if path.lower().endswith((".ogg", ".oga")):
        try:
            from jen1_tpu.data import native_io

            if native_io.ogg_available():
                return native_io.ogg_read(path, start_frame, num_frames)
        except Exception:
            pass
    if path.lower().endswith(".flac"):
        try:
            from jen1_tpu.data import native_io

            if native_io.flac_available():
                return native_io.flac_read(path, start_frame, num_frames)
        except Exception:
            pass
    if path.lower().endswith((".aac", ".m4a", ".mp4")):
        try:
            from jen1_tpu.data import native_io

            if native_io.aac_available():
                return native_io.aac_read(path, start_frame, num_frames)
        except Exception:
            pass
    if path.lower().endswith(".wav"):
        try:
            from jen1_tpu.data import native_io

            if native_io.available():
                return native_io.wav_read(path, start_frame, num_frames)
        except Exception:
            pass
        try:
            return read_wav(path, start_frame, num_frames)
        except Exception:
            pass
    try:
        import soundfile as sf

        stop = None if num_frames is None else start_frame + num_frames
        data, sr = sf.read(path, start=start_frame, stop=stop, dtype="float32")
        if data.ndim == 1:
            data = data[:, None]
        return data, sr
    except ImportError:
        pass
    try:
        import torchaudio

        wav, sr = torchaudio.load(
            path,
            frame_offset=start_frame,
            num_frames=-1 if num_frames is None else num_frames,
        )
        return wav.numpy().T, sr
    except ImportError as e:
        raise RuntimeError(
            f"cannot decode {path}: stdlib wave failed and neither soundfile "
            "nor torchaudio is available"
        ) from e


def get_duration_sec(path: str) -> float:
    """Fast duration probe (reference: dataset/preprocess.py:5-8 loads the
    whole file; WAV/FLAC headers make this O(1), MP3 needs one index scan)."""
    if path.lower().endswith(".mp3"):
        try:
            from jen1_tpu.data import native_io

            if native_io.mp3_available():
                sr, _, frames = native_io.mp3_info(path)
                return frames / sr
        except Exception:
            pass
    if path.lower().endswith((".ogg", ".oga")):
        try:
            from jen1_tpu.data import native_io

            if native_io.ogg_available():
                sr, _, frames = native_io.ogg_info(path)
                return frames / sr
        except Exception:
            pass
    if path.lower().endswith(".flac"):
        try:
            from jen1_tpu.data import native_io

            if native_io.flac_available():
                sr, _, frames = native_io.flac_info(path)
                return frames / sr
        except Exception:
            pass
    if path.lower().endswith((".aac", ".m4a", ".mp4")):
        try:
            from jen1_tpu.data import native_io

            if native_io.aac_available():
                sr, _, frames = native_io.aac_info(path)
                return frames / sr
        except Exception:
            pass
    if path.lower().endswith(".wav"):
        try:
            from jen1_tpu.data import native_io

            if native_io.available():
                sr, _, frames = native_io.wav_info(path)
                return frames / sr
        except Exception:
            pass
        try:
            with wave.open(path, "rb") as w:
                return w.getnframes() / w.getframerate()
        except Exception:
            pass
    audio, sr = load_audio(path)
    return audio.shape[0] / sr


def convert_audio(
    audio: np.ndarray, src_sr: int, dst_sr: int, dst_channels: int
) -> np.ndarray:
    """Channel up/downmix + linear resample (encodec.utils.convert_audio
    capability; called at dataloader.py:106, generation.py:95)."""
    if audio.ndim == 1:
        audio = audio[:, None]
    t, c = audio.shape
    if c != dst_channels:
        if dst_channels == 1:
            audio = audio.mean(axis=1, keepdims=True)
        elif c == 1:
            audio = np.repeat(audio, dst_channels, axis=1)
        else:
            audio = audio[:, :dst_channels]
    if src_sr != dst_sr:
        new_t = int(round(t * dst_sr / src_sr))
        x_old = np.linspace(0.0, 1.0, t, endpoint=False)
        x_new = np.linspace(0.0, 1.0, new_t, endpoint=False)
        audio = np.stack(
            [np.interp(x_new, x_old, audio[:, ch]) for ch in range(audio.shape[1])],
            axis=1,
        )
    return audio.astype(np.float32)
