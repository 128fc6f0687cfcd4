"""Datasets + loader.

TPU-native rebuild of dataset/dataloader.py:

  MusicDataset   — corpus scan + cumsum windowing with aug_shift jitter
                   (reference dataloader.py:40-93), yielding raw audio chunks
                   + sidecar-JSON metadata. Unlike the reference, it does NOT
                   run the codec inside the loader (dataloader.py:108-113 runs
                   an Encodec forward per item in the worker — SURVEY §3.2
                   flags this as a main avoidable cost); encoding happens
                   on-device in batches (preprocess.py) or ahead of time.
  LatentDataset  — precomputed .npy latents + .json metadata (the production
                   path: offline wav->latent preprocessing).
  make_dataloader— shuffling/batching iterator with background thread
                   prefetch and drop_last (torch DataLoader capability,
                   dataloader.py:162-163).

Fixes reference quirk #9 (SURVEY §2.5): __getitem__ fetches the chunk with
the *mapped* file index, not the raw item index (dataloader.py:100).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from jen1_tpu.data.audio_io import convert_audio, get_duration_sec, load_audio

AUDIO_EXTS = (".wav", ".mp3", ".flac", ".ogg", ".oga", ".aac", ".m4a", ".mp4")


class MusicDataset:
    def __init__(
        self,
        dataset_dir: str,
        sr: int = 48_000,
        channels: int = 2,
        min_duration: float = 0.0,
        max_duration: float = 300.0,
        sample_duration: float = 10.0,
        aug_shift: bool = True,
        durations_path: Optional[str] = None,
        cumsum_path: Optional[str] = None,
        audio_file_txt_path: Optional[str] = None,
        seed: int = 0,
    ):
        self.dataset_dir = dataset_dir
        self.sr = sr
        self.channels = channels
        self.min_duration = min_duration
        self.max_duration = max_duration
        self.sample_duration = sample_duration
        self.aug_shift = aug_shift
        self.audio_files_dir = os.path.join(dataset_dir, "audios")
        self.metadatas_dir = os.path.join(dataset_dir, "metadata")
        self._rng = np.random.default_rng(seed)

        if audio_file_txt_path is not None:
            with open(audio_file_txt_path) as f:
                files = [line.strip() for line in f if line.strip()]
        else:
            files = sorted(
                os.path.join(self.audio_files_dir, f)
                for f in os.listdir(self.audio_files_dir)
                if f.lower().endswith(AUDIO_EXTS)
            )

        if durations_path is not None and cumsum_path is not None:
            durations = np.load(durations_path)
            self.audio_files = files
            self.durations = list(np.asarray(durations, np.float64))
            self.cumsum = np.load(cumsum_path).astype(np.float64)
        else:
            durations = [get_duration_sec(f) for f in files]
            keep = [
                i
                for i, d in enumerate(durations)
                if self.min_duration <= d < self.max_duration
            ]
            self.audio_files = [files[i] for i in keep]
            self.durations = [durations[i] for i in keep]
            self.cumsum = np.cumsum(np.asarray(self.durations, np.float64))

    def __len__(self) -> int:
        # one sample window per sample_duration of corpus time
        return int(self.cumsum[-1] // self.sample_duration)

    def get_index_offset(self, item: int) -> Tuple[int, float]:
        """Map a window index to (file_index, offset_seconds) with optional
        +-half-window jitter (reference dataloader.py:67-82)."""
        half = self.sample_duration / 2
        shift = float(self._rng.uniform(-half, half)) if self.aug_shift else 0.0
        offset = item * self.sample_duration + shift
        midpoint = offset + half
        midpoint = min(max(midpoint, 0.0), float(self.cumsum[-1]) - 1e-6)
        index = int(np.searchsorted(self.cumsum, midpoint))
        start = float(self.cumsum[index - 1]) if index > 0 else 0.0
        end = float(self.cumsum[index])
        if offset > end - self.sample_duration:
            offset = max(start, offset - half)
        elif offset < start:
            offset = min(end - self.sample_duration, offset + half)
        offset = min(max(offset, start), max(end - self.sample_duration, start))
        return index, offset - start

    def get_song_chunk(self, index: int, offset_sec: float) -> Tuple[np.ndarray, int]:
        path = self.audio_files[index]
        audio, sr = load_audio(path)
        start = int(offset_sec * sr)
        end = start + int(self.sample_duration * sr)
        return audio[start:end], sr

    def get_metadata(self, index: int) -> Dict[str, Any]:
        song = os.path.splitext(os.path.basename(self.audio_files[index]))[0]
        path = os.path.join(self.metadatas_dir, f"{song}.json")
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {"prompt": ""}

    def __getitem__(self, item: int) -> Tuple[np.ndarray, Dict[str, Any]]:
        index, offset = self.get_index_offset(item)
        chunk, sr = self.get_song_chunk(index, offset)  # mapped index (#9 fixed)
        chunk = convert_audio(chunk, sr, self.sr, self.channels)
        want = int(self.sample_duration * self.sr)
        if chunk.shape[0] < want:  # pad tail windows
            chunk = np.pad(chunk, ((0, want - chunk.shape[0]), (0, 0)))
        return chunk[:want], self.get_metadata(index)


class LatentDataset:
    """Precomputed latents: <dir>/<name>.npy (frames, 128) [+ <name>.json]."""

    def __init__(self, latents_dir: str, metadatas_dir: Optional[str] = None):
        self.latents_dir = latents_dir
        self.metadatas_dir = metadatas_dir or latents_dir
        self.names = sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(latents_dir)
            if f.endswith(".npy")
        )
        assert self.names, f"no .npy latents in {latents_dir}"

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, item: int) -> Tuple[np.ndarray, Dict[str, Any]]:
        name = self.names[item]
        latent = np.load(os.path.join(self.latents_dir, f"{name}.npy"))
        meta_path = os.path.join(self.metadatas_dir, f"{name}.json")
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        else:
            meta = {"prompt": ""}
        return latent.astype(np.float32), meta


def train_test_split(dataset, split_ratio: float, seed: int = 0):
    """Index-level random split (reference random_split, dataloader.py:147)."""
    n = len(dataset)
    idx = np.random.default_rng(seed).permutation(n)
    n_train = int(split_ratio * n)
    return _Subset(dataset, idx[:n_train]), _Subset(dataset, idx[n_train:])


class _Subset:
    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(int(i) for i in indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, i):
        return self.dataset[self.indices[i]]


def make_dataloader(
    dataset,
    batch_size: int,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    prefetch: int = 2,
    epochs: Optional[int] = 1,
    skip_batches: int = 0,
) -> Iterator[Tuple[np.ndarray, List[Dict[str, Any]]]]:
    """Yields (stacked_array (B, ...), metadata list). Background-thread
    prefetch keeps the host loop off the accelerator's critical path.

    skip_batches fast-forwards past the first N batches WITHOUT loading their
    items (deterministic resume: the shuffle order is replayed from the same
    seed, so batch k after a resume is the batch k of the original run)."""
    rng = np.random.default_rng(seed)

    def batches():
        epoch = 0
        n_skip = skip_batches
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(dataset)) if shuffle else np.arange(len(dataset))
            for s in range(0, len(order), batch_size):
                idx = order[s : s + batch_size]
                if len(idx) < batch_size and drop_last:
                    continue
                if n_skip > 0:
                    n_skip -= 1
                    continue
                items = [dataset[int(i)] for i in idx]
                arrays = np.stack([a for a, _ in items])
                metas = [m for _, m in items]
                yield arrays, metas
            epoch += 1

    if prefetch <= 0:
        yield from batches()
        return

    q: "queue.Queue" = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def worker():
        try:
            for b in batches():
                q.put(b)
        finally:
            q.put(_SENTINEL)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        b = q.get()
        if b is _SENTINEL:
            break
        yield b
