"""Data pipeline tests with a synthetic on-disk corpus."""

import json
import os

import numpy as np
import pytest

from jen1_tpu.data.audio_io import (
    convert_audio,
    get_duration_sec,
    read_wav,
    write_wav,
)
from jen1_tpu.data.dataset import (
    LatentDataset,
    MusicDataset,
    make_dataloader,
    train_test_split,
)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    audio_dir = root / "audios"
    meta_dir = root / "metadata"
    audio_dir.mkdir()
    meta_dir.mkdir()
    sr = 1600
    rng = np.random.default_rng(0)
    for i, dur in enumerate([4.0, 6.0, 3.0]):
        t = np.arange(int(dur * sr)) / sr
        wave_data = np.stack(
            [np.sin(2 * np.pi * (220 + 110 * i) * t), np.cos(2 * np.pi * 220 * t)],
            axis=1,
        ) * 0.5
        write_wav(str(audio_dir / f"song{i}.wav"), wave_data.astype(np.float32), sr)
        with open(meta_dir / f"song{i}.json", "w") as f:
            json.dump({"prompt": f"song number {i}"}, f)
    return str(root), sr


class TestAudioIO:
    def test_wav_roundtrip(self, tmp_path):
        sr = 8000
        audio = np.random.default_rng(0).uniform(-0.9, 0.9, (sr, 2)).astype(np.float32)
        path = str(tmp_path / "x.wav")
        write_wav(path, audio, sr)
        back, sr2 = read_wav(path)
        assert sr2 == sr
        np.testing.assert_allclose(back, audio, atol=1e-4)  # 16-bit quantization

    def test_partial_read(self, tmp_path):
        sr = 8000
        audio = np.linspace(-0.5, 0.5, sr)[:, None].astype(np.float32)
        path = str(tmp_path / "x.wav")
        write_wav(path, audio, sr)
        chunk, _ = read_wav(path, start_frame=100, num_frames=50)
        assert chunk.shape == (50, 1)
        np.testing.assert_allclose(chunk[:, 0], audio[100:150, 0], atol=1e-4)

    def test_duration_probe(self, tmp_path):
        write_wav(str(tmp_path / "d.wav"), np.zeros((4800, 2), np.float32), 1600)
        assert get_duration_sec(str(tmp_path / "d.wav")) == pytest.approx(3.0)

    def test_convert_audio(self):
        mono = np.ones((100, 1), np.float32)
        stereo = convert_audio(mono, 1000, 2000, 2)
        assert stereo.shape == (200, 2)
        down = convert_audio(stereo, 2000, 1000, 1)
        assert down.shape == (100, 1)


class TestMusicDataset:
    def test_windowing(self, corpus):
        root, sr = corpus
        ds = MusicDataset(root, sr=sr, channels=2, sample_duration=2.0,
                          aug_shift=True)
        assert len(ds) == int(13.0 // 2.0)
        chunk, meta = ds[0]
        assert chunk.shape == (int(2.0 * sr), 2)
        assert meta["prompt"].startswith("song number")

    def test_all_windows_valid(self, corpus):
        root, sr = corpus
        ds = MusicDataset(root, sr=sr, channels=2, sample_duration=2.0,
                          aug_shift=True)
        for i in range(len(ds)):
            chunk, meta = ds[i]
            assert chunk.shape == (int(2.0 * sr), 2)

    def test_duration_filter(self, corpus):
        root, sr = corpus
        ds = MusicDataset(root, sr=sr, channels=2, min_duration=3.5,
                          max_duration=100.0, sample_duration=2.0)
        assert len(ds.audio_files) == 2  # 3.0 s file filtered out

    def test_split_and_loader(self, corpus):
        root, sr = corpus
        ds = MusicDataset(root, sr=sr, channels=2, sample_duration=2.0)
        train, val = train_test_split(ds, 0.5)
        assert len(train) + len(val) == len(ds)
        batches = list(make_dataloader(train, batch_size=2, epochs=1, prefetch=0))
        for arr, metas in batches:
            assert arr.shape[0] == 2  # drop_last
            assert len(metas) == 2


class TestLatentDataset:
    def test_roundtrip(self, tmp_path):
        d = tmp_path / "latents"
        d.mkdir()
        for i in range(4):
            np.save(str(d / f"w{i}.npy"), np.full((30, 8), float(i), np.float32))
            with open(d / f"w{i}.json", "w") as f:
                json.dump({"prompt": f"p{i}"}, f)
        ds = LatentDataset(str(d))
        assert len(ds) == 4
        lat, meta = ds[2]
        assert lat.shape == (30, 8)
        assert meta["prompt"] == "p2"

    def test_loader_prefetch_thread(self, tmp_path):
        d = tmp_path / "lat2"
        d.mkdir()
        for i in range(6):
            np.save(str(d / f"w{i}.npy"), np.zeros((10, 4), np.float32))
        ds = LatentDataset(str(d))
        out = list(make_dataloader(ds, batch_size=3, epochs=2, prefetch=2))
        assert len(out) == 4  # 2 epochs x 2 batches


class TestNativeIO:
    def test_native_matches_stdlib(self, tmp_path):
        from jen1_tpu.data import native_io

        if not native_io.available():
            import pytest

            pytest.skip("no C++ toolchain")
        sr = 8000
        audio = np.random.default_rng(5).uniform(-0.9, 0.9, (sr, 2)).astype(np.float32)
        path = str(tmp_path / "n.wav")
        write_wav(path, audio, sr)
        ref, sr_ref = read_wav(path)
        out, sr_out = native_io.wav_read(path)
        assert sr_out == sr_ref
        np.testing.assert_allclose(out, ref, atol=1e-6)
        # partial + past-EOF zero fill
        part, _ = native_io.wav_read(path, start_frame=sr - 10, num_frames=20)
        assert part.shape == (20, 2)
        np.testing.assert_allclose(part[:10], ref[-10:], atol=1e-6)
        np.testing.assert_array_equal(part[10:], 0)

    def test_native_info_and_batch(self, tmp_path):
        from jen1_tpu.data import native_io

        if not native_io.available():
            import pytest

            pytest.skip("no C++ toolchain")
        sr = 4000
        paths = []
        for i in range(3):
            a = np.full((sr, 2), 0.1 * (i + 1), np.float32)
            p = str(tmp_path / f"b{i}.wav")
            write_wav(p, a, sr)
            paths.append(p)
        got_sr, ch, frames = native_io.wav_info(paths[0])
        assert (got_sr, ch, frames) == (sr, 2, sr)
        batch = native_io.wav_read_batch(paths, [0, 100, 200], 256, 2)
        assert batch.shape == (3, 256, 2)
        for i in range(3):
            np.testing.assert_allclose(batch[i], 0.1 * (i + 1), atol=1e-3)
