"""Factories, normalizer, composer preset, profiling helpers."""

import numpy as np
import jax.numpy as jnp
import pytest

from jen1_tpu.config import Config, composer_config, tiny_test_config
from jen1_tpu.models.normalizer import Normalizer
from jen1_tpu.utils.factories import (
    closest_power_2,
    create_diffusion,
    create_model,
    create_model_and_diffusion,
    default,
    exists,
)
from jen1_tpu.utils.profiling import StepTimer


class TestFactories:
    def test_helpers(self):
        assert exists(0) and not exists(None)
        assert default(None, 5) == 5
        assert default(3, 5) == 3
        assert default(None, lambda: 7) == 7
        assert closest_power_2(600) == 512
        assert closest_power_2(1500) == 1024

    def test_create_model_and_diffusion(self):
        cfg = tiny_test_config()
        model, diffusion = create_model_and_diffusion(cfg)
        assert model.in_channels == 8
        assert diffusion.num_timesteps == 8

    def test_create_vdm(self):
        cfg = tiny_test_config()
        cfg.diffusion_type = "vdm"
        d = create_diffusion(cfg)
        from jen1_tpu.diffusion.vdm import VDM

        assert isinstance(d, VDM)

    def test_composer_preset(self):
        cfg = composer_config(n_tracks=4)
        assert cfg.model_config.in_channels == 512
        assert cfg.model_config.context_channels == (516,)
        model = create_model(cfg)
        assert model.in_channels == 512


class TestNormalizer:
    def test_fit_and_roundtrip(self):
        rng = np.random.default_rng(0)
        batches = [rng.normal(3.0, 2.5, (2, 20, 4)).astype(np.float32)
                   for _ in range(5)]
        norm = Normalizer.fit(batches)
        z = norm(jnp.asarray(batches[0]))
        assert abs(float(z.mean())) < 0.2
        assert 0.8 < float(z.std()) < 1.2
        back = norm.inverse(z)
        np.testing.assert_allclose(np.asarray(back), batches[0], rtol=1e-4, atol=1e-3)

    def test_save_load(self, tmp_path):
        norm = Normalizer.fit([np.ones((1, 4, 3), np.float32) * 2.0])
        p = str(tmp_path / "norm.npz")
        norm.save(p)
        loaded = Normalizer.load(p)
        np.testing.assert_allclose(np.asarray(loaded.mean), np.asarray(norm.mean))

    def test_unfitted_raises(self):
        with pytest.raises(AssertionError):
            Normalizer()(jnp.ones((1, 2, 3)))


class TestProfiling:
    def test_step_timer(self):
        timer = StepTimer(warmup=1)
        import time

        for _ in range(4):
            with timer:
                time.sleep(0.01)
        stats = timer.stats()
        assert stats["steps"] == 3
        assert stats["mean_s"] >= 0.01


class TestMetricLogger:
    def test_scalars_histograms_images_audio(self, tmp_path):
        """Full summarize-parity surface (reference utils/logger.py:24-36):
        scalars + histograms + images + audio land in JSONL/TensorBoard."""
        import json
        import os

        from jen1_tpu.utils.logger import MetricLogger

        ml = MetricLogger(str(tmp_path))
        ml.log(1, {"loss/train": 0.5, "lr": 3e-5})
        ml.log_histograms(1, {"params/w": np.random.default_rng(0).normal(size=64)})
        ml.log_images(1, {"latent/spec": np.zeros((3, 8, 8), np.float32)})
        ml.log_audio(1, "sample", np.zeros((1, 160), np.float32), 1600)
        ml.log_vectors({"loss/per_timestep": [0.9, 0.5, 0.3]})
        ml.close()

        with open(tmp_path / "metrics.jsonl") as f:
            rec = json.loads(f.readline())
        assert rec["step"] == 1 and rec["loss/train"] == 0.5
        if ml._tb is not None:  # tensorboard installed: event file written
            assert any(n.startswith("events.") for n in os.listdir(tmp_path))
