"""Serving layer: micro-batching dispatcher + HTTP surface (jen1_tpu/serve.py).

The reference has no serving layer (SURVEY.md §1); these tests drive the
beyond-reference deployment path on the tiny config: concurrent requests
coalesce into one fixed-shape device batch, padding lanes are dropped, and
the HTTP API returns valid WAV/npy/health responses.
"""

import io
import json
import threading
import urllib.request
import wave

import numpy as np
import pytest

from jen1_tpu.api.generation import Jen1
from jen1_tpu.codec.model import EncodecConfig, EncodecModel
from jen1_tpu.config import tiny_test_config
from jen1_tpu.serve import GenerationService, serve


@pytest.fixture(scope="module")
def tiny_jen1():
    cfg = tiny_test_config()
    cfg.conditioner_config.t5_config.t5_model_name = "tiny-test"
    cfg.conditioner_config.t5_config.max_length = 6
    cfg.conditioner_config.cond_dim = 16
    ccfg = EncodecConfig(
        sample_rate=1600, channels=2, dimension=cfg.model_config.in_channels,
        n_filters=2, ratios=(5, 4, 2), n_q=4, bins=16,
    )
    return Jen1(
        ckpt_path=None, sample_rate=1600, config=cfg,
        codec=EncodecModel(ccfg),
    )


@pytest.fixture(scope="module")
def service(tiny_jen1):
    svc = GenerationService(
        tiny_jen1, max_batch=3, max_wait_ms=300.0,
        default_seconds=2.0, default_steps=3,
    )
    yield svc
    svc.close()


class TestGenerationService:
    def test_concurrent_requests_coalesce(self, service):
        """3 concurrent same-shape requests ride ONE padded device batch."""
        batches_before = service.stats["batches"]
        results = [None] * 3

        def worker(i):
            results[i] = service.submit(f"tune {i}", use_gdm=True, timeout=600)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for audio in results:
            assert audio.shape == (2, 3200)  # (ch, 2 s at 1600 Hz)
            assert np.isfinite(audio).all()
        # 3 requests, max_batch=3, 300 ms window: at most 2 batches even on a
        # slow host (the first request may launch alone before the rest queue)
        n_batches = service.stats["batches"] - batches_before
        assert 1 <= n_batches <= 2

    def test_padding_lane_dropped(self, service):
        audio = service.submit("solo", use_gdm=True, timeout=600)
        assert audio.ndim == 2 and audio.shape[0] == 2
        assert service.stats["padded_lanes"] >= 2  # 1 request in a batch of 3

    def test_error_reported_not_swallowed(self, service):
        with pytest.raises((RuntimeError, TimeoutError)):
            # seconds produces a latent shorter than the UNet can downsample
            service.submit("broken", seconds=1e-4, timeout=120)
        # dispatcher survives an erroring batch
        audio = service.submit("recovery", use_gdm=True, timeout=600)
        assert np.isfinite(audio).all()


class TestHTTP:
    @pytest.fixture(scope="class")
    def server(self, tiny_jen1):
        httpd = serve(tiny_jen1, host="127.0.0.1", port=0, max_batch=2,
                      max_wait_ms=50.0)
        httpd.service.default_seconds = 2.0
        httpd.service.default_steps = 3
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        yield f"http://127.0.0.1:{httpd.server_address[1]}"
        httpd.shutdown()
        httpd.service.close()

    def test_healthz(self, server):
        with urllib.request.urlopen(f"{server}/healthz", timeout=30) as r:
            body = json.loads(r.read())
        assert body["ok"] is True and "batches" in body

    def test_generate_wav(self, server):
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps({"prompt": "hi", "use_gdm": True}).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["Content-Type"] == "audio/wav"
            data = r.read()
        with wave.open(io.BytesIO(data)) as w:
            assert w.getnchannels() == 2
            assert w.getframerate() == 1600
            assert w.getnframes() == 3200

    def test_generate_npy(self, server):
        req = urllib.request.Request(
            f"{server}/generate",
            data=json.dumps(
                {"prompt": "hi", "use_gdm": True, "format": "npy"}
            ).encode(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            audio = np.load(io.BytesIO(r.read()))
        assert audio.shape == (2, 3200) and np.isfinite(audio).all()

    def test_bad_request(self, server):
        req = urllib.request.Request(
            f"{server}/generate", data=b'{"no_prompt": 1}', method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400

    def test_generate_long_streams_pcm(self, server, tiny_jen1):
        """Chunked long-form endpoint: s16le PCM matching the in-process
        generate_long output for the same seed."""
        body = {
            "prompt": "stream me", "total_seconds": 2.5,
            "window_seconds": 1.0, "context_seconds": 0.5,
            "steps": 2, "seed": 13,
        }
        req = urllib.request.Request(
            f"{server}/generate_long",
            data=json.dumps(body).encode(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers["X-Sample-Rate"] == "1600"
            assert r.headers["X-Channels"] == "2"
            data = r.read()
        got = np.frombuffer(data, "<i2").reshape(-1, 2)
        expected = tiny_jen1.generate_long(
            "stream me", total_seconds=2.5, window_seconds=1.0,
            context_seconds=0.5, seed=13, steps=2,
        )[0]  # (ch, T)
        exp_pcm = (np.clip(expected.T, -1, 1) * 32767.0).astype("<i2")
        assert got.shape == exp_pcm.shape == (int(2.5 * 1600), 2)
        np.testing.assert_array_equal(got, exp_pcm)

    def test_generate_long_bad_request(self, server):
        req = urllib.request.Request(
            f"{server}/generate_long", data=b'{"prompt": "x"}', method="POST"
        )
        with pytest.raises(urllib.error.HTTPError) as exc_info:
            urllib.request.urlopen(req, timeout=30)
        assert exc_info.value.code == 400  # total_seconds missing
