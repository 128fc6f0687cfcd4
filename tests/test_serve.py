"""Serving layer: micro-batching dispatcher + HTTP surface (jen1_tpu/serve.py).

The reference has no serving layer (SURVEY.md §1); these tests drive the
beyond-reference deployment path on the tiny config: concurrent requests
coalesce into one fixed-shape device batch, padding lanes are dropped, and
the HTTP API returns valid WAV/npy/health responses.
"""

import io
import json
import threading
import time
import urllib.request
import wave

import numpy as np
import pytest

from jen1_tpu.api.generation import Jen1
from jen1_tpu.codec.model import EncodecConfig, EncodecModel
from jen1_tpu.config import tiny_test_config
from jen1_tpu.serve import (
    GenerationService, ServiceClosed, ServiceOverloaded, serve,
)


class FakeJen1:
    """Device-free Jen1 stand-in: generate() sleeps `delay` and returns audio
    whose value encodes (seed, lane) so tests can check batching/seed
    routing without a real model."""

    sample_rate = 1600

    def __init__(self, delay: float = 0.0):
        self.delay = delay
        self.calls = []

    def generate(self, prompts, seed=-1, steps=100, batch_size=1,
                 seconds=30.0, use_gdm=False, sampler_mode="scan",
                 rng_impl="rbg", output_dtype="float32",
                 output_transport="host"):
        time.sleep(self.delay)
        self.calls.append({"prompts": list(prompts), "seed": seed,
                           "sampler_mode": sampler_mode,
                           "output_dtype": output_dtype})
        t = int(seconds * self.sample_rate)
        audio = np.zeros((batch_size, 2, t), np.float32)
        audio += float(seed)
        audio += np.arange(batch_size, dtype=np.float32)[:, None, None] / 100.0
        if output_dtype == "int16":
            audio = (np.clip(audio, -1, 1) * 32767.0).astype(np.int16)
        return audio


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
    @pytest.mark.slow
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

    def test_output_dtype_flows_to_generate(self):
        """output_dtype='int16' reaches generate() and submit returns the
        int16 audio unchanged; _wav_bytes accepts it as passthrough."""
        from jen1_tpu.serve import GenerationService, _wav_bytes

        fake = FakeJen1()
        svc = GenerationService(fake, max_batch=1, max_wait_ms=10.0,
                                default_seconds=2.0, default_steps=2,
                                output_dtype="int16")
        try:
            audio = svc.submit("pcm please", seed=0, timeout=60)
        finally:
            svc.close()
        assert audio.dtype == np.int16
        assert fake.calls[-1]["output_dtype"] == "int16"
        # int16 passthrough produces byte-identical WAV to the float path
        f = np.linspace(-1.2, 1.2, 64, dtype=np.float32).reshape(2, 32)
        ints = (np.clip(f, -1, 1) * 32767.0).astype(np.int16)
        assert _wav_bytes(ints, 1600) == _wav_bytes(f, 1600)

    def test_n_completers_parallel_fetch(self):
        """n_completers spawns that many completer threads and concurrent
        requests complete through them (r5 sweep knob; default stays 2)."""
        fake = FakeJen1(delay=0.05)
        svc = GenerationService(fake, max_batch=1, max_wait_ms=5.0,
                                n_completers=3)
        try:
            assert len(svc._completers) == 3
            results = [None] * 4

            def worker(i):
                results[i] = svc.submit(f"par {i}", seed=i, timeout=60)

            threads = [threading.Thread(target=worker, args=(i,))
                       for i in range(4)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        finally:
            svc.close()
        for r in results:
            assert r is not None and np.isfinite(r).all()

    def test_error_reported_not_swallowed(self, service):
        with pytest.raises((RuntimeError, TimeoutError)):
            # seconds produces a latent shorter than the UNet can downsample
            service.submit("broken", seconds=1e-4, timeout=120)
        # dispatcher survives an erroring batch
        audio = service.submit("recovery", use_gdm=True, timeout=600)
        assert np.isfinite(audio).all()


class TestOverloadAndSeeds:
    """VERDICT r1 weak #7 (unbounded queue) + ADVICE medium (batched seed
    semantics): load shedding, graceful drain, and explicit-seed isolation."""

    def test_burst_sheds_load_then_recovers(self):
        svc = GenerationService(FakeJen1(delay=0.15), max_batch=1,
                                max_wait_ms=5.0, max_queue=2)
        try:
            outcomes = []
            lock = threading.Lock()

            def worker():
                try:
                    svc.submit("x", seconds=0.1, steps=1, timeout=30)
                    out = "ok"
                except ServiceOverloaded as e:
                    assert e.retry_after >= 1.0
                    out = "shed"
                with lock:
                    outcomes.append(out)

            threads = [threading.Thread(target=worker) for _ in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert outcomes.count("ok") >= 1
            assert outcomes.count("shed") >= 1
            assert len(outcomes) == 8  # nothing hung or raised elsewhere
            assert svc.stats["rejected"] == outcomes.count("shed")
            # queue cleared: a fresh request is admitted and served
            audio = svc.submit("after", seconds=0.1, steps=1, timeout=30)
            assert np.isfinite(audio).all()
        finally:
            svc.close()

    def test_close_drains_admitted_work(self):
        svc = GenerationService(FakeJen1(delay=0.1), max_batch=1,
                                max_wait_ms=5.0, max_queue=8)
        results = []

        def worker(i):
            results.append(svc.submit(f"r{i}", seconds=0.1, steps=1,
                                      timeout=30))

        threads = [threading.Thread(target=worker, args=(i,))
                   for i in range(3)]
        for t in threads:
            t.start()
        time.sleep(0.02)  # let them be admitted
        svc.close()  # must wait for all 3, not abandon them
        for t in threads:
            t.join()
        assert len(results) == 3
        with pytest.raises(ServiceClosed):
            svc.submit("too late", seconds=0.1, steps=1, timeout=5)

    def test_explicit_seeds_never_cobatch(self):
        fake = FakeJen1(delay=0.05)
        svc = GenerationService(fake, max_batch=4, max_wait_ms=250.0,
                                max_queue=16)
        try:
            results = {}
            lock = threading.Lock()

            def worker(seed):
                audio = svc.submit("s", seconds=0.1, steps=1, seed=seed,
                                   timeout=30)
                with lock:
                    results[seed] = audio

            threads = [threading.Thread(target=worker, args=(s,))
                       for s in (5, 9)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            # each explicit-seed request ran its own batch at lane 0:
            # audio value == its own seed exactly (lane offset 0)
            assert float(results[5].flat[0]) == 5.0
            assert float(results[9].flat[0]) == 9.0
            assert len(fake.calls) == 2
        finally:
            svc.close()

    def test_different_key_request_not_starved(self):
        """A request bumped for a different batch_key is head-of-line next
        cycle, even under sustained traffic of the other key."""
        svc = GenerationService(FakeJen1(delay=0.02), max_batch=2,
                                max_wait_ms=40.0, max_queue=64)
        try:
            stop = threading.Event()

            def flood():  # steady stream of key A
                while not stop.is_set():
                    try:
                        svc.submit("a", seconds=0.1, steps=1, timeout=10)
                    except (ServiceOverloaded, ServiceClosed):
                        time.sleep(0.005)

            flooders = [threading.Thread(target=flood) for _ in range(3)]
            for t in flooders:
                t.start()
            time.sleep(0.05)
            t0 = time.time()
            audio = svc.submit("b", seconds=0.2, steps=2, timeout=10)  # key B
            elapsed = time.time() - t0
            stop.set()
            for t in flooders:
                t.join()
            assert np.isfinite(audio).all()
            assert elapsed < 5.0
        finally:
            svc.close()


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

    @pytest.mark.slow

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
        # match the SERVICE defaults (GDM DDIM + rbg noise — serve.py
        # GenerationService docstring), which the request body leaves unset
        expected = tiny_jen1.generate_long(
            "stream me", total_seconds=2.5, window_seconds=1.0,
            context_seconds=0.5, seed=13, steps=2,
            use_gdm=True, rng_impl="rbg",
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

    def test_http_503_on_overload(self):
        """Burst beyond max_queue: the HTTP layer sheds with 503 +
        Retry-After instead of stalling until timeout."""
        httpd = serve(FakeJen1(delay=0.2), host="127.0.0.1", port=0,
                      max_batch=1, max_wait_ms=5.0, max_queue=1)
        thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        thread.start()
        url = f"http://127.0.0.1:{httpd.server_address[1]}"
        try:
            codes = []
            retry_afters = []
            lock = threading.Lock()

            def worker():
                req = urllib.request.Request(
                    f"{url}/generate",
                    data=json.dumps({"prompt": "x", "seconds": 0.1,
                                     "steps": 1}).encode(),
                    method="POST",
                )
                try:
                    with urllib.request.urlopen(req, timeout=30) as r:
                        with lock:
                            codes.append(r.status)
                except urllib.error.HTTPError as e:
                    with lock:
                        codes.append(e.code)
                        if e.code == 503:
                            retry_afters.append(e.headers.get("Retry-After"))

            threads = [threading.Thread(target=worker) for _ in range(6)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert 200 in codes and 503 in codes
            assert all(ra is not None and int(ra) >= 1 for ra in retry_afters)
            # healthz reports depth + rejections
            with urllib.request.urlopen(f"{url}/healthz", timeout=10) as r:
                body = json.loads(r.read())
            assert body["rejected"] >= 1 and body["max_queue"] == 1
        finally:
            httpd.shutdown()
            httpd.service.close()


class TestCancellationAndCloseRaces:
    """Regressions for the r2 advisor findings: timed-out submitters must
    not cost device batches, depth slots release exactly once, and close()
    fails stranded queued requests instead of leaving submitters blocked."""

    def test_timed_out_request_not_run(self):
        jen1 = FakeJen1(delay=0.4)
        svc = GenerationService(jen1, max_batch=1, max_wait_ms=10.0,
                                default_seconds=1.0, default_steps=2)
        try:
            t_a = threading.Thread(
                target=lambda: svc.submit("A", seconds=1.0, timeout=10.0))
            t_a.start()
            time.sleep(0.1)  # A occupies the device
            with pytest.raises(TimeoutError):
                svc.submit("B", seconds=1.0, timeout=0.05)
            t_a.join(10.0)
            deadline = time.time() + 5.0
            while svc.queue_depth > 0 and time.time() < deadline:
                time.sleep(0.02)
            assert svc.queue_depth == 0  # B's admission slot released
            prompts = [p for c in jen1.calls for p in c["prompts"]]
            assert "B" not in prompts  # no device batch for abandoned work
        finally:
            svc.close()

    def test_depth_released_exactly_once(self):
        from jen1_tpu.serve import _Request

        svc = GenerationService(FakeJen1(), max_batch=1,
                                default_seconds=1.0, default_steps=2)
        try:
            with svc._depth_lock:
                svc._depth += 1
            req = _Request("x", 1.0, 2, -1, False)
            svc._finish(req, error="boom")
            svc._finish(req, error="boom2")  # idempotent
            assert svc.queue_depth == 0
            assert req.error == "boom"
        finally:
            svc.close()

    def test_close_fails_requests_still_queued(self):
        from jen1_tpu.serve import _Request

        svc = GenerationService(FakeJen1(), max_batch=1,
                                default_seconds=1.0, default_steps=2)
        # stop the dispatcher first, then strand an admitted request
        svc._stop.set()
        svc._thread.join(5.0)
        req = _Request("stranded", 1.0, 2, -1, False)
        with svc._depth_lock:
            svc._depth += 1
        svc._queue.put(req)
        svc.close(drain_timeout=0.1)
        assert req.done.is_set()
        assert req.error is not None  # submitter unblocked with an error
        assert svc.queue_depth == 0

    def test_submit_after_close_raises_service_closed(self):
        svc = GenerationService(FakeJen1(), max_batch=1,
                                default_seconds=1.0, default_steps=2)
        svc.close()
        with pytest.raises(ServiceClosed):
            svc.submit("late", seconds=1.0)
