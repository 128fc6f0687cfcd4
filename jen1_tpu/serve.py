"""Production serving for Jen1: HTTP API with static-shape micro-batching.

The reference has no serving layer at all (SURVEY.md §1: entry points are
`torchrun train.py` and importing `generation.Jen1`); this module is the
deployment surface a production user needs on TPU:

  * ONE compiled sampler graph serves every request: requests are grouped by
    (seconds, steps, use_gdm) and padded to a fixed `max_batch` with null
    prompts, so XLA never recompiles for traffic patterns (every distinct
    shape costs a multi-minute compile through a cold cache — see
    docs/USAGE.md). Padding lanes are dropped before the response.
  * micro-batching: a single dispatcher thread drains the request queue,
    waits up to `max_wait_ms` for co-batchable requests, and runs the chip
    at batch size up to `max_batch` — throughput scales with batch on the
    MXU while per-request latency is bounded by the wait window.
  * plain-stdlib HTTP (ThreadingHTTPServer): POST /generate with a JSON
    body {"prompt": str, "seconds": float, "steps": int, "seed": int,
    "format": "wav"|"npy"} returns audio/wav (16-bit PCM) or an .npy
    tensor; GET /healthz returns readiness + serving stats.
  * overload behavior: admission is bounded by `max_queue`; beyond it,
    `submit` raises ServiceOverloaded and the HTTP layer answers
    503 + Retry-After (estimated from the dispatcher's EWMA batch time)
    instead of stalling every caller until timeout. `close()` drains:
    new work is refused, queued work completes, then the dispatcher stops.
  * seed semantics: requests with an explicit seed are never co-batched
    (each runs as lane 0 of its own padded batch), so seed=N is exactly
    reproducible. Default-seed requests (seed=-1) co-batch freely.

Usage:
    jen1-serve --ckpt ckpts/ --port 8000
    curl -X POST localhost:8000/generate -d '{"prompt": "warm jazz"}' \
         -o out.wav
"""

from __future__ import annotations

import io
import itertools
import json
import math
import queue
import threading
import time
import wave
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, List, Optional

import numpy as np


class ServiceOverloaded(RuntimeError):
    """Admission queue is full; retry after `retry_after` seconds."""

    def __init__(self, retry_after: float):
        super().__init__(f"service overloaded, retry after {retry_after:.0f}s")
        self.retry_after = retry_after


class ServiceClosed(RuntimeError):
    """The service is draining/shut down and accepts no new work."""


_REQ_IDS = itertools.count()


@dataclass
class _Request:
    prompt: str
    seconds: float
    steps: int
    seed: int
    use_gdm: bool
    uid: int = field(default_factory=lambda: next(_REQ_IDS))
    done: threading.Event = field(default_factory=threading.Event)
    audio: Optional[np.ndarray] = None  # (ch, T)
    error: Optional[str] = None
    # set by submit() on timeout: the dispatcher drops the request at batch
    # formation instead of spending a device batch on audio nobody reads
    cancelled: bool = False
    # _finish() ran (guarded by _depth_lock): makes depth release idempotent
    finished: bool = False

    @property
    def batch_key(self):
        # requests sharing a key share one compiled graph & one device batch.
        # An explicit seed makes the key unique: the request runs as lane 0 of
        # its own padded batch, so seed=N is exactly reproducible (module
        # docstring "seed semantics").
        seed_key = None if self.seed == -1 else self.uid
        return (float(self.seconds), int(self.steps), bool(self.use_gdm),
                seed_key)


class GenerationService:
    """Micro-batching dispatcher over a Jen1 model. HTTP-independent: call
    `submit()` from any frontend; one background thread owns the device."""

    def __init__(
        self,
        jen1,
        max_batch: int = 4,
        max_wait_ms: float = 200.0,
        default_seconds: float = 30.0,
        default_steps: int = 100,
        max_queue: int = 32,
        sampler_mode: str = "scan",
        default_use_gdm: bool = True,
        rng_impl: str = "rbg",
        output_dtype: str = "float32",
        pipeline_depth: int = 2,
        n_completers: int = 2,
    ):
        self.jen1 = jen1
        self.max_batch = int(max_batch)
        self.max_wait_ms = float(max_wait_ms)
        self.default_seconds = default_seconds
        self.default_steps = default_steps
        self.max_queue = int(max_queue)
        # 'scan' = whole sampling loop in one XLA program (lowest latency
        # once compiled); 'stepwise' = one jitted step + host loop — the
        # fallback for hosts whose compile service cannot land the whole-loop
        # program (e.g. remote-compile tunnels with a hard request timeout);
        # 'dpm++' = DPM-Solver++(2M) scan (fewer model calls per clip).
        self.sampler_mode = str(sampler_mode)
        # The SERVICE default diffusion is GDM DDIM — a preference, not a
        # workaround: the VDM scan compiles and runs at parity with GDM
        # (benchmarks/VDM_E2E_TPU.md; the r4 "VDM cannot compile" was the
        # closure-captured-weights bug), but DDIM exposes the serving-useful
        # knobs (steps, dpm++, encoder_reuse). Per-request use_gdm overrides.
        self.default_use_gdm = bool(default_use_gdm)
        # Serving draws sampler noise from the TPU hardware RNG ('rbg'):
        # same iid N(0,1) stream, 3x cheaper keygen per step than threefry
        # (benchmarks/b1_math_slope.py). Seeds remain reproducible WITHIN an
        # impl; cross-impl seed streams differ (generate() docstring).
        self.rng_impl = str(rng_impl)
        # 'int16' converts to 16-bit PCM ON DEVICE and halves the
        # device->host fetch (the warm-latency bound on tunneled runtimes);
        # submit() then returns int16 arrays. The HTTP layer emits s16le WAV
        # either way, so 'int16' loses nothing over HTTP. Default 'float32'
        # keeps the programmatic submit() contract.
        self.output_dtype = str(output_dtype)
        self.stats: Dict[str, Any] = {
            "requests": 0, "batches": 0, "padded_lanes": 0, "errors": 0,
            "rejected": 0, "streams": 0, "busy": False,
        }
        self._queue: "queue.Queue[_Request]" = queue.Queue()
        # Requests pulled off the queue but not co-batchable with the batch
        # being formed wait here and are consulted BEFORE the queue, so a
        # bumped request is first in line for the next batch of its key
        # (never starved by sustained traffic of another key).
        self._pending: "deque[_Request]" = deque()
        # admitted-but-not-finished count, bounded by max_queue
        self._depth = 0
        self._depth_lock = threading.Lock()
        # EWMA of device batch wall time, for Retry-After estimates
        self._batch_secs_ewma = 1.0
        # One jitted program runs at a time: batch dispatch and long-form
        # streams share the device through this lock, interleaving at
        # window granularity.
        self._device_lock = threading.Lock()
        self._draining = threading.Event()
        self._stop = threading.Event()
        # Pipelined completion: the dispatcher DISPATCHES a batch (async JAX
        # call via generate(output_transport="device")) and hands the device
        # array to the completer thread, which blocks on the device->host
        # fetch and delivers responses. The device computes batch N+1 while
        # batch N's audio crosses the host link — without this the fetch
        # (plus response delivery) serializes between device batches and the
        # chip idles (benchmarks/SERVING_TPU.md attribution). The queue bound
        # keeps at most `pipeline_depth` batches in flight on the device.
        self._inflight: "queue.Queue" = queue.Queue(
            maxsize=max(1, int(pipeline_depth))
        )
        # host-side phase seconds accumulated over all batches, for the
        # serving attribution table (serve_bench.py): generate()'s
        # last_timings phases + 'collect' (batch formation) + 'fetch'
        self.phase_totals: Dict[str, float] = {}
        self._phase_lock = threading.Lock()
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="jen1-dispatcher", daemon=True
        )
        # Completer threads (default 2): the device->host link serializes
        # mostly, but two in-flight fetches measured ~1.4x the aggregate
        # bandwidth of one on the tunneled runtime (19 -> 26 MB/s), and the
        # r5 sweep found no further gain past 2 (see
        # benchmarks/SERVING_TPU.md attribution). Completion order across
        # batches is irrelevant — each request's Event fires independently.
        self._completers = [
            threading.Thread(
                target=self._complete_loop, name=f"jen1-completer-{i}",
                daemon=True,
            )
            for i in range(max(1, int(n_completers)))
        ]
        self._thread.start()
        for c in self._completers:
            c.start()

    @property
    def queue_depth(self) -> int:
        with self._depth_lock:
            return self._depth

    def _retry_after(self, depth: int) -> float:
        # full queue drains in ~depth/max_batch device batches
        batches = math.ceil(max(1, depth) / self.max_batch)
        return max(1.0, batches * self._batch_secs_ewma)

    # ------------------------------------------------------------- public

    def submit(
        self,
        prompt: str,
        seconds: Optional[float] = None,
        steps: Optional[int] = None,
        seed: int = -1,
        use_gdm: Optional[bool] = None,
        timeout: Optional[float] = None,
    ) -> np.ndarray:
        """Blocking: returns (channels, samples) float32. Raises RuntimeError
        on generation failure, TimeoutError if the deadline passes,
        ServiceOverloaded when the admission queue is full, ServiceClosed
        after close()."""
        # draining check + admission are ONE atomic section: close() sets
        # _draining under the same lock, so a submit that passes the check
        # has already incremented _depth and the drain loop waits for it
        # (previously a racer could enqueue after the drain loop read 0 and
        # block forever with timeout=None).
        with self._depth_lock:
            if self._draining.is_set():
                raise ServiceClosed("service is shutting down")
            depth = self._depth
            admitted = depth < self.max_queue
            if admitted:
                self._depth += 1
        if not admitted:
            self.stats["rejected"] += 1
            raise ServiceOverloaded(self._retry_after(depth))
        req = _Request(
            prompt=str(prompt),
            seconds=float(seconds if seconds is not None else self.default_seconds),
            steps=int(steps if steps is not None else self.default_steps),
            seed=int(seed),
            use_gdm=bool(use_gdm if use_gdm is not None
                         else self.default_use_gdm),
        )
        self.stats["requests"] += 1
        self._queue.put(req)
        if not req.done.wait(timeout):
            # mark abandoned: the dispatcher releases the depth slot and
            # skips the request at batch formation (no device time for
            # audio nobody will read)
            req.cancelled = True
            raise TimeoutError("generation did not complete in time")
        if req.error is not None:
            raise RuntimeError(req.error)
        return req.audio

    def submit_stream(
        self,
        prompt: str,
        total_seconds: float,
        *,
        window_seconds: Optional[float] = None,
        context_seconds: Optional[float] = None,
        steps: Optional[int] = None,
        seed: int = -1,
        use_gdm: Optional[bool] = None,
    ):
        """Long-form streaming: yields (channels, n_new) float32 chunks as
        each window completes (Jen1.generate_long_stream). The device lock is
        held per window, so queued short requests interleave between
        windows."""
        if self._draining.is_set():
            raise ServiceClosed("service is shutting down")
        window = float(
            window_seconds if window_seconds is not None else self.default_seconds
        )
        ctx = float(
            context_seconds if context_seconds is not None else window / 3.0
        )
        self.stats["streams"] += 1
        gen = self.jen1.generate_long_stream(
            str(prompt), float(total_seconds),
            window_seconds=window, context_seconds=ctx,
            seed=int(seed),
            steps=int(steps if steps is not None else self.default_steps),
            batch_size=1,
            use_gdm=bool(use_gdm if use_gdm is not None
                         else self.default_use_gdm),
            sampler_mode=self.sampler_mode,
            rng_impl=self.rng_impl,
        )
        it = iter(gen)
        while True:
            with self._device_lock:
                try:
                    chunk = next(it)
                except StopIteration:
                    return
            yield np.asarray(chunk)[0]  # (ch, n_new)

    def close(self, drain_timeout: float = 60.0) -> None:
        """Graceful shutdown: refuse new work, let already-admitted requests
        finish (up to drain_timeout), then stop the dispatcher. Anything
        still queued afterwards (drain timed out) fails with ServiceClosed
        instead of leaving its submitter blocked."""
        with self._depth_lock:  # atomic vs submit's admission section
            self._draining.set()
        deadline = time.time() + drain_timeout
        while self.queue_depth > 0 and time.time() < deadline:
            time.sleep(0.02)
        self._stop.set()
        self._thread.join(timeout=5.0)
        # the dispatcher's exit put the sentinels; drain remaining fetches
        for c in self._completers:
            c.join(timeout=drain_timeout)
        leftovers: List[_Request] = list(self._pending)
        self._pending.clear()
        while True:
            try:
                leftovers.append(self._queue.get_nowait())
            except queue.Empty:
                break
        for req in leftovers:
            self._finish(req, error="service closed while request queued")

    # ---------------------------------------------------------- internals

    def _finish(self, req: _Request, error: Optional[str] = None) -> None:
        # idempotent: close()'s leftover sweep can race a still-draining
        # dispatcher; the depth slot must be released exactly once
        with self._depth_lock:
            if req.finished:
                return
            req.finished = True
            self._depth -= 1
        if error is not None:
            req.error = error
        req.done.set()

    def _next_request(self, timeout: float) -> Optional[_Request]:
        if self._pending:
            return self._pending.popleft()
        try:
            return self._queue.get(timeout=timeout)
        except queue.Empty:
            return None

    def _collect_batch(self) -> List[_Request]:
        """Block for one request, then drain co-batchable ones (same
        batch_key) for up to max_wait_ms. Bumped different-key requests go
        to the head-of-line `_pending` deque, not the back of the queue.
        Requests whose submitter timed out (cancelled) are finished and
        dropped here, before any device time is spent on them."""
        for req in [r for r in self._pending if r.cancelled]:
            self._pending.remove(req)
            self._finish(req, error="cancelled (submitter timed out)")
        first = self._next_request(timeout=0.1)
        if first is None or first.cancelled:
            if first is not None:
                self._finish(first, error="cancelled (submitter timed out)")
            return []
        batch = [first]
        # older bumped requests of the same key ride this batch first
        for req in list(self._pending):
            if len(batch) >= self.max_batch:
                break
            if req.batch_key == first.batch_key:
                self._pending.remove(req)
                batch.append(req)
        deadline = time.time() + self.max_wait_ms / 1e3
        while len(batch) < self.max_batch:
            remaining = deadline - time.time()
            if remaining <= 0:
                break
            try:
                req = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if req.cancelled:
                self._finish(req, error="cancelled (submitter timed out)")
            elif req.batch_key == first.batch_key:
                batch.append(req)
            else:
                self._pending.append(req)  # different graph: next batch
        return batch

    def _add_phases(self, timings: Dict[str, float]) -> None:
        with self._phase_lock:
            for k, v in timings.items():
                self.phase_totals[k] = self.phase_totals.get(k, 0.0) + v

    def _dispatch_loop(self) -> None:
        while True:
            if self._stop.is_set() and not self._pending \
                    and self._queue.empty():
                for _ in self._completers:  # one shutdown sentinel each
                    self._inflight.put(None)
                return
            t_c0 = time.perf_counter()
            batch = self._collect_batch()
            if not batch:
                continue
            self._add_phases({"collect": time.perf_counter() - t_c0})
            self.stats["busy"] = True
            t0 = time.time()
            try:
                with self._device_lock:
                    audio_dev = self._dispatch_batch(batch)
            except Exception as e:  # noqa: BLE001 — report to the callers
                self.stats["errors"] += 1
                for req in batch:
                    if not req.done.is_set():
                        self._finish(req, error=f"{type(e).__name__}: {e}")
                self.stats["busy"] = False
                continue
            # hand the async device array to the completer; blocks only when
            # pipeline_depth batches are already in flight (backpressure)
            self._inflight.put((batch, audio_dev, t0))
            self.stats["busy"] = False

    def _complete_loop(self) -> None:
        """Owns the device->host side: blocks on each in-flight batch's
        fetch and delivers responses, while the dispatcher (and the device)
        move on to the next batch."""
        while True:
            item = self._inflight.get()
            if item is None:
                return
            batch, audio_dev, t0 = item
            try:
                t_f0 = time.perf_counter()
                audio = np.asarray(audio_dev)  # blocks: device + transfer
                self._add_phases({"fetch": time.perf_counter() - t_f0})
                self._batch_secs_ewma = (
                    0.7 * self._batch_secs_ewma + 0.3 * (time.time() - t0)
                )
                self.stats["batches"] += 1
                self.stats["padded_lanes"] += self.max_batch - len(batch)
                for lane, req in enumerate(batch):
                    req.audio = audio[lane]
                    self._finish(req)
            except Exception as e:  # noqa: BLE001 — report to the callers
                self.stats["errors"] += 1
                for req in batch:
                    if not req.done.is_set():
                        self._finish(req, error=f"{type(e).__name__}: {e}")

    def _dispatch_batch(self, batch: List[_Request]):
        """Pad to the FIXED max_batch (all traffic hits one compiled graph)
        and ASYNC-dispatch generation; returns the un-fetched device array."""
        n_pad = self.max_batch - len(batch)
        prompts = [r.prompt for r in batch] + [""] * n_pad
        first = batch[0]
        # An explicit seed implies a singleton batch (batch_key includes the
        # request uid), so the seeded request is always lane 0 of its padded
        # batch — exactly reproducible. Default-seed batches run fresh noise.
        audio_dev = self.jen1.generate(
            prompts,
            seed=first.seed,
            steps=first.steps,
            batch_size=self.max_batch,
            seconds=first.seconds,
            use_gdm=first.use_gdm,
            sampler_mode=self.sampler_mode,
            rng_impl=self.rng_impl,
            output_dtype=self.output_dtype,
            output_transport="device",
        )  # (max_batch, ch, T), not yet on host
        if n_pad and hasattr(audio_dev, "at"):  # jax array, not a test fake
            # padding lanes never cross the device->host link — the fetch is
            # the serving bottleneck on tunneled runtimes (~20-30 MB/s), so
            # an under-filled batch fetches len(batch)/max_batch of the bytes
            audio_dev = audio_dev[: len(batch)]
        self._add_phases(getattr(self.jen1, "last_timings", {}) or {})
        return audio_dev


def _wav_bytes(audio_ct: np.ndarray, sample_rate: int) -> bytes:
    """(channels, T) float32 [-1,1] OR int16 (already device-converted)
    -> 16-bit PCM WAV bytes."""
    if audio_ct.dtype == np.int16:
        ints = audio_ct.T.astype("<i2")
    else:
        audio = np.clip(audio_ct.T.astype(np.float32), -1.0, 1.0)
        ints = (audio * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ints.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(ints.tobytes())
    return buf.getvalue()


def make_handler(service: GenerationService, sample_rate: int):
    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 enables Transfer-Encoding: chunked for /generate_long;
        # all non-streaming responses carry an exact Content-Length.
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str,
                  headers: Optional[Dict[str, str]] = None) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            for k, v in (headers or {}).items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                body = json.dumps({
                    "ok": not service._draining.is_set(),
                    "queue_depth": service.queue_depth,
                    "max_queue": service.max_queue,
                    **service.stats,
                }).encode()
                self._send(200, body, "application/json")
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def do_POST(self):
            if self.path == "/generate_long":
                self._generate_long()
                return
            if self.path != "/generate":
                self._send(404, b'{"error": "not found"}', "application/json")
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                prompt = payload["prompt"]
            except (KeyError, ValueError) as e:
                self._send(
                    400,
                    json.dumps({"error": f"bad request: {e}"}).encode(),
                    "application/json",
                )
                return
            try:
                audio = service.submit(
                    prompt,
                    seconds=payload.get("seconds"),
                    steps=payload.get("steps"),
                    seed=int(payload.get("seed", -1)),
                    use_gdm=payload.get("use_gdm"),  # None -> service default
                    timeout=float(payload.get("timeout", 600.0)),
                )
            except TimeoutError:
                self._send(
                    504, b'{"error": "generation timed out"}', "application/json"
                )
                return
            except ServiceOverloaded as e:
                self._send(
                    503, json.dumps({"error": str(e)}).encode(),
                    "application/json",
                    headers={"Retry-After": str(int(math.ceil(e.retry_after)))},
                )
                return
            except ServiceClosed as e:
                self._send(
                    503, json.dumps({"error": str(e)}).encode(),
                    "application/json",
                )
                return
            except RuntimeError as e:
                self._send(
                    500, json.dumps({"error": str(e)}).encode(), "application/json"
                )
                return
            fmt = payload.get("format", "wav")
            if fmt == "npy":
                buf = io.BytesIO()
                np.save(buf, audio)
                self._send(200, buf.getvalue(), "application/octet-stream")
            else:
                self._send(200, _wav_bytes(audio, sample_rate), "audio/wav")

        def _generate_long(self):
            """Stream long-form audio as chunked 16-bit PCM: the first bytes
            leave after the first window (~0.2 s of compute on a v5e), not
            after the whole clip. Content-Type audio/L16 (interleaved,
            big-endian per RFC 2586 is NOT used — little-endian s16le,
            declared via X-Audio-Format for simplicity of clients)."""
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                prompt = payload["prompt"]
                total_seconds = float(payload["total_seconds"])
            except (KeyError, ValueError) as e:
                self._send(
                    400,
                    json.dumps({"error": f"bad request: {e}"}).encode(),
                    "application/json",
                )
                return
            stream = service.submit_stream(
                prompt, total_seconds,
                window_seconds=payload.get("window_seconds"),
                context_seconds=payload.get("context_seconds"),
                steps=payload.get("steps"),
                seed=int(payload.get("seed", -1)),
                use_gdm=payload.get("use_gdm"),  # None -> service default
            )
            try:
                first = next(stream)  # generate errors surface as HTTP 500
            except StopIteration:
                self._send(200, b"", "audio/L16")
                return
            except ServiceClosed as e:
                self._send(
                    503, json.dumps({"error": str(e)}).encode(), "application/json"
                )
                return
            except Exception as e:  # noqa: BLE001
                self._send(
                    500, json.dumps({"error": str(e)}).encode(), "application/json"
                )
                return
            channels = first.shape[0]
            self.send_response(200)
            self.send_header("Content-Type", "audio/L16")
            self.send_header("X-Audio-Format", "s16le")
            self.send_header("X-Sample-Rate", str(sample_rate))
            self.send_header("X-Channels", str(channels))
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def write_chunk(arr):
                pcm = np.clip(arr.T, -1.0, 1.0)  # (n, ch)
                data = (pcm * 32767.0).astype("<i2").tobytes()
                self.wfile.write(f"{len(data):X}\r\n".encode())
                self.wfile.write(data)
                self.wfile.write(b"\r\n")

            write_chunk(first)
            for chunk in stream:
                write_chunk(chunk)
            self.wfile.write(b"0\r\n\r\n")

    return Handler


def serve(
    jen1,
    host: str = "0.0.0.0",
    port: int = 8000,
    max_batch: int = 4,
    max_wait_ms: float = 200.0,
    max_queue: int = 32,
    sampler_mode: str = "scan",
    default_use_gdm: bool = True,
    rng_impl: str = "rbg",
    output_dtype: str = "int16",
) -> ThreadingHTTPServer:
    """Build (but do not run) the HTTP server; call .serve_forever().

    output_dtype defaults to 'int16' here (unlike GenerationService): the
    HTTP layer emits 16-bit WAV regardless, so converting on device loses
    nothing and halves the device->host fetch. 'npy' responses then carry
    int16 — pass output_dtype='float32' to keep fp32 npy."""
    service = GenerationService(jen1, max_batch=max_batch,
                                max_wait_ms=max_wait_ms, max_queue=max_queue,
                                sampler_mode=sampler_mode,
                                default_use_gdm=default_use_gdm,
                                rng_impl=rng_impl,
                                output_dtype=output_dtype)
    httpd = ThreadingHTTPServer(
        (host, port), make_handler(service, jen1.sample_rate)
    )
    httpd.service = service  # type: ignore[attr-defined]
    return httpd


def main(argv: Optional[List[str]] = None) -> None:
    import argparse

    from jen1_tpu.api.generation import Jen1
    from jen1_tpu.config import Config
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    p = argparse.ArgumentParser(description="Serve Jen1 text-to-music over HTTP")
    p.add_argument("--ckpt", default=None, help="checkpoint dir/file")
    p.add_argument("--config", default=None, help="config JSON path")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--max-wait-ms", type=float, default=200.0)
    p.add_argument("--max-queue", type=int, default=32,
                   help="admission bound; beyond it requests get 503")
    p.add_argument("--sampler-mode", default="scan",
                   choices=("scan", "stepwise", "dpm++"),
                   help="'stepwise' for hosts whose compile service cannot "
                        "land the whole-loop scan program")
    p.add_argument("--diffusion", default="gdm", choices=("gdm", "vdm"),
                   help="service default when a request omits use_gdm: "
                        "'gdm' (DDIM; exposes steps/dpm++/encoder_reuse) "
                        "or 'vdm' (generate()'s own default; compiles and "
                        "serves at parity — benchmarks/VDM_E2E_TPU.md)")
    p.add_argument("--rng", default="rbg", choices=("rbg", "threefry2x32"),
                   help="sampler noise impl: 'rbg' = TPU hardware RNG "
                        "(3x cheaper keygen/step); seeds reproducible "
                        "within an impl only")
    p.add_argument("--output-dtype", default="int16",
                   choices=("int16", "float32"),
                   help="'int16' converts to PCM on device (half the "
                        "device->host fetch; WAV output is 16-bit anyway); "
                        "'float32' keeps fp32 npy responses")
    p.add_argument("--weights-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="'bfloat16' stores matrix weights bf16 on device "
                        "(halves weight HBM + upload; compute-identical "
                        "when compute is bf16 — kernels are cast to the "
                        "activation dtype at use anyway)")
    args = p.parse_args(argv)

    enable_compile_cache()
    config = Config.from_json(args.config) if args.config else Config()
    jen1 = Jen1(args.ckpt, config=config, weights_dtype=args.weights_dtype)
    httpd = serve(
        jen1, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue, sampler_mode=args.sampler_mode,
        default_use_gdm=(args.diffusion == "gdm"), rng_impl=args.rng,
        output_dtype=args.output_dtype,
    )
    print(f"jen1-serve listening on {args.host}:{httpd.server_address[1]}")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        httpd.service.close()  # drain admitted work before exit


if __name__ == "__main__":
    main()
