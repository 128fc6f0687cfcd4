"""Streaming long-form serving metric: time-to-first-audio on the real TPU.

`Jen1.generate_long_stream` (api/generation.py) yields finalized PCM chunks
as each 30 s window completes, so a listener hears audio after ONE window
instead of after the whole clip — the product claim behind `jen1-serve`'s
chunked-PCM streaming endpoint. This bench measures it end to end at the
flagship configuration (100-step DDIM scan, chunked codec decode, bf16
weight storage, random weights — timing is value-independent since every
jitted program takes the weight tree as an argument):

  * time-to-first-chunk (what a listener waits before audio starts),
  * per-window walls and the total for `JEN1_STREAM_TOTAL_S` (default 120 s)
    of audio,
  * realtime headroom: a stream stays glitch-free iff every subsequent
    window is generated faster than it is played back (window - context =
    20 s of new audio per window).

The first window runs the cache-warm flagship sampler program; each later
window adds the music_cont conditioning path (context encode + concat), a
separate program compiled once. Reference context: the torch reference can
only emit whole fixed-length clips (/root/reference/generation.py:76).

Run: python benchmarks/longform_stream_bench.py
     JEN1_STREAM_TOTAL_S=120 JEN1_STREAM_STEPS=100
Writes benchmarks/LONGFORM_STREAM_TPU.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax

    from jen1_tpu.api.generation import Jen1
    from jen1_tpu.config import Config

    total_s = float(os.environ.get("JEN1_STREAM_TOTAL_S", "120"))
    steps = int(os.environ.get("JEN1_STREAM_STEPS", "100"))
    window_s, context_s = 30.0, 10.0

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} total={total_s:.0f}s steps={steps} "
          f"window={window_s:.0f}s context={context_s:.0f}s", flush=True)

    t0 = time.time()
    jen1 = Jen1(ckpt_path=None, config=Config(),
                weights_dtype="bfloat16")
    print(f"Jen1 built (random weights) in {time.time() - t0:.0f}s",
          flush=True)

    # Warm-up clip: compiles/loads the window programs so the measured
    # stream reflects serving steady state (a real service warms on deploy).
    t0 = time.time()
    for _ in jen1.generate_long_stream(
        "warm-up", total_seconds=window_s + 1, seed=1, steps=steps,
        use_gdm=True,
    ):
        pass
    print(f"warm-up (compile + first stream) {time.time() - t0:.0f}s",
          flush=True)

    t_start = time.time()
    walls, sizes, emitted = [], [], 0
    for chunk in jen1.generate_long_stream(
        "a sweeping orchestral theme", total_seconds=total_s, seed=7,
        steps=steps, use_gdm=True,
    ):
        now = time.time()
        chunk = np.asarray(chunk)
        assert np.isfinite(chunk).all()
        emitted += chunk.shape[-1]
        sizes.append(chunk.shape[-1] / 48000)
        walls.append(now - (t_start if not walls else t_last))
        t_last = now
        print(f"chunk {len(walls)}: +{chunk.shape[-1] / 48000:.1f}s audio "
              f"in {walls[-1]:.2f}s (cum {emitted / 48000:.1f}s audio / "
              f"{now - t_start:.2f}s wall)", flush=True)
    total_wall = time.time() - t_start
    assert abs(emitted / 48000 - total_s) < 1.0, emitted

    ttfa = walls[0]
    new_per_window = window_s - context_s
    worst_later = max(walls[1:]) if len(walls) > 1 else float("nan")
    rt_headroom = new_per_window / worst_later if len(walls) > 1 else float(
        "nan")
    tput = total_s / total_wall
    print(f"time-to-first-audio={ttfa:.2f}s total={total_wall:.2f}s "
          f"({tput:.1f} audio-s/s) worst later window={worst_later:.2f}s "
          f"(needs <{new_per_window:.0f}s realtime; headroom "
          f"{rt_headroom:.0f}x)", flush=True)

    out = os.path.join(os.path.dirname(__file__), "LONGFORM_STREAM_TPU.md")
    with open(out, "w") as f:
        f.write(f"""# Streaming long-form — time-to-first-audio (real TPU)

Device: {dev.device_kind}. `Jen1.generate_long_stream` at the flagship
configuration ({steps}-step DDIM scan + chunked codec decode, bf16 weight
storage, {window_s:.0f} s windows with {context_s:.0f} s continuation
context), random weights (value-independent timing; weights are program
arguments). The torch reference can only emit whole fixed-length clips
(generation.py:76); a listener here hears audio after ONE window.

| metric | value |
|---|---|
| time-to-first-audio ({sizes[0]:.1f} s of finalized audio in the first chunk) | **{ttfa:.2f} s** |
| {total_s:.0f} s of audio, total wall | {total_wall:.2f} s ({tput:.1f} audio-s/s) |
| worst later-window wall | {worst_later:.2f} s |
| realtime requirement per window | < {new_per_window:.0f} s |
| glitch-free playback headroom | **{rt_headroom:.0f}x** |

Per-window walls: {', '.join(f'{w:.2f}' for w in walls)} s.

Reproduce: `JEN1_STREAM_TOTAL_S={total_s:.0f} JEN1_STREAM_STEPS={steps}
python benchmarks/longform_stream_bench.py`
""")
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
