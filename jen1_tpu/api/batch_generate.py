"""Batch text-to-music generation CLI (serving-style throughput path).

  python -m jen1_tpu.api.batch_generate --prompts prompts.txt --out outdir \
      [--ckpt path] [--seconds 30] [--steps 100] [--batch-size 4] \
      [--use-gdm] [--seed 0] [--dp N]

One WAV per prompt line. Prompts are padded to full batches (fixed shapes =
one compiled sampler for the whole run); --dp > 1 shards each batch over a
data-parallel device mesh so multi-chip hosts decode N clips per step —
the reference has no batch or multi-device inference path at all
(generation.py:215-219 is a single-prompt smoke block).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--prompts", required=True, help="text file, one per line")
    p.add_argument("--out", required=True)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--config", default=None, help="JSON config path")
    p.add_argument("--seconds", type=float, default=30.0)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--use-gdm", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dp", type=int, default=1,
                   help="shard each batch over this many devices")
    p.add_argument("--weights-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="'bfloat16' halves weight HBM + upload "
                        "(compute-identical under bf16 compute)")
    args = p.parse_args()

    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import numpy as np

    from jen1_tpu.api.generation import Jen1, save_audio
    from jen1_tpu.config import Config

    config = Config.from_json(args.config) if args.config else Config()
    with open(args.prompts) as f:
        prompts = [line.strip() for line in f if line.strip()]
    assert prompts, f"no prompts in {args.prompts}"
    os.makedirs(args.out, exist_ok=True)

    jen = Jen1(args.ckpt, config=config, weights_dtype=args.weights_dtype)
    if args.dp > 1:
        from jen1_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.dp, tp=1)
        assert args.batch_size % args.dp == 0, "batch_size must divide dp"
        jen.mesh = mesh  # generate() shards (B, ...) inputs over dp

    B = args.batch_size
    manifest = []
    t_start = time.time()
    for start in range(0, len(prompts), B):
        chunk = prompts[start : start + B]
        pad = B - len(chunk)
        batch_prompts = chunk + [""] * pad  # fixed shape -> one compile
        t0 = time.time()
        # batched prompts: run them as one batch with a shared prompt when
        # identical, else per-prompt conditioning via batch_size
        audio = jen.generate(
            batch_prompts if len(set(batch_prompts)) > 1 else batch_prompts[0],
            seed=args.seed + start,
            steps=args.steps,
            batch_size=B,
            seconds=args.seconds,
            use_gdm=args.use_gdm,
        )
        wall = time.time() - t0
        audio = np.asarray(audio)[: len(chunk)]
        for i, prompt in enumerate(chunk):
            name = f"{start + i:05d}.wav"
            save_audio(audio[i], os.path.join(args.out, name),
                       sample_rate=jen.sample_rate)
            manifest.append({"file": name, "prompt": prompt})
        print(
            f"batch {start // B}: {len(chunk)} clips in {wall:.2f}s "
            f"({len(chunk) * args.seconds / wall:.1f} audio_s/s)",
            flush=True,
        )
    with open(os.path.join(args.out, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    total = time.time() - t_start
    print(
        f"done: {len(prompts)} clips, {len(prompts) * args.seconds / total:.1f}"
        f" audio_s/s overall -> {args.out}"
    )


if __name__ == "__main__":
    main()
