"""Evaluation CLI: FAD / SNR / spectral convergence between two audio sets.

The reference repo ships no metric code at all (torchmetrics unused in its
requirements.txt:12 — SURVEY §2.3/§5); this CLI covers the BASELINE "FAD vs
PyTorch ref" measurement loop:

  python -m jen1_tpu.eval.run_eval --reference-dir ref_wavs/ \
      --candidate-dir gen_wavs/ [--vggish-weights vggish.pt] [--sr 48000]

Prints one JSON line. FAD uses the VGGish embedder when --vggish-weights is
given (the canonical metric), else the deterministic log-mel stand-in
(relative comparisons only).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def _load_dir(path: str, sr: int, max_seconds: float):
    from jen1_tpu.data.audio_io import convert_audio, load_audio

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.lower().endswith((".wav", ".mp3", ".flac"))
    )
    assert files, f"no audio files in {path}"
    clips = []
    t_max = int(max_seconds * sr)
    for f in files:
        audio, file_sr = load_audio(f)
        dst_ch = audio.shape[-1] if audio.ndim > 1 else 1
        audio = convert_audio(audio, file_sr, sr, dst_ch)
        clips.append(audio[:t_max])
    t_min = min(c.shape[0] for c in clips)
    return np.stack([c[:t_min] for c in clips])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference-dir", default=None)
    p.add_argument("--candidate-dir", default=None)
    p.add_argument("--sr", type=int, default=48_000)
    p.add_argument("--max-seconds", type=float, default=30.0)
    p.add_argument("--vggish-weights", default=None,
                   help="local torchvggish checkpoint for canonical FAD")
    p.add_argument("--against-reference", action="store_true",
                   help="FAD vs the PyTorch reference at a shared checkpoint "
                        "and matched injected noise (BASELINE north star; "
                        "see eval/fad_reference.py for the protocol)")
    p.add_argument("--reference-path", default="/root/reference",
                   help="checkout of 0417keito/JEN-1-pytorch "
                        "(--against-reference only)")
    p.add_argument("--n-clips", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    if args.against_reference:
        from jen1_tpu.eval.fad_reference import fad_against_reference

        report = fad_against_reference(
            n_clips=args.n_clips, seed=args.seed,
            vggish_weights=args.vggish_weights,
            reference_path=args.reference_path,
        )
        print(json.dumps(report))
        return 0
    if not (args.reference_dir and args.candidate_dir):
        p.error("--reference-dir/--candidate-dir are required "
                "(or pass --against-reference)")

    import jax.numpy as jnp

    from jen1_tpu.eval.metrics import (
        frechet_audio_distance,
        signal_to_noise_ratio,
        spectral_convergence,
    )

    ref = _load_dir(args.reference_dir, args.sr, args.max_seconds)
    cand = _load_dir(args.candidate_dir, args.sr, args.max_seconds)

    embed_fn = None
    embedder = "log-mel-standin"
    if args.vggish_weights:
        from jen1_tpu.eval.vggish import VGGishEmbedder

        embed_fn = VGGishEmbedder(
            weights_path=args.vggish_weights, sample_rate=args.sr
        )
        embedder = "vggish"

    out = {
        "fad": frechet_audio_distance(
            jnp.asarray(ref), jnp.asarray(cand), sample_rate=args.sr,
            embed_fn=embed_fn,
        ),
        "fad_embedder": embedder,
        "n_reference": int(ref.shape[0]),
        "n_candidate": int(cand.shape[0]),
    }
    # paired metrics only make sense for matching sets
    if ref.shape == cand.shape:
        out["snr_db_mean"] = float(
            np.mean(np.asarray(signal_to_noise_ratio(
                jnp.asarray(ref), jnp.asarray(cand))))
        )
        out["spectral_convergence_mean"] = float(
            np.mean(np.asarray(spectral_convergence(
                jnp.asarray(ref), jnp.asarray(cand))))
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
