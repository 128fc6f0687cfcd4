"""`jen1-verify-weights`: prove a pretrained checkpoint actually loads.

VERDICT r1 #3: the codec converter was only mock-parity-locked — "capability
parity on L0 is a claim, not a fact" until a real checkpoint flows
encode->decode with measured SNR. This CLI turns the claim into a check:

  1. KEY COVERAGE — every key of the given EnCodec state_dict must be either
     consumed by `convert_torch_encodec` or a known inference-irrelevant
     codebook buffer; and the key set is diffed against the public layout
     transcription (jen1_tpu/codec/torch_keys.py). Unexplained or missing
     keys fail the run.
  2. PARAM COVERAGE — the converted tree must initialize every parameter of
     the JAX EncodecModel (same leaf paths + shapes as a random init): a
     partially-initialized codec fails.
  3. ROUND-TRIP SNR — a logarithmic sine sweep (20 Hz .. 20 kHz) is
     encoded and decoded through the loaded codec; SNR is reported. A real
     EnCodec-48k at 24 kbps reconstructs a sweep at positive SNR; a random
     codec gives strongly negative SNR, so --min-snr-db (default 0) catches
     weight-scramble bugs that key/shape checks cannot.

Usage:
    jen1-verify-weights --codec-weights /path/to/encodec_48khz.th
    jen1-verify-weights --codec-weights ... --json report.json --min-snr-db 3
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Optional

import numpy as np


def _leaf_paths(tree, prefix=""):
    import jax

    return {
        "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path): leaf.shape
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


def sine_sweep(seconds: float = 3.0, sr: int = 48_000,
               f0: float = 20.0, f1: float = 20_000.0,
               channels: int = 2) -> np.ndarray:
    """(T, channels) float32 logarithmic sweep at -6 dBFS."""
    f1 = min(f1, 0.45 * sr)  # keep below Nyquist for small test rates
    t = np.arange(int(seconds * sr)) / sr
    k = np.log(f1 / f0) / seconds
    phase = 2 * np.pi * f0 * (np.exp(k * t) - 1) / k
    mono = 0.5 * np.sin(phase).astype(np.float32)
    return np.repeat(mono[:, None], channels, axis=1)


def verify_codec(
    weights_path: str,
    min_snr_db: float = 0.0,
    sweep_seconds: float = 3.0,
    config=None,
) -> dict:
    """Run the three checks; returns a JSON-able report with an 'ok' bool.
    `config` defaults to the 48 kHz release config; tests inject a tiny one."""
    import jax

    from jen1_tpu.codec.model import (
        EncodecModel,
        _RecordingDict,
        convert_torch_encodec,
        encodec_48khz_config,
        load_torch_encodec_state_dict,
    )
    from jen1_tpu.codec.torch_keys import coverage_report

    config = config or encodec_48khz_config()
    sd = load_torch_encodec_state_dict(weights_path)
    rec = _RecordingDict(sd)
    params = convert_torch_encodec(rec, config, strict=False)
    report: dict = {"weights_path": weights_path}

    # 1. key coverage vs the checkpoint AND the public layout
    cov = coverage_report(
        rec.keys(), rec.consumed, n_stages=len(config.ratios), n_q=config.n_q
    )
    report["key_coverage"] = {
        "n_keys": cov["n_keys"],
        "n_consumed": len(cov["consumed"]),
        "n_ignored_buffers": len(cov["ignored_buffers"]),
        "unexplained": cov["unexplained"],
        "missing_vs_public_layout": cov["missing_vs_public_layout"],
        "unexpected_vs_public_layout": cov["unexpected_vs_public_layout"],
        "norm": cov["norm"],
    }
    keys_ok = not cov["unexplained"] and not cov["missing_vs_public_layout"]

    # 2. param coverage: converted tree == random-init tree (paths + shapes)
    random_model = EncodecModel(config)
    want = _leaf_paths(random_model.params)
    got = _leaf_paths(params)
    report["param_coverage"] = {
        "n_params": len(want),
        "uninitialized": sorted(set(want) - set(got)),
        "extraneous": sorted(set(got) - set(want)),
        "shape_mismatch": sorted(
            p for p in set(want) & set(got) if want[p] != got[p]
        ),
    }
    pc = report["param_coverage"]
    params_ok = not (pc["uninitialized"] or pc["extraneous"]
                     or pc["shape_mismatch"])

    # 3. encode->decode SNR on a sine sweep
    model = EncodecModel(config, params=params)
    audio = sine_sweep(
        sweep_seconds, config.sample_rate, channels=config.channels
    )[None]  # (1, T, ch)
    latent = model.encode_latent(audio)
    decoded = np.asarray(jax.device_get(model.decode_latent_chunked(latent)))
    n = min(decoded.shape[1], audio.shape[1])
    err = decoded[:, :n] - audio[:, :n]
    snr_db = float(
        10 * np.log10((audio[:, :n] ** 2).mean() / max((err**2).mean(), 1e-12))
    )
    report["round_trip"] = {
        "sweep_seconds": sweep_seconds,
        "snr_db": round(snr_db, 2),
        "min_snr_db": min_snr_db,
    }
    snr_ok = snr_db >= min_snr_db

    report["checks"] = {
        "key_coverage": keys_ok, "param_coverage": params_ok, "snr": snr_ok,
    }
    report["ok"] = keys_ok and params_ok and snr_ok
    return report


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--codec-weights", required=True,
                   help="pretrained EnCodec-48k torch state_dict (.pt/.th)")
    p.add_argument("--min-snr-db", type=float, default=0.0,
                   help="fail if round-trip SNR is below this (random "
                        "weights land far below 0 dB)")
    p.add_argument("--sweep-seconds", type=float, default=3.0)
    p.add_argument("--json", default=None, help="also write the report here")
    args = p.parse_args(argv)

    report = verify_codec(
        args.codec_weights, min_snr_db=args.min_snr_db,
        sweep_seconds=args.sweep_seconds,
    )
    text = json.dumps(report, indent=2)
    print(text)
    if args.json:
        with open(args.json, "w") as f:
            f.write(text)
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
