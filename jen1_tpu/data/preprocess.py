"""Offline preprocessing.

Two stages (capability superset of reference dataset/preprocess.py:26-48):

  scan:    probe corpus durations -> durations.npy / cumsum.npy / files.txt
           caches so MusicDataset skips the cold scan (dataloader.py:30-37).
  encode:  wav -> Encodec latent .npy, batched ON-DEVICE — replaces the
           reference's per-item Encodec forward inside the dataloader worker
           (dataloader.py:108-113), the biggest avoidable train-loop cost
           (SURVEY §3.2).

CLI: python -m jen1_tpu.data.preprocess scan|encode --dataset-dir ... [--out ...]
"""

from __future__ import annotations

import argparse
import json
import os
from typing import Optional

import numpy as np

from jen1_tpu.data.audio_io import convert_audio, get_duration_sec, load_audio
from jen1_tpu.data.dataset import AUDIO_EXTS


def scan(dataset_dir: str, out_dir: Optional[str] = None) -> None:
    audio_dir = os.path.join(dataset_dir, "audios")
    out_dir = out_dir or dataset_dir
    files = sorted(
        os.path.join(audio_dir, f)
        for f in os.listdir(audio_dir)
        if f.lower().endswith(AUDIO_EXTS)
    )
    durations = np.asarray([get_duration_sec(f) for f in files], np.float64)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "durations.npy"), durations)
    np.save(os.path.join(out_dir, "cumsum.npy"), np.cumsum(durations))
    with open(os.path.join(out_dir, "files.txt"), "w") as f:
        f.write("\n".join(files) + "\n")
    print(f"scanned {len(files)} files, total {durations.sum():.1f}s")


def encode(
    dataset_dir: str,
    out_dir: str,
    sample_duration: float = 10.0,
    sr: int = 48_000,
    channels: int = 2,
    batch_size: int = 8,
    codec=None,
    segmented: bool = False,
    codec_weights: Optional[str] = None,
    chunked: bool = True,
) -> None:
    """Encode fixed-length windows of every file to latent .npy, in device
    batches through the JAX codec. segmented=True uses the reference's exact
    latent pipeline (per-1s volume-normalized segments, codes concatenated —
    dataloader.py:108-115) for training runs that must match
    reference-trained checkpoints. chunked=True (default) batches 1 s
    encoder chunks + latent overlap-add instead of the whole-clip
    encoder-LSTM scan (codec/model.py encode_latent_chunked)."""
    import jax.numpy as jnp

    from jen1_tpu.codec.model import make_codec

    if codec is None:
        codec = make_codec(codec_weights,
                           warn_context="offline latent preprocessing")

    audio_dir = os.path.join(dataset_dir, "audios")
    meta_dir = os.path.join(dataset_dir, "metadata")
    os.makedirs(out_dir, exist_ok=True)
    files = sorted(
        os.path.join(audio_dir, f)
        for f in os.listdir(audio_dir)
        if f.lower().endswith(AUDIO_EXTS)
    )
    window = int(sample_duration * sr)

    pending, names = [], []

    def flush():
        if not pending:
            return
        batch = jnp.asarray(np.stack(pending))
        if segmented:
            latents = np.asarray(codec.encode_latent_segmented(batch))
        elif chunked:
            latents = np.asarray(codec.encode_latent_chunked(batch))
        else:
            latents = np.asarray(codec.encode_latent(batch))
        for name, latent in zip(names, latents):
            np.save(os.path.join(out_dir, f"{name}.npy"), latent)
        pending.clear()
        names.clear()

    for path in files:
        audio, file_sr = load_audio(path)
        audio = convert_audio(audio, file_sr, sr, channels)
        base = os.path.splitext(os.path.basename(path))[0]
        src_meta = os.path.join(meta_dir, f"{base}.json")
        meta = {"prompt": ""}
        if os.path.exists(src_meta):
            with open(src_meta) as f:
                meta = json.load(f)
        n_windows = max(1, audio.shape[0] // window)
        for wi in range(n_windows):
            chunk = audio[wi * window : (wi + 1) * window]
            if chunk.shape[0] < window:
                chunk = np.pad(chunk, ((0, window - chunk.shape[0]), (0, 0)))
            name = f"{base}_{wi:04d}"
            pending.append(chunk)
            names.append(name)
            with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
                json.dump(meta, f)
            if len(pending) >= batch_size:
                flush()
    flush()
    print(f"encoded windows from {len(files)} files -> {out_dir}")


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("command", choices=["scan", "encode"])
    p.add_argument("--dataset-dir", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--sample-duration", type=float, default=10.0)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--segmented", action="store_true",
                   help="reference-exact latent pipeline (per-1s segment "
                        "normalization; needed for reference .pth parity)")
    p.add_argument("--codec-weights", default=None,
                   help="pretrained EnCodec-48k torch state_dict; without it "
                        "the codec is random-init and latents are noise")
    p.add_argument("--whole-clip", action="store_true",
                   help="whole-clip encoder pass (single get_emb graph) "
                        "instead of the batched-1s-chunk TPU fast path")
    args = p.parse_args()
    if args.command == "scan":
        scan(args.dataset_dir, args.out)
    else:
        encode(
            args.dataset_dir,
            args.out or os.path.join(args.dataset_dir, "latents"),
            sample_duration=args.sample_duration,
            batch_size=args.batch_size,
            segmented=args.segmented,
            codec_weights=args.codec_weights,
            chunked=not args.whole_clip,
        )


if __name__ == "__main__":
    main()
