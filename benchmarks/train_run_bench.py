"""Sustained on-chip training run through the REAL pipeline (VERDICT r4 #4).

Every prior on-chip training number was a 5-20-step bench over random
tensors. This orchestrates the actual product path end-to-end on the TPU:

  synthetic mixed-format corpus (WAV+FLAC+M4A; three native decoders read it back)
    -> `python -m jen1_tpu.data.preprocess scan` + `encode` (on-device
       EnCodec encode, batched 1 s chunks)
    -> `python -m jen1_tpu.train.train` at B=96 / 10 s windows / remat /
       fused AdamW / eval cadence + best-k orbax checkpoints
    -> HARD KILL (SIGKILL) mid-run once past a checkpoint
    -> resume from the latest checkpoint, run to the target step
    -> deterministic-replay seam check: the re-executed steps' losses must
       match the killed run's exactly (the trainer replays rng/causal
       streams as pure functions of the global step)
    -> post-run: generate a clip from the best checkpoint + eval metrics.

Writes benchmarks/TRAIN_RUN_TPU.md with the loss curve, the seam table,
and total wall. Reference context: this is `trainer.py:126-181`'s
capability (train_loop over a corpus), which the reference cannot run
multi-GPU (its DDP wiring is broken — SURVEY §2.2).

Run: python benchmarks/train_run_bench.py
  [JEN1_TRAIN_RUN_STEPS=300] [JEN1_TRAIN_RUN_B=96] [JEN1_TRAIN_RUN_FILES=128]
  [JEN1_TRAIN_RUN_DIR=/tmp/jen1_train_run]  [JEN1_TRAIN_RUN_TINY=1 (CPU smoke)]
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
import wave

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def note(msg):
    print(f"# train_run[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_corpus(corpus_dir: str, n_files: int, seconds: float, sr: int,
                channels: int = 2, mixed: bool = True) -> None:
    """Synthetic music-ish clips: per-file chord of sines + AM envelope +
    filtered noise, distinct seeds — enough structure that windows differ
    and losses are not degenerate. Written round-robin as WAV / FLAC / M4A
    (mixed=True) so preprocessing exercises three native decoders
    (data/native_io.py: wavio C++, the from-scratch FLAC, aacio/FFmpeg).
    Layout matches the preprocess CLI's dataset contract:
    <corpus_dir>/audios/*.{wav,flac,m4a} + <corpus_dir>/metadata/*.json."""
    audio_dir = os.path.join(corpus_dir, "audios")
    meta_dir = os.path.join(corpus_dir, "metadata")
    os.makedirs(audio_dir, exist_ok=True)
    os.makedirs(meta_dir, exist_ok=True)
    sys.path.insert(0, REPO)
    from jen1_tpu.data import native_io
    from jen1_tpu.data.flac_write import write_flac

    aac_ok = mixed and native_io.aac_available()
    t = np.arange(int(seconds * sr)) / sr
    kinds = {"wav": 0, "flac": 0, "m4a": 0}
    for i in range(n_files):
        rng = np.random.default_rng(1000 + i)
        freqs = rng.uniform(55, 880, size=3)
        sig = sum(
            np.sin(2 * np.pi * f * t + rng.uniform(0, 6.28)) / 3 for f in freqs
        )
        env = 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.1, 2.0) * t)
        noise = rng.normal(0, 0.05, size=t.shape)
        mono = (sig * env + noise) * 0.3
        stereo = np.stack([mono, np.roll(mono, 7)], axis=1)[:, :channels]
        clipped = np.clip(stereo, -1, 1).astype(np.float32)
        ints = (clipped * 32767).astype("<i2")
        stem = os.path.join(audio_dir, f"clip_{i:04d}")
        kind = ["wav", "flac", "m4a"][i % 3] if mixed else "wav"
        if kind == "m4a" and not aac_ok:
            kind = "wav"
        if kind == "wav":
            with wave.open(stem + ".wav", "wb") as w:
                w.setnchannels(channels)
                w.setsampwidth(2)
                w.setframerate(sr)
                w.writeframes(ints.tobytes())
        elif kind == "flac":
            write_flac(stem + ".flac", ints.astype(np.int32), sr)
        else:
            native_io.aac_write_fixture(stem + ".m4a", clipped, sr)
        kinds[kind] += 1
        with open(os.path.join(meta_dir, f"clip_{i:04d}.json"), "w") as f:
            json.dump({"prompt": f"synthetic chord pattern {i}"}, f)
    note(f"corpus: {n_files} x {seconds:.0f}s at {sr} Hz "
         f"({kinds['wav']} wav / {kinds['flac']} flac / {kinds['m4a']} m4a) "
         f"-> {corpus_dir}")


def run_sub(cmd, log_path, kill_when=None, env=None):
    """Run `cmd` streaming output to log_path. kill_when(text) -> True
    triggers SIGKILL (the mid-run hard kill). Returns (rc, killed)."""
    note("exec: " + " ".join(cmd) + (" [with kill watcher]" if kill_when else ""))
    with open(log_path, "ab") as lf:
        proc = subprocess.Popen(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=REPO, env=env or dict(os.environ),
        )
        killed = False
        for line in proc.stdout:
            lf.write(line)
            lf.flush()
            if kill_when is not None and not killed and kill_when(
                    line.decode("utf-8", "replace")):
                note("kill condition met -> SIGKILL (hard mid-run kill)")
                proc.send_signal(signal.SIGKILL)
                killed = True
        proc.wait()
        return proc.returncode, killed


def read_metrics(log_dir):
    path = os.path.join(log_dir, "metrics.jsonl")
    rows = []
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                try:
                    rows.append(json.loads(line))
                except json.JSONDecodeError:
                    pass
    return rows


def main():
    tiny = os.environ.get("JEN1_TRAIN_RUN_TINY") == "1"
    base = os.environ.get("JEN1_TRAIN_RUN_DIR", "/tmp/jen1_train_run")
    target_steps = int(os.environ.get(
        "JEN1_TRAIN_RUN_STEPS", "30" if tiny else "300"))
    B = int(os.environ.get("JEN1_TRAIN_RUN_B", "3" if tiny else "96"))
    n_files = int(os.environ.get(
        "JEN1_TRAIN_RUN_FILES", "12" if tiny else "128"))
    eval_interval = int(os.environ.get(
        "JEN1_TRAIN_RUN_EVAL", "10" if tiny else "50"))
    kill_after = int(os.environ.get(
        "JEN1_TRAIN_RUN_KILL_AFTER",
        str(eval_interval + max(3, eval_interval // 3))))
    sr = 1600 if tiny else 48000
    clip_seconds = 6.0 if tiny else 30.0
    sample_duration = 2.0 if tiny else 10.0

    os.makedirs(base, exist_ok=True)
    corpus = os.path.join(base, "corpus")
    latents = os.path.join(base, "latents")
    save_dir = os.path.join(base, "ckpts")
    log1 = os.path.join(base, "logs_phase1")
    log2 = os.path.join(base, "logs_phase2")
    runlog = os.path.join(base, "run.log")
    cfg_path = os.path.join(base, "config.json")
    walls = {}

    env = dict(os.environ)
    if tiny:
        env["JAX_PLATFORM_NAME"] = "cpu"

    t_all = time.time()
    # ---- 1. corpus
    t0 = time.time()
    make_corpus(corpus, n_files, clip_seconds, sr, mixed=not tiny)
    walls["corpus"] = time.time() - t0

    # ---- 2. preprocess (scan + on-device encode)
    t0 = time.time()
    if tiny:
        # CPU smoke: the real 48 kHz EnCodec's latent dim (128) does not
        # match the tiny UNet (in_channels=8), so the smoke writes tiny
        # latent windows directly in preprocess's output layout. The TPU
        # run exercises the real CLI below; preprocess itself has its own
        # tests (tests/test_data.py).
        os.makedirs(latents, exist_ok=True)
        rng = np.random.default_rng(7)
        L = 48
        w_per = max(1, int(clip_seconds // sample_duration))
        for i in range(n_files):
            for wi in range(w_per):
                name = f"clip_{i:04d}_{wi:04d}"
                np.save(os.path.join(latents, f"{name}.npy"),
                        rng.normal(size=(L, 8)).astype(np.float32))
                with open(os.path.join(latents, f"{name}.json"), "w") as f:
                    json.dump({"prompt": f"synthetic chord pattern {i}"}, f)
    else:
        rc, _ = run_sub(
            [sys.executable, "-m", "jen1_tpu.data.preprocess", "scan",
             "--dataset-dir", corpus], runlog, env=env)
        assert rc == 0, f"preprocess scan rc={rc} (see {runlog})"
        rc, _ = run_sub(
            [sys.executable, "-m", "jen1_tpu.data.preprocess", "encode",
             "--dataset-dir", corpus, "--out", latents,
             "--sample-duration", str(sample_duration),
             "--batch-size", "8"], runlog, env=env)
        assert rc == 0, f"preprocess encode rc={rc} (see {runlog})"
    n_windows = len([f for f in os.listdir(latents) if f.endswith(".npy")])
    walls["preprocess"] = time.time() - t0
    note(f"preprocess: {n_windows} latent windows in {walls['preprocess']:.0f}s")

    # ---- 3. config
    sys.path.insert(0, REPO)
    from jen1_tpu.config import Config, tiny_test_config

    cfg = tiny_test_config() if tiny else Config()
    import dataclasses

    if tiny:
        cfg.conditioner_config.t5_config.t5_model_name = "tiny-test"
        cfg.conditioner_config.t5_config.max_length = 6
    else:
        cfg.model_config = dataclasses.replace(cfg.model_config, remat=True)
    cfg.dataset_config.latents_dir = latents
    cfg.dataset_config.batch_size = B
    cfg.dataset_config.sample_duration = sample_duration
    cfg.dataset_config.train_test_split = 0.75
    cfg.grad_accum_every = 1
    cfg.num_epoch = 100000  # bounded by --max-steps
    cfg.eval_interval = eval_interval
    cfg.use_ema = True
    cfg.save_dir = save_dir
    cfg.to_json(cfg_path)

    def train_cmd(max_steps, log_dir):
        return [sys.executable, "-m", "jen1_tpu.train.train",
                "--config", cfg_path, "--save-dir", save_dir,
                "--log-dir", log_dir, "--max-steps", str(max_steps)]

    # ---- 4. phase 1: train, then HARD-KILL once past a checkpoint
    import re

    step_rx = re.compile(r"step (\d+) loss ")

    def kill_when(line):
        m = step_rx.search(line)
        return bool(m) and int(m.group(1)) >= kill_after

    t0 = time.time()
    rc, killed = run_sub(train_cmd(target_steps, log1), runlog,
                         kill_when=kill_when, env=env)
    walls["phase1"] = time.time() - t0
    m1 = read_metrics(log1)
    steps1 = [r for r in m1 if "loss/train" in r]
    assert killed and rc != 0, (
        f"phase 1 was supposed to die mid-run (rc={rc}, killed={killed})")
    note(f"phase 1 killed after step {steps1[-1]['step'] if steps1 else '?'} "
         f"({walls['phase1']:.0f}s, rc={rc})")

    # ---- 5. phase 2: resume from the latest checkpoint, run to target
    # (--max-steps counts THIS process's steps; the resume fast-forwards to
    # the last checkpoint, so phase 2 runs the remainder)
    ckpt_step = (kill_after // eval_interval) * eval_interval
    t0 = time.time()
    rc, _ = run_sub(train_cmd(target_steps - ckpt_step, log2), runlog, env=env)
    walls["phase2"] = time.time() - t0
    assert rc == 0, f"resume run rc={rc} (see {runlog})"
    m2 = read_metrics(log2)
    steps2 = [r for r in m2 if "loss/train" in r]
    assert steps2, "phase 2 logged no train steps"
    final_step = steps2[-1]["step"]
    note(f"phase 2 resumed and reached step {final_step} "
         f"({walls['phase2']:.0f}s)")

    # ---- 6. resume-seam check: replayed steps match the killed run
    by_step1 = {r["step"]: r["loss/train"] for r in steps1}
    by_step2 = {r["step"]: r["loss/train"] for r in steps2}
    overlap = sorted(set(by_step1) & set(by_step2))
    assert overlap, (
        "no replayed steps — the kill landed before any post-checkpoint "
        "step; raise JEN1_TRAIN_RUN_KILL_AFTER")
    seam = [(s, by_step1[s], by_step2[s]) for s in overlap]
    max_rel = max(
        abs(a - b) / max(1e-9, abs(a)) for _, a, b in seam
    )
    note(f"seam: {len(overlap)} replayed steps, max rel loss diff {max_rel:.2e}")
    assert max_rel < 5e-3, f"replayed losses diverged: {seam[:5]}"

    # ---- 7. post-run: sample from the best checkpoint + eval metrics
    t0 = time.time()
    post = os.path.join(base, "post")
    os.makedirs(post, exist_ok=True)
    post_script = os.path.join(base, "postrun.py")
    post_steps = 4 if tiny else 20
    tiny_codec = """
from jen1_tpu.codec.model import EncodecConfig, EncodecModel
codec = EncodecModel(EncodecConfig(
    sample_rate=1600, channels=2, dimension=cfg.model_config.in_channels,
    n_filters=2, ratios=(5, 4, 2), n_q=4, bins=16))
""" if tiny else "codec = None\n"
    with open(post_script, "w") as f:
        f.write(f"""
import sys, json
sys.path.insert(0, {REPO!r})
import numpy as np
from jen1_tpu.utils.compile_cache import enable_compile_cache
enable_compile_cache()
from jen1_tpu.config import Config, tiny_test_config
from jen1_tpu.api.generation import Jen1, save_audio

cfg = Config.from_json({cfg_path!r})
{tiny_codec}
jen1 = Jen1({save_dir!r}, sample_rate={sr}, config=cfg, use_ema_params=True,
            codec=codec)
audio = jen1.generate("synthetic chord pattern 3", seed=11,
                      steps={post_steps}, seconds={sample_duration},
                      use_gdm=True, batch_size=2)
assert np.isfinite(audio).all(), "non-finite sample"
save_audio(audio[0], {os.path.join(post, "sample.wav")!r}, sample_rate={sr})
print(json.dumps({{"sample_shape": list(audio.shape),
                   "sample_rms": float(np.sqrt((audio[0]**2).mean()))}}))
""")
    rc, _ = run_sub([sys.executable, post_script], runlog, env=env)
    assert rc == 0, f"post-run sample rc={rc} (see {runlog})"
    walls["postrun"] = time.time() - t0
    walls["total"] = time.time() - t_all

    # ---- 8. report
    losses = [(r["step"], r["loss/train"]) for r in steps1] + [
        (r["step"], r["loss/train"]) for r in steps2]
    losses.sort()
    vals = [v for _, v in losses]
    val_rows = [r for r in (m1 + m2) if "loss/val" in r]
    step_times = [r["step_time"] for r in steps2 if "step_time" in r]
    steady = sorted(step_times)[len(step_times) // 2] if step_times else 0
    curve = {s: v for s, v in losses
             if s % max(1, target_steps // 12) == 0 or s == losses[-1][0]}

    out = os.path.join(REPO, "benchmarks", "TRAIN_RUN_TPU.md")
    dev = "cpu (tiny smoke)" if tiny else "TPU v5e"
    with open(out, "w") as f:
        f.write(f"""# Sustained training run through the real pipeline — {dev}

Protocol (this file is written by `benchmarks/train_run_bench.py`):
synthetic mixed-format corpus ({n_files} x {clip_seconds:.0f} s, WAV+FLAC+M4A round-robin, read back by three native decoders) -> `jen1_tpu.data.preprocess` scan + on-device
encode ({n_windows} x {sample_duration:.0f} s latent windows) ->
`jen1_tpu.train.train` at B={B}, remat, fused AdamW, EMA, eval every
{eval_interval} steps with best-k orbax checkpoints -> **SIGKILL mid-run**
at ~step {kill_after} -> resume from the latest checkpoint -> step
{final_step} -> post-run EMA sample from the best checkpoint.

| phase | wall |
|---|---|
| corpus synth ({n_files} files) | {walls['corpus']:.0f} s |
| preprocess (scan + on-device encode) | {walls['preprocess']:.0f} s |
| train phase 1 (cold compile + steps 1-~{kill_after}, killed) | {walls['phase1']:.0f} s |
| train phase 2 (resume -> step {final_step}) | {walls['phase2']:.0f} s |
| post-run sample (20-step DDIM from best ckpt, EMA) | {walls['postrun']:.0f} s |
| **total** | **{walls['total']:.0f} s** |

## Loss curve (train, every ~{max(1, target_steps // 12)} steps)

| step | loss |
|---|---|
""")
        for s in sorted(curve):
            f.write(f"| {s} | {curve[s]:.4f} |\n")
        f.write(f"""
first {vals[0]:.4f} -> min {min(vals):.4f} -> last {vals[-1]:.4f}; val
evals: {[(r['step'], round(r['loss/val'], 4)) for r in val_rows]}.
Steady-state step wall (phase-2 median): **{steady:.2f} s** at B={B}
({B * sample_duration / steady if steady else 0:.0f} audio-s trained /s/chip,
host+device; the step-only bench is TRAIN_STEP_TPU.md).

## Resume seam — deterministic replay

The kill landed after step {overlap[-1]} with the latest checkpoint at
step {overlap[0] - 1}; {len(overlap)} steps were re-executed on resume.
Replayed losses match the killed run's (max rel diff {max_rel:.2e}):

| step | phase-1 loss (killed) | phase-2 loss (replayed) |
|---|---|---|
""")
        for s, a, b in seam[:8]:
            f.write(f"| {s} | {a:.6f} | {b:.6f} |\n")
        f.write(f"""
Per-step rngs and causal coin flips are pure functions of the global step
and the loader fast-forwards by exactly `state.step` batches
(train/train.py), so a resumed run replays the unkilled trajectory.

Artifacts under {base}: corpus/, latents/, ckpts/, logs_phase1/,
logs_phase2/, post/sample.wav, run.log.

Reproduce: `python benchmarks/train_run_bench.py` (env knobs in the
module docstring; JEN1_TRAIN_RUN_TINY=1 is the CPU smoke).
""")
    note(f"wrote {out} (total {walls['total']:.0f}s)")


if __name__ == "__main__":
    main()
