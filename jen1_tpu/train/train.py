"""Training entrypoint.

Rebuild of reference train.py:14-131 (per-rank setup + training launch),
mesh-native: one process drives all local devices via jax.sharding (the
reference mp.spawn/DDP/NCCL stack — broken as written, SURVEY §2.2 — is
replaced by dp-sharded batches; multi-host runs call
`jax.distributed.initialize()` first).

CLI: python -m jen1_tpu.train.train --config config.json [--latents-dir ...]
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional

import jax
import numpy as np

from jen1_tpu.ckpt.checkpoint import CheckpointManager
from jen1_tpu.conditioning.conditioners import create_multi_conditioner
from jen1_tpu.config import Config
from jen1_tpu.data.dataset import (
    LatentDataset,
    MusicDataset,
    make_dataloader,
    train_test_split,
)
from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
from jen1_tpu.diffusion.vdm import create_variational_diffusion
from jen1_tpu.models.unet import unet_from_model_config
from jen1_tpu.parallel.mesh import make_mesh
from jen1_tpu.train.optim import make_lr_schedule
from jen1_tpu.train.trainer import UnifiedMultiTaskTrainer
from jen1_tpu.utils.logger import MetricLogger, get_logger


_CODEC = None


def _get_codec(config: Config):
    """Process-wide codec for on-the-fly wav->latent encoding. Loads
    config.codec_weights_path (warns loudly if unset — a random codec turns
    raw wavs into noise latents; reference loads pretrained EnCodec in its
    dataloader, dataset/dataloader.py:106-115)."""
    global _CODEC
    if _CODEC is None:
        from jen1_tpu.codec.model import make_codec

        _CODEC = make_codec(
            config.codec_weights_path, warn_context="training (wav->latent)"
        )
    return _CODEC


def build_trainer(config: Config, mesh=None, conditioner=None):
    model = unet_from_model_config(config.model_config)
    if config.diffusion_type == "gdm":
        diffusion = create_gaussian_diffusion(
            config.diffusion_config.gaussian_diffusion
        )
    else:
        diffusion = create_variational_diffusion(
            config.diffusion_config.variational_diffusion
        )
    if conditioner is None:
        conditioner = create_multi_conditioner(config.conditioner_config)
    if getattr(config, "lora_config", None) and config.lora_config.rank > 0:
        from jen1_tpu.train.lora import LoRATrainer

        return LoRATrainer(
            config, model, diffusion, conditioner=conditioner, mesh=mesh
        )
    return UnifiedMultiTaskTrainer(
        config, model, diffusion, conditioner=conditioner, mesh=mesh
    )


def run(
    config: Config,
    distributed: bool = False,
    max_steps: Optional[int] = None,
    profile: bool = False,
):
    if distributed:
        jax.distributed.initialize()

    logger = get_logger(config.log_dir)
    metrics_logger = MetricLogger(config.log_dir)
    pc = config.parallel_config
    mesh = make_mesh(dp=pc.dp, tp=pc.tp, sp=getattr(pc, "sp", 1))
    logger.info(f"mesh: {dict(mesh.shape)} over {len(jax.devices())} devices")

    dc = config.dataset_config
    if dc.latents_dir:
        dataset = LatentDataset(dc.latents_dir)
    else:
        dataset = MusicDataset(
            dataset_dir=dc.dataset_dir,
            sr=dc.sr,
            channels=dc.channels,
            min_duration=dc.min_duration,
            max_duration=dc.max_duration,
            sample_duration=dc.sample_duration,
            aug_shift=dc.aug_shift,
            durations_path=dc.durations_path,
            cumsum_path=dc.cumsum_path,
            audio_file_txt_path=dc.audio_file_txt_path,
        )
    train_ds, val_ds = train_test_split(dataset, dc.train_test_split, config.seed)
    logger.info(f"dataset: {len(train_ds)} train / {len(val_ds)} val windows")
    if len(train_ds) < dc.batch_size:
        raise ValueError(
            f"train split has {len(train_ds)} windows < batch_size "
            f"{dc.batch_size}: with drop_last the loader would yield nothing"
        )

    trainer = build_trainer(config, mesh=mesh)
    ckpt = CheckpointManager(config.save_dir) if config.save_dir else None
    lr_schedule = make_lr_schedule(config.optimizer_config)

    def encode(latents):
        if dc.latents_dir is None:
            codec = _get_codec(config)
            if config.codec_segmented_latents:
                latents = np.asarray(codec.encode_latent_segmented(latents))
            else:
                latents = np.asarray(codec.encode_latent(latents))
        return latents

    # State init from a template batch BEFORE the loader is created, so a
    # resume can fast-forward the iterator (deterministic resume: the
    # reference restarts its data order and best-loss tracking from scratch,
    # train.py:63-81; VERDICT r1 weak #7).
    probe, probe_meta = train_ds[0]
    template_batch = trainer.prepare_batch(
        encode(probe[None]).repeat(dc.batch_size, axis=0),
        [probe_meta] * dc.batch_size,
    )
    state = trainer.init_state(jax.random.PRNGKey(config.seed), template_batch)

    start_step = 0
    best_val = float("inf")
    if ckpt is not None and ckpt.latest_step() is not None:
        state, meta = ckpt.restore(template=state)
        start_step = int(state.step)
        best_val = float(meta.get("best_val", float("inf")))
        logger.info(f"resumed from step {start_step} (best_val {best_val:.4f})")

    # One batch is consumed per train_step and state.step counts train_steps,
    # so the iterator fast-forwards by exactly start_step batches; per-step
    # rngs and causal coin flips are pure functions of the global step — a
    # resumed run replays the unkilled trajectory.
    train_iter = make_dataloader(
        train_ds, dc.batch_size, shuffle=dc.shuffle, seed=config.seed,
        epochs=config.num_epoch, skip_batches=start_step,
    )
    rng = jax.random.PRNGKey(config.seed)

    if profile:
        # Warm BOTH causal-variant train-step compiles on the template batch
        # before tracing starts: a cold XLA compile inside the trace window
        # bloats the capture by orders of magnitude (the profiler records
        # every compiler event) without describing steady-state step time.
        # The compiles are needed for the run anyway; state is not advanced.
        from jen1_tpu.train.tasks import task_is_causal

        for tg_causal in (False, True):
            flags = tuple(task_is_causal(t, tg_causal) for t in trainer.tasks)
            if flags not in trainer._step_cache:
                # AOT-compile (no execution: the step donates state) and cache
                # the Compiled directly — .lower().compile() does not populate
                # the jit wrapper's own dispatch cache.
                trainer._step_cache[flags] = (
                    trainer._build_train_step(flags)
                    .lower(state, template_batch, jax.random.PRNGKey(0))
                    .compile()
                )

    for step_idx, (latents, metadata) in enumerate(train_iter):
        gstep = start_step + step_idx
        batch = trainer.prepare_batch(encode(latents), metadata)
        t0 = time.time()
        if profile and step_idx == 2:
            from jen1_tpu.utils.profiling import start_trace

            start_trace(config.log_dir or "profile")
        state, m = trainer.train_step(
            state, batch, jax.random.fold_in(rng, gstep),
            np.random.default_rng((config.seed, gstep)),
        )
        if profile and step_idx == 4:
            from jen1_tpu.utils.profiling import stop_trace

            jax.tree.map(lambda x: x.block_until_ready(), m)
            stop_trace()
        step = int(state.step)
        if step_idx % max(1, config.grad_accum_every) == 0:
            scalars = {k: float(v) for k, v in m.items()}
            scalars["step_time"] = time.time() - t0
            scalars["lr"] = float(lr_schedule(step // config.grad_accum_every))
            metrics_logger.log(step, scalars)
            logger.info(
                f"step {step} loss {scalars['loss/train']:.4f} "
                f"({scalars['step_time']:.2f}s)"
            )
        if config.eval_interval and step and step % config.eval_interval == 0:
            val_iter = make_dataloader(
                val_ds, dc.batch_size, shuffle=False, epochs=1, prefetch=0
            )
            val_metrics = trainer.evaluate(
                state,
                ((encode(lat), meta) for lat, meta in val_iter),
                rng,
            )
            metrics_logger.log(step, val_metrics)
            val_loss = val_metrics.get("loss/val", float("inf"))
            if ckpt is not None and val_loss < best_val:
                best_val = val_loss
                ckpt.save(step, state, loss=val_loss,
                          learning_rate=config.optimizer_config.lr,
                          extra_meta={"best_val": best_val})
                logger.info(f"saved best checkpoint at step {step} (val {val_loss:.4f})")
        if max_steps is not None and step_idx + 1 >= max_steps:
            break

    metrics_logger.close()
    return state


def main():
    from jen1_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default=None, help="JSON config path")
    p.add_argument("--latents-dir", default=None)
    p.add_argument("--dataset-dir", default=None)
    p.add_argument("--save-dir", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--dp", type=int, default=None, help="data-parallel size")
    p.add_argument("--tp", type=int, default=None, help="tensor-parallel size")
    p.add_argument("--sp", type=int, default=None, help="sequence-parallel size")
    p.add_argument("--fsdp", action="store_true",
                   help="ZeRO-3 param/optimizer sharding over dp")
    p.add_argument("--lora-rank", type=int, default=None,
                   help="train a rank-r LoRA adapter instead of full params")
    p.add_argument("--lora-alpha", type=float, default=None,
                   help="LoRA merge scale numerator (scale = alpha/rank)")
    p.add_argument("--lora-base-ckpt", default=None,
                   help="frozen base weights: orbax run dir or reference .pth")
    p.add_argument("--latents-upload-dtype", default=None,
                   choices=("float32", "bfloat16"),
                   help="host->device dtype for the latent batch; "
                        "'bfloat16' halves the per-step upload (the "
                        "sustained-step bound on bandwidth-constrained "
                        "hosts, TRAIN_RUN_TPU.md)")
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of steps 2-4 into log_dir")
    args = p.parse_args()

    config = Config.from_json(args.config) if args.config else Config()
    if args.latents_dir:
        config.dataset_config.latents_dir = args.latents_dir
    if args.dataset_dir:
        config.dataset_config.dataset_dir = args.dataset_dir
    if args.latents_upload_dtype:
        config.dataset_config.latents_upload_dtype = args.latents_upload_dtype
    if args.save_dir:
        config.save_dir = args.save_dir
    if args.log_dir:
        config.log_dir = args.log_dir
    if args.dp is not None:
        config.parallel_config.dp = args.dp
    if args.tp is not None:
        config.parallel_config.tp = args.tp
    if args.sp is not None:
        config.parallel_config.sp = args.sp
    if args.fsdp:
        config.parallel_config.fsdp = True
    if args.lora_rank is not None:
        config.lora_config.rank = args.lora_rank
    if args.lora_alpha is not None:
        config.lora_config.alpha = args.lora_alpha
    if args.lora_base_ckpt is not None:
        config.lora_config.base_ckpt = args.lora_base_ckpt
    run(config, distributed=args.distributed, max_steps=args.max_steps,
        profile=args.profile)


if __name__ == "__main__":
    main()
