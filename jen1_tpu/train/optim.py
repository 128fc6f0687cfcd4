"""Optimizer factory: AdamW + global-norm clipping + LinearLR warmup.

Reference: train.py:56-60 (AdamW lr=3e-5, betas=(0.9, 0.95), wd=0.1),
trainer.py:146 (clip_grad_norm 0.7), train.py:84 (torch LinearLR with default
start_factor=1/3, end_factor=1.0, total_iters=5 — stepped per optimizer step),
trainer.py:139-150 (gradient accumulation every `grad_accum_every`).
"""

from __future__ import annotations

import optax


def make_lr_schedule(opt_config) -> optax.Schedule:
    base = opt_config.lr
    start = base * opt_config.lr_start_factor
    end = base * opt_config.lr_end_factor
    warm = optax.linear_schedule(
        init_value=start, end_value=end, transition_steps=opt_config.lr_total_iters
    )
    return optax.join_schedules(
        [warm, optax.constant_schedule(end)],
        boundaries=[opt_config.lr_total_iters],
    )


def make_optimizer(
    opt_config, grad_accum_every: int = 1, flatten_ok: bool = True
) -> optax.GradientTransformation:
    """flatten_ok: the caller must pass False when the optimizer state has
    to carry per-parameter shardings (tp / fsdp meshes) — a flattened moment
    vector cannot (trainer.__init__ handles this)."""
    tx = optax.chain(
        optax.clip_by_global_norm(opt_config.grad_clip),
        optax.adamw(
            learning_rate=make_lr_schedule(opt_config),
            b1=opt_config.beta_1,
            b2=opt_config.beta_2,
            weight_decay=opt_config.weight_decay,
        ),
    )
    if getattr(opt_config, "skip_nonfinite_updates", True):
        # Failure containment for bf16 training (SURVEY §5: the reference has
        # none): a non-finite gradient skips the update (params/moments
        # untouched) instead of poisoning the state; errors only after many
        # consecutive bad steps.
        tx = optax.apply_if_finite(tx, max_consecutive_errors=100)
    if grad_accum_every > 1:
        # Micro-batch gradient accumulation: updates become no-ops except on
        # every k-th step, where the averaged gradient is applied.
        tx = optax.MultiSteps(tx, every_k_schedule=grad_accum_every)
    if flatten_ok and getattr(opt_config, "flatten_optimizer", False):
        # Run ALL elementwise optimizer work (clip, Adam moments, weight
        # decay, finite-check, accumulation) over ONE concatenated vector
        # instead of per-leaf kernels. Identical math up to fp reassociation
        # of the global norm; optimizer-state pytree layout changes, so
        # checkpoints are not interchangeable across this flag. Off by
        # default: the v5e A/B (benchmarks/TRAIN_STEP_TPU.md) measured it
        # SLOWER at B=3 (+23 ms — the flat<->tree grad/update copies cost
        # more than the 285 per-leaf launches they remove) and neutral at
        # B=96.
        tx = optax.flatten(tx)
    return tx
