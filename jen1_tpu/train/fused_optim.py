"""Fused AdamW update: clip + moments + bias correction + weight decay +
parameter apply in ONE expression per leaf.

Why (benchmarks/TRAIN_STEP_TPU.md, fixed-overhead attribution): the optax
chain `clip_by_global_norm -> adamw -> apply_updates` materializes an
intermediate *updates tree* between every stage, so the 303.5 M-param AdamW
pass costs ~15-20 full HBM sweeps (~38 ms of the 95 ms fixed step overhead
on v5e). This model is HBM-bound (reference hot loop being replaced:
/root/reference/trainer.py:126-213 — torch AdamW + clip_grad_norm). Writing
new_mu/new_nu/new_p as one fused expression per leaf lets XLA emit one loop
per leaf that reads (g, mu, nu, p) and writes (mu, nu, p): 8 sweeps
including the global-norm read, the HBM floor for exact AdamW semantics.

Equivalences and deliberate differences vs the optax chain in optim.py:
  * identical math: global-norm clip (min(1, clip/||g||)), Adam moments with
    bias correction at count+1, decoupled weight decay, lr schedule at
    count. Parity-tested leaf-for-leaf against the optax chain
    (tests/test_fused_optim.py).
  * non-finite containment folds into the clip scale: any non-finite grad
    makes the global norm non-finite, the scale becomes 0 and the moments/
    params/count keep their previous values (optax.apply_if_finite walks
    every grad leaf separately — same trigger in practice, one fewer HBM
    sweep). A norm OVERFLOW (finite grads whose squared sum exceeds f32)
    also skips — conservative.
  * the gradient global norm is returned so the trainer's metrics reuse it
    instead of re-reading all grads (optax.global_norm is its own sweep).
  * grad accumulation (MultiSteps) is NOT folded in: the trainer uses the
    fused path only when grad_accum_every == 1 (the v5e recipe — big device
    batch instead of accumulation) and falls back to the optax chain
    otherwise.
  * optimizer state layout is (count, notfinite_count, mu, nu) — not
    interchangeable with optax chain checkpoints (ckpt restore is
    shape-tolerant; the flag is part of the config so a run never mixes
    them silently).

Sharding-transparent: pure jnp elementwise per leaf — works replicated and
under tp/fsdp-sharded params (moments inherit the param shardings;
zeros_like follows input sharding).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class FusedAdamWState(NamedTuple):
    count: jnp.ndarray  # int32: applied update count
    notfinite_count: jnp.ndarray  # int32: consecutive skipped updates
    mu: Any
    nu: Any


def fused_adamw_init(params) -> FusedAdamWState:
    zeros = lambda p: jnp.zeros_like(p)  # noqa: E731
    return FusedAdamWState(
        count=jnp.zeros((), jnp.int32),
        notfinite_count=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(zeros, params),
        nu=jax.tree.map(zeros, params),
    )


def fused_adamw_apply(
    grads,
    state: FusedAdamWState,
    params,
    *,
    lr,
    b1: float,
    b2: float,
    eps: float,
    weight_decay: float,
    clip: float,
    max_consecutive_errors: int = 100,
):
    """One fused AdamW step. Returns (new_params, new_state, grad_norm).

    lr may be a float or an optax schedule evaluated at state.count.
    """
    gnorm2 = sum(
        jnp.sum(jnp.square(g.astype(jnp.float32)))
        for g in jax.tree.leaves(grads)
    )
    gnorm = jnp.sqrt(gnorm2)
    finite = jnp.isfinite(gnorm)
    # clip scale; 0 when non-finite => moments/params unchanged below
    scale = jnp.where(
        finite, jnp.minimum(1.0, clip / jnp.maximum(gnorm, 1e-30)), 0.0
    )
    lr_t = lr(state.count) if callable(lr) else lr
    t = (state.count + 1).astype(jnp.float32)
    bc1 = 1.0 - b1**t
    bc2 = 1.0 - b2**t
    # fold the per-step scalars together so the leaf expression stays lean
    one_m_b1 = (1.0 - b1) * scale
    one_m_b2 = (1.0 - b2) * scale * scale

    def leaf(p, g, mu, nu):
        g = g.astype(jnp.float32)
        mu_new = b1 * mu + one_m_b1 * g
        nu_new = b2 * nu + one_m_b2 * (g * g)
        upd = (mu_new / bc1) / (jnp.sqrt(nu_new / bc2) + eps)
        p32 = p.astype(jnp.float32)
        p_new = p32 - lr_t * (upd + weight_decay * p32)
        # non-finite step: keep everything (scale=0 already freezes the
        # moments; the where freezes the param against the wd/lr terms)
        p_new = jnp.where(finite, p_new, p32)
        mu_new = jnp.where(finite, mu_new, mu)
        nu_new = jnp.where(finite, nu_new, nu)
        return p_new.astype(p.dtype), mu_new, nu_new

    out = jax.tree.map(leaf, params, grads, state.mu, state.nu)
    treedef = jax.tree.structure(params)
    new_params = jax.tree.map(lambda _, o: o[0], params, out)
    new_mu = jax.tree.map(lambda _, o: o[1], params, out)
    new_nu = jax.tree.map(lambda _, o: o[2], params, out)
    del treedef
    nf = jnp.where(finite, 0, state.notfinite_count + 1)
    # mirror optax.apply_if_finite's error bound: after max_consecutive
    # non-finite steps, poison the count so training visibly diverges
    # instead of silently spinning (checked host-side by the train loop).
    new_state = FusedAdamWState(
        count=state.count + jnp.where(finite, 1, 0),
        notfinite_count=nf,
        mu=new_mu,
        nu=new_nu,
    )
    return new_params, new_state, gnorm
