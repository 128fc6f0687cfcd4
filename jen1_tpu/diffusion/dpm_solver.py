"""DPM-Solver++(2M) sampler over the discrete GDM schedule.

Beyond-reference acceleration (the reference only has DDPM/DDIM,
jen1/diffusion/gdm/gdm.py:153-225): a second-order multistep ODE solver in
data-prediction form (Lu et al., DPM-Solver++), which reaches 100-step-DDIM
quality in ~20-30 model calls — a direct 3-5x cut of the dominating
inference cost (each step is a CFG-doubled UNet forward).

Implemented as one lax.scan (single XLA program, zero host round-trips) over
the same timestep grid as `GaussianDiffusion.ddim_sample`, reusing its
model_predictions (objective handling + CFG plumbing + clip). Deterministic
(probability-flow ODE): both this and eta=0 DDIM converge to the same
solution as steps grow, which the tests exploit.

Notation (discrete index t into alphas_cumprod):
  alpha_t = sqrt(acp[t]); sigma_t = sqrt(1 - acp[t]); lambda_t = log(alpha/sigma)
Update s -> t (h = lambda_t - lambda_s > 0; m = predicted x0):
  1st order: x_t = (sigma_t/sigma_s) x_s - alpha_t (e^{-h} - 1) m_s
  2M:        D   = m_s + (m_s - m_prev) / (2 r),  r = h_prev / h
             x_t = (sigma_t/sigma_s) x_s - alpha_t (e^{-h} - 1) D
Final step (t < 0): x = m_s (data-prediction limit, as in DDIM).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def dpm_solver_pp_2m(
    gdm,
    model_fn,
    shape: Tuple[int, ...],
    conditioning: Dict[str, Any],
    rng: jax.Array,
    *,
    causal: bool = False,
    init_data: Optional[jnp.ndarray] = None,
    clip_denoised: bool = True,
    encoder_reuse: int = 1,
) -> jnp.ndarray:
    """Sample with DPM-Solver++(2M). `gdm` is a GaussianDiffusion (supplies
    the schedule, objective conversion, and CFG model call); the number of
    model calls is gdm.sampling_timesteps.

    encoder_reuse > 1 composes Faster-Diffusion encoder propagation
    (arXiv:2312.09608) with the solver: block-unrolled like
    GaussianDiffusion.ddim_sample — one full UNet forward per block of
    `encoder_reuse` steps, decoder-only forwards in between (the cache stays
    local to the scan iteration; carrying it costs more HBM than it saves)."""
    batch = shape[0]
    acp = gdm.alphas_cumprod
    alpha = jnp.sqrt(acp)
    sigma = jnp.sqrt(1.0 - acp)
    lam = jnp.log(alpha) - jnp.log(sigma)

    steps = gdm.sampling_timesteps
    times = np.linspace(-1, gdm.num_timesteps - 1, num=steps + 1).astype(
        np.int32
    )[::-1]
    time_pairs = jnp.asarray(np.stack([times[:-1], times[1:]], axis=1))

    rng_init, rng_loop = jax.random.split(rng)
    x0 = jax.random.normal(rng_init, shape, jnp.float32)
    if init_data is not None:
        x0 = x0 + init_data.astype(jnp.float32)

    def solver_update(x, m, m_prev, lam_prev, i, t_s, t_t):
        """One 2M update; returns (x_new, lam_s). Falls back to 1st order on
        the very first call (i == 0)."""
        t_safe = jnp.maximum(t_t, 0)
        lam_s, lam_t = lam[t_s], lam[t_safe]
        h = lam_t - lam_s
        h_prev = lam_s - lam_prev
        r = h_prev / jnp.maximum(h, 1e-12)
        corr = (m - m_prev) / jnp.maximum(2.0 * r, 1e-12)
        d = jnp.where(i > 0, m + corr, m)
        x_next = (sigma[t_safe] / sigma[t_s]) * x - alpha[t_safe] * (
            jnp.exp(-h) - 1.0
        ) * d
        return jnp.where(t_t < 0, m, x_next), lam_s

    m0 = jnp.zeros_like(x0)
    lam0 = jnp.zeros((), jnp.float32)
    i0 = jnp.zeros((), jnp.int32)

    if encoder_reuse > 1:
        k = int(encoder_reuse)
        n_blocks, tail = divmod(steps, k)
        main = time_pairs[: n_blocks * k].reshape(n_blocks, k, 2)

        def call(x, t_s, i, enc_cache):
            step_rng = jax.random.fold_in(rng_loop, i)
            time_cond = jnp.full((batch,), t_s, dtype=jnp.int32)
            model_out, cache = gdm._call_model(
                model_fn, x, time_cond, conditioning, causal=causal,
                rng=step_rng, dropout=gdm.dropout_during_sampling,
                extra={
                    "encoder_cache": enc_cache,
                    "return_encoder_cache": True,
                },
            )
            _, m = gdm._predictions_from_out(
                model_out, x, time_cond, clip_denoised
            )
            return m, cache

        def block_body(carry, block):  # block: (k, 2)
            x, m_prev, lam_prev, i = carry
            cache = None
            for j in range(k):  # static unroll
                t_s, t_t = block[j, 0], block[j, 1]
                m, cache = call(x, t_s, i + j, cache if j else None)
                x, lam_prev = solver_update(
                    x, m, m_prev, lam_prev, i + j, t_s, t_t
                )
                m_prev = m
            return (x, m_prev, lam_prev, i + k), 0

        (x, m_prev, lam_prev, i), _ = jax.lax.scan(
            block_body, (x0, m0, lam0, i0), main
        )
        for r_idx in range(tail):  # remainder: full forwards
            t_s, t_t = time_pairs[n_blocks * k + r_idx]
            m, _ = call(x, t_s, i + r_idx, None)
            x, lam_prev = solver_update(
                x, m, m_prev, lam_prev, i + r_idx, t_s, t_t
            )
            m_prev = m
        return x

    def body(carry, inputs):
        x, m_prev, lam_prev, i = carry
        t_s, t_t = inputs[0], inputs[1]
        step_rng = jax.random.fold_in(rng_loop, i)
        time_cond = jnp.full((batch,), t_s, dtype=jnp.int32)
        _, m = gdm.model_predictions(
            model_fn, x, time_cond, conditioning,
            clip_x_start=clip_denoised, causal=causal, rng=step_rng,
            dropout=gdm.dropout_during_sampling,
        )
        x_new, lam_s = solver_update(x, m, m_prev, lam_prev, i, t_s, t_t)
        return (x_new, m, lam_s, i + 1), 0

    (x, _, _, _), _ = jax.lax.scan(
        body, (x0, m0, lam0, i0), time_pairs
    )
    return x
