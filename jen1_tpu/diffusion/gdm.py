"""Discrete-time Gaussian diffusion (DDPM ancestral + DDIM sampling).

TPU-native rebuild of the reference GaussianDiffusion
(jen1/diffusion/gdm/gdm.py:14-272): same buffer precomputation, objectives
('noise' | 'x0' | 'v'), losses (l1/l2), classifier-free-guidance plumbing, and
sampler math — but as pure functions over a `model_fn` closure, with both
samplers expressed as `lax.scan` so the full trajectory compiles into one
XLA program (no per-step host sync).

Deliberate divergences (each gated by a compat flag, SURVEY §2.5):
  #1  q_sample / training noise is Gaussian (reference draws uniform noise via
      torch.rand_like at gdm.py:161,237,247). `uniform_noise_compat=True`
      restores the reference distribution for parity testing.
  #2  CFG dropout is OFF during sampling (reference threads its training
      dropout probability into sampling model calls, gdm.py:121).
      `dropout_during_sampling=True` restores it.
  #3  p_sample_loop threads `causal` (reference drops it, gdm.py:166-179).

All arrays are channels-last (B, L, C).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ModelFn = Callable[..., jnp.ndarray]
Conditioning = Dict[str, Any]


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape for broadcasting over (B, ...)."""
    out = table[t]
    return out.reshape(out.shape[0], *((1,) * (ndim - 1)))


class GaussianDiffusion:
    def __init__(
        self,
        *,
        steps: int,
        betas: np.ndarray,
        objective: str,
        loss_type: str,
        alphas: Optional[np.ndarray] = None,
        cfg_dropout_proba: float = 0.1,
        embedding_scale: float = 0.8,
        batch_cfg: bool = False,
        scale_cfg: bool = False,
        sampling_timesteps: Optional[int] = None,
        ddim_sampling_eta: float = 1.0,
        uniform_noise_compat: bool = False,
        dropout_during_sampling: bool = False,
    ):
        assert objective in {"noise", "x0", "v"}
        assert loss_type in {"l1", "l2"}
        self.objective = objective
        self.loss_type = loss_type
        self.cfg_dropout_proba = float(cfg_dropout_proba)
        self.embedding_scale = float(embedding_scale)
        self.batch_cfg = bool(batch_cfg)
        self.scale_cfg = bool(scale_cfg)
        self.uniform_noise_compat = uniform_noise_compat
        self.dropout_during_sampling = dropout_during_sampling

        self.num_timesteps = int(steps)
        self.sampling_timesteps = (
            int(sampling_timesteps) if sampling_timesteps is not None else steps
        )
        assert self.sampling_timesteps <= self.num_timesteps
        self.is_ddim_sampling = self.sampling_timesteps < self.num_timesteps
        self.ddim_sampling_eta = float(ddim_sampling_eta)

        betas = np.asarray(betas, dtype=np.float64)
        assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
        alphas = 1.0 - betas if alphas is None else np.asarray(alphas, np.float64)
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

        as32 = lambda a: jnp.asarray(a, dtype=jnp.float32)  # noqa: E731
        self.betas = as32(betas)
        self.alphas_cumprod = as32(alphas_cumprod)
        self.alphas_cumprod_prev = as32(alphas_cumprod_prev)
        self.sqrt_alphas_cumprod = as32(np.sqrt(alphas_cumprod))
        self.sqrt_one_minus_alphas_cumprod = as32(np.sqrt(1.0 - alphas_cumprod))
        self.log_one_minus_alphas_cumprod = as32(np.log(1.0 - alphas_cumprod))
        self.sqrt_recip_alphas_cumprod = as32(np.sqrt(1.0 / alphas_cumprod))
        self.sqrt_recipm1_alphas_cumprod = as32(np.sqrt(1.0 / alphas_cumprod - 1.0))
        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        self.posterior_variance = as32(posterior_variance)
        self.posterior_log_variance_clipped = as32(
            np.log(
                np.concatenate([[posterior_variance[1]], posterior_variance[1:]])
            )
        )
        self.posterior_mean_coef1 = as32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        self.posterior_mean_coef2 = as32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        )

    # ------------------------------------------------------------- noise

    def _noise_like(self, rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        if self.uniform_noise_compat:
            return jax.random.uniform(rng, x.shape, jnp.float32)
        return jax.random.normal(rng, x.shape, jnp.float32)

    # --------------------------------------------------- forward process

    def q_sample(
        self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def predict_start_from_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    def q_posterior(self, x_start, x_t, t):
        nd = x_t.ndim
        mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        variance = _extract(self.posterior_variance, t, nd)
        log_variance = _extract(self.posterior_log_variance_clipped, t, nd)
        return mean, variance, log_variance

    # ------------------------------------------------------- model call

    def _call_model(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        conditioning: Conditioning,
        *,
        causal: bool,
        rng: Optional[jax.Array],
        dropout: bool,
        extra: Optional[Dict[str, Any]] = None,
    ) -> jnp.ndarray:
        """Forward the denoiser with CFG plumbing (gdm.py:117-125). `extra`
        kwargs pass through to the model (e.g. encoder_cache /
        return_encoder_cache for encoder propagation)."""
        concat = conditioning.get("input_concat_cond")
        return model_fn(
            x,
            t,
            embedding=conditioning["cross_attn_cond"],
            embedding_mask=conditioning.get("cross_attn_masks"),
            embedding_scale=self.embedding_scale,
            embedding_mask_proba=self.cfg_dropout_proba if dropout else 0.0,
            features=conditioning.get("global_cond"),
            channels_list=[concat] if concat is not None else None,
            batch_cfg=self.batch_cfg,
            scale_cfg=self.scale_cfg,
            causal=causal,
            rng=rng,
            **(extra or {}),
        )

    def model_predictions(
        self,
        model_fn: ModelFn,
        x: jnp.ndarray,
        t: jnp.ndarray,
        conditioning: Conditioning,
        *,
        clip_x_start: bool = False,
        causal: bool = False,
        rng: Optional[jax.Array] = None,
        dropout: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        model_out = self._call_model(
            model_fn, x, t, conditioning, causal=causal, rng=rng, dropout=dropout
        )
        return self._predictions_from_out(model_out, x, t, clip_x_start)

    def _predictions_from_out(
        self,
        model_out: jnp.ndarray,
        x: jnp.ndarray,
        t: jnp.ndarray,
        clip_x_start: bool,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Objective-specific (pred_noise, x_start) from the raw model output."""
        model_out = model_out.astype(jnp.float32)
        clip = (lambda a: jnp.clip(a, -1.0, 1.0)) if clip_x_start else (lambda a: a)

        if self.objective == "noise":
            pred_noise = model_out
            x_start = clip(self.predict_start_from_noise(x, t, pred_noise))
        elif self.objective == "x0":
            x_start = clip(model_out)
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        else:  # 'v'
            x_start = clip(self.predict_start_from_v(x, t, model_out))
            pred_noise = self.predict_noise_from_start(x, t, x_start)
        return pred_noise, x_start

    # ----------------------------------------------------------- losses

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        noise: Optional[jnp.ndarray] = None,
        causal: bool = False,
        reduce: str = "mean",
    ) -> jnp.ndarray:
        """Diffusion loss (reference `training_loosses`, gdm.py:245-272).

        reduce='none' returns the per-example loss (B,) — the trainer groups
        same-causal-flag tasks into one batched forward and segment-means
        per task afterwards."""
        rng_noise, rng_cfg = jax.random.split(rng)
        if noise is None:
            noise = self._noise_like(rng_noise, x_start)
        x_t = self.q_sample(x_start, t, noise)
        model_out = self._call_model(
            model_fn, x_t, t, conditioning, causal=causal, rng=rng_cfg, dropout=True
        ).astype(jnp.float32)

        nd = x_start.ndim
        if self.objective == "noise":
            target = noise
        elif self.objective == "x0":
            target = x_start
        else:  # 'v'
            target = (
                _extract(self.sqrt_alphas_cumprod, t, nd) * noise
                - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
            )

        err = model_out - target
        per_ex = (
            jnp.mean(jnp.abs(err), axis=tuple(range(1, nd)))
            if self.loss_type == "l1"
            else jnp.mean(jnp.square(err), axis=tuple(range(1, nd)))
        )
        return per_ex if reduce == "none" else jnp.mean(per_ex)

    # --------------------------------------------------------- samplers

    def _init_audio(self, rng, shape, init_data):
        audio = jax.random.normal(rng, shape, jnp.float32)
        if init_data is not None:
            audio = audio + init_data.astype(jnp.float32)
        return audio

    def ddim_sample(
        self,
        model_fn: ModelFn,
        shape: Tuple[int, ...],
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        causal: bool = False,
        init_data: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        return_all_timesteps: bool = False,
        encoder_reuse: int = 1,
    ) -> jnp.ndarray:
        """DDIM sampler (gdm.py:181-225) as one lax.scan.

        encoder_reuse > 1 enables encoder propagation ("Faster Diffusion",
        arXiv:2312.09608): the UNet encoder (down stack) runs on the first
        step of every `encoder_reuse`-step block AND always on the final
        step (whose x_start is the returned sample); in between, the
        decoder runs against the cached encoder features (deep features
        change slowly across adjacent t). Training-free acceleration at a
        small fidelity cost; requires the model to accept
        encoder_cache/return_encoder_cache (UNetCFG1d does)."""
        batch = shape[0]
        eta = self.ddim_sampling_eta

        times = np.linspace(
            -1, self.num_timesteps - 1, num=self.sampling_timesteps + 1
        ).astype(np.int32)[::-1]
        time_pairs = jnp.asarray(
            np.stack([times[:-1], times[1:]], axis=1)
        )  # (S, 2)

        rng_init, rng_loop = jax.random.split(rng)
        audio0 = self._init_audio(rng_init, shape, init_data)

        # Extend tables so gathering index -1 is safe (never used: guarded by
        # the time_next < 0 select below).
        acp = self.alphas_cumprod

        def ddim_update(audio, pred_noise, x_start, time, time_next, rng_noise):
            alpha = acp[time]
            alpha_next = acp[jnp.maximum(time_next, 0)]
            sigma = eta * jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
            )
            c = jnp.sqrt(1 - alpha_next - sigma**2)
            noise = jax.random.normal(rng_noise, audio.shape, jnp.float32)
            stepped = (
                x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            )
            return jnp.where(time_next < 0, x_start, stepped)

        if encoder_reuse > 1:
            # Block-unrolled scan: each iteration runs ONE full forward (which
            # produces the encoder cache) followed by encoder_reuse-1
            # decoder-only forwards consuming it. The cache lives entirely
            # inside the iteration — putting it in the scan carry instead
            # costs a cache-sized HBM round-trip per step, which measured
            # SLOWER than the saved encoder reads on v5e (155 vs 179
            # audio-s/s at the flagship shape).
            if return_all_timesteps:
                raise ValueError(
                    "encoder_reuse>1 does not support return_all_timesteps"
                )
            k = int(encoder_reuse)
            S = self.sampling_timesteps
            n_blocks, tail = divmod(S, k)
            if tail == 0 and n_blocks > 0:
                # peel the last block out of the scan so its final step can
                # run a full forward (see the tail loop below): the final
                # step's x_start IS the returned sample, so it must never be
                # decoder-only against a stale cache
                n_blocks -= 1
                tail = k
            main = time_pairs[: n_blocks * k].reshape(n_blocks, k, 2)

            def call(audio, time_cond, rng_cfg, enc_cache):
                return self._call_model(
                    model_fn, audio, time_cond, conditioning,
                    causal=causal, rng=rng_cfg,
                    dropout=self.dropout_during_sampling,
                    extra={
                        "encoder_cache": enc_cache,
                        "return_encoder_cache": True,
                    },
                )

            def block_body(carry, block):  # block: (k, 2)
                audio, step = carry
                cache = None
                for j in range(k):  # static unroll
                    time, time_next = block[j, 0], block[j, 1]
                    step_rng = jax.random.fold_in(rng_loop, step + j)
                    rng_cfg, rng_noise = jax.random.split(step_rng)
                    time_cond = jnp.full((batch,), time, dtype=jnp.int32)
                    model_out, cache = call(
                        audio, time_cond, rng_cfg, cache if j else None
                    )
                    pred_noise, x_start = self._predictions_from_out(
                        model_out, audio, time_cond, clip_denoised
                    )
                    audio = ddim_update(
                        audio, pred_noise, x_start, time, time_next, rng_noise
                    )
                return (audio, step + k), 0

            (audio, step), _ = jax.lax.scan(
                block_body, (audio0, 0), main
            )
            # tail steps, statically unrolled: encoder reuse continues within
            # the tail, but the FINAL step always runs a full forward
            cache = None
            for r in range(tail):
                is_final = (n_blocks * k + r) == S - 1
                time, time_next = time_pairs[n_blocks * k + r]
                step_rng = jax.random.fold_in(rng_loop, step + r)
                rng_cfg, rng_noise = jax.random.split(step_rng)
                time_cond = jnp.full((batch,), time, dtype=jnp.int32)
                use_cache = cache if (r % k != 0 and not is_final) else None
                model_out, cache = call(audio, time_cond, rng_cfg, use_cache)
                pred_noise, x_start = self._predictions_from_out(
                    model_out, audio, time_cond, clip_denoised
                )
                audio = ddim_update(
                    audio, pred_noise, x_start, time, time_next, rng_noise
                )
            return audio

        def body(carry, inputs):
            audio, step = carry
            time, time_next = inputs[0], inputs[1]
            step_rng = jax.random.fold_in(rng_loop, step)
            rng_cfg, rng_noise = jax.random.split(step_rng)
            time_cond = jnp.full((batch,), time, dtype=jnp.int32)
            pred_noise, x_start = self.model_predictions(
                model_fn,
                audio,
                time_cond,
                conditioning,
                clip_x_start=clip_denoised,
                causal=causal,
                rng=rng_cfg,
                dropout=self.dropout_during_sampling,
            )
            new_audio = ddim_update(
                audio, pred_noise, x_start, time, time_next, rng_noise
            )
            return (new_audio, step + 1), (new_audio if return_all_timesteps else 0)

        (audio, _), traj = jax.lax.scan(body, (audio0, 0), time_pairs)
        if return_all_timesteps:
            return jnp.concatenate([audio0[None], traj], axis=0)
        return audio

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        shape: Tuple[int, ...],
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        causal: bool = False,
        init_data: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        return_all_timesteps: bool = False,
    ) -> jnp.ndarray:
        """Ancestral DDPM sampler (gdm.py:153-179) as one lax.scan."""
        batch = shape[0]
        rng_init, rng_loop = jax.random.split(rng)
        audio0 = self._init_audio(rng_init, shape, init_data)
        ts = jnp.arange(self.num_timesteps - 1, -1, -1)

        def body(audio, t):
            step_rng = jax.random.fold_in(rng_loop, t)
            rng_cfg, rng_noise = jax.random.split(step_rng)
            time_cond = jnp.full((batch,), t, dtype=jnp.int32)
            _, x_start = self.model_predictions(
                model_fn,
                audio,
                time_cond,
                conditioning,
                clip_x_start=clip_denoised,
                causal=causal,
                rng=rng_cfg,
                dropout=self.dropout_during_sampling,
            )
            mean, _, log_var = self.q_posterior(x_start, audio, time_cond)
            noise = self._noise_like(rng_noise, audio)
            noise = jnp.where(t > 0, noise, jnp.zeros_like(noise))
            new_audio = mean + jnp.exp(0.5 * log_var) * noise
            return new_audio, (new_audio if return_all_timesteps else 0)

        audio, traj = jax.lax.scan(body, audio0, ts)
        if return_all_timesteps:
            return jnp.concatenate([audio0[None], traj], axis=0)
        return audio

    def ddim_sample_stepwise(
        self,
        model_fn: ModelFn,
        shape: Tuple[int, ...],
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        causal: bool = False,
        init_data: Optional[jnp.ndarray] = None,
        clip_denoised: bool = True,
        compiler_options: Optional[dict] = None,
        model_params=None,
    ) -> jnp.ndarray:
        """DDIM with ONE jitted step + a host loop over (t, t_next) pairs.

        Numerically identical to `ddim_sample` (same per-step rng folding),
        but the compiled graph is a single denoising step instead of the full
        scan. NOTE (measured on v5e, full-size model, 100 steps): the scan
        sampler compiles in ~250 s at default effort and samples a 30 s clip
        in 0.22 s, while this host loop takes 11.3 s — per-step dispatch
        latency through a tunneled runtime is NOT hidden by async dispatch.
        Prefer the scan path; keep stepwise only for compilers that reject
        the whole-loop program.
        """
        batch = shape[0]
        eta = self.ddim_sampling_eta
        acp = self.alphas_cumprod
        times = np.linspace(
            -1, self.num_timesteps - 1, num=self.sampling_timesteps + 1
        ).astype(np.int32)[::-1]
        rng_init, rng_loop = jax.random.split(rng)
        audio = self._init_audio(rng_init, shape, init_data)
        dropout = self.dropout_during_sampling

        # TWO jits instead of one: the denoiser forward alone, and the tiny
        # elementwise DDIM update. The combined step graph can exceed what a
        # remote compile service tolerates (observed: transport drops after
        # ~25 min of compilation) while the bare forward compiles fine — and
        # the forward HLO is shared with other callers via the persistent
        # compilation cache.
        # `p` (the model weights) is a jit ARGUMENT: closed-over concrete
        # weights would lower into this per-step program as dense literal
        # constants (benchmarks/hlo_compare_probe.py). p=None (weights baked
        # into model_fn) stays supported — None is an empty pytree.
        @functools.partial(jax.jit, compiler_options=compiler_options)
        def fwd(p, audio, time, step_idx, conditioning):
            mfn = model_fn if p is None else functools.partial(model_fn, p)
            step_rng = jax.random.fold_in(rng_loop, step_idx)
            rng_cfg, _ = jax.random.split(step_rng)
            time_cond = jnp.full((batch,), time, dtype=jnp.int32)
            return self._call_model(
                mfn, audio, time_cond, conditioning,
                causal=causal, rng=rng_cfg, dropout=dropout,
            ).astype(jnp.float32)

        @functools.partial(
            jax.jit, donate_argnums=(0,), compiler_options=compiler_options
        )
        def update(audio, model_out, time, time_next, step_idx):
            step_rng = jax.random.fold_in(rng_loop, step_idx)
            _, rng_noise = jax.random.split(step_rng)
            time_cond = jnp.full((batch,), time, dtype=jnp.int32)
            clip = (
                (lambda a: jnp.clip(a, -1.0, 1.0))
                if clip_denoised
                else (lambda a: a)
            )
            if self.objective == "noise":
                pred_noise = model_out
                x_start = clip(
                    self.predict_start_from_noise(audio, time_cond, pred_noise)
                )
            elif self.objective == "x0":
                x_start = clip(model_out)
                pred_noise = self.predict_noise_from_start(audio, time_cond, x_start)
            else:  # 'v'
                x_start = clip(
                    self.predict_start_from_v(audio, time_cond, model_out)
                )
                pred_noise = self.predict_noise_from_start(audio, time_cond, x_start)
            alpha = acp[time]
            alpha_next = acp[jnp.maximum(time_next, 0)]
            sigma = eta * jnp.sqrt(
                (1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha)
            )
            c = jnp.sqrt(1 - alpha_next - sigma**2)
            noise = jax.random.normal(rng_noise, audio.shape, jnp.float32)
            stepped = x_start * jnp.sqrt(alpha_next) + c * pred_noise + sigma * noise
            return jnp.where(time_next < 0, x_start, stepped)

        for i, (t, t_next) in enumerate(zip(times[:-1], times[1:])):
            t_ = jnp.asarray(t, jnp.int32)
            tn_ = jnp.asarray(t_next, jnp.int32)
            i_ = jnp.asarray(i, jnp.int32)
            model_out = fwd(model_params, audio, t_, i_, conditioning)
            audio = update(audio, model_out, t_, tn_, i_)
        return audio

    def sample(
        self,
        model_fn: ModelFn,
        shape: Tuple[int, ...],
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        causal: bool = False,
        init_data: Optional[jnp.ndarray] = None,
        return_all_timesteps: bool = False,
        mode: str = "scan",
        compiler_options: Optional[dict] = None,
        encoder_reuse: int = 1,
        model_params=None,
    ) -> jnp.ndarray:
        """Dispatch DDIM iff sampling_timesteps < steps (gdm.py:227-230).

        mode: 'scan' (whole loop in one XLA program — call under jit),
        'stepwise' (one jitted step + host loop — call OUTSIDE jit), or
        'dpm++' (DPM-Solver++(2M) — ~100-step-DDIM quality in 20-30 calls;
        beyond-reference, diffusion/dpm_solver.py).
        compiler_options (stepwise only): passed to the per-step jits; e.g.
        {"exec_time_optimization_effort": -1.0} for hosts with
        pathologically slow compilers (default effort is otherwise both
        faster-running and similarly fast to compile — measured on v5e).
        model_params: when given, model_fn takes params FIRST —
        model_fn(params, x, t, **kw) — and stepwise mode feeds them to its
        per-step jit as an ARGUMENT. Concrete weights captured in a model_fn
        closure lower into the per-step program as dense literal constants
        (hundreds of MB of HLO for the full-size UNet — see
        benchmarks/hlo_compare_probe.py); scan callers jit the whole sample()
        call themselves and should pass weights as arguments of their own
        jit instead (Jen1.generate does)."""
        if model_params is not None and mode != "stepwise":
            # under the caller's jit model_params is a tracer; binding it
            # here keeps the no-params contract for the loop bodies
            model_fn = functools.partial(model_fn, model_params)
        if encoder_reuse > 1:
            # validate BEFORE the mode dispatch so no branch can silently
            # ignore the flag (ADVICE r1: stepwise returned before this check
            # and ran at full cost with no error)
            if mode == "stepwise":
                raise ValueError(
                    "encoder_reuse>1 requires mode='scan' or 'dpm++'; the "
                    "stepwise sampler does not implement encoder propagation"
                )
            if not self.is_ddim_sampling and mode != "dpm++":
                raise ValueError("encoder_reuse is implemented for DDIM sampling")
        if mode == "dpm++":
            assert not return_all_timesteps
            from jen1_tpu.diffusion.dpm_solver import dpm_solver_pp_2m

            return dpm_solver_pp_2m(
                self, model_fn, shape, conditioning, rng,
                causal=causal, init_data=init_data,
                encoder_reuse=encoder_reuse,
            )
        if mode == "stepwise":
            assert self.is_ddim_sampling, "stepwise mode implements DDIM"
            assert not return_all_timesteps
            return self.ddim_sample_stepwise(
                model_fn, shape, conditioning, rng,
                causal=causal, init_data=init_data,
                compiler_options=compiler_options,
                model_params=model_params,
            )
        if self.is_ddim_sampling:
            return self.ddim_sample(
                model_fn,
                shape,
                conditioning,
                rng,
                causal=causal,
                init_data=init_data,
                return_all_timesteps=return_all_timesteps,
                encoder_reuse=encoder_reuse,
            )
        return self.p_sample_loop(
            model_fn,
            shape,
            conditioning,
            rng,
            causal=causal,
            init_data=init_data,
            return_all_timesteps=return_all_timesteps,
        )


def create_gaussian_diffusion(
    gdm_config, sampling_steps: Optional[int] = None
) -> GaussianDiffusion:
    """Factory (reference: utils/script_util.py:216-249).

    sampling_steps: DDIM step count; when None, falls back to the config's
    own `sampling_timesteps` field (None there too = full-steps DDPM).
    Before round 4 the config field was silently ignored — two benchmarks
    that set it unknowingly sampled the full 1000-step DDPM chain."""
    from jen1_tpu.diffusion.schedules import get_beta_schedule

    if sampling_steps is None:
        sampling_steps = getattr(gdm_config, "sampling_timesteps", None)
    betas, alphas = get_beta_schedule(gdm_config.noise_schedule, gdm_config.steps)
    return GaussianDiffusion(
        steps=gdm_config.steps,
        betas=betas,
        alphas=alphas,
        objective=gdm_config.objective,
        loss_type=gdm_config.loss_type,
        cfg_dropout_proba=gdm_config.cfg_dropout_proba,
        embedding_scale=gdm_config.embedding_scale,
        batch_cfg=gdm_config.batch_cfg,
        scale_cfg=gdm_config.scale_cfg,
        sampling_timesteps=sampling_steps,
        ddim_sampling_eta=gdm_config.ddim_sampling_eta,
        uniform_noise_compat=gdm_config.uniform_noise_compat,
        dropout_during_sampling=gdm_config.dropout_during_sampling,
    )
