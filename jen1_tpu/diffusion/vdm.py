"""Continuous-time trigonometric v-diffusion ("VDM").

TPU-native rebuild of the reference VDM (jen1/diffusion/vdm/vdm.py:12-109):
alpha(t) = cos(t*pi/2), sigma(t) = sin(t*pi/2), v-prediction objective,
deterministic v-space sampler over linspace(1 -> 0), classifier-free-guidance
plumbing identical to GDM. The sampler is one lax.scan.

Deliberate divergences (compat-gated, SURVEY §2.5):
  #1  training noise is Gaussian (reference: torch.rand_like, vdm.py:85,93);
      `uniform_noise_compat=True` restores uniform.
  #10 alpha/sigma are evaluated directly at the continuous time value — the
      reference indexes its alpha table with a float tensor (vdm.py:52-54),
      which crashes; this implements the intent.
  (vdm.py:106) the reference v-target uses x_t where the standard target uses
      x_start; `xt_target_compat=True` restores the reference formula.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

ModelFn = Callable[..., jnp.ndarray]
Conditioning = Dict[str, Any]


def alpha_sigma(t: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Reference: vdm.py:38-40 / q_sample vdm.py:86."""
    ang = t * (math.pi / 2)
    return jnp.cos(ang), jnp.sin(ang)


class VDM:
    def __init__(
        self,
        *,
        loss_type: str,
        cfg_dropout_proba: float = 0.1,
        embedding_scale: float = 0.8,
        batch_cfg: bool = False,
        scale_cfg: bool = False,
        uniform_noise_compat: bool = False,
        xt_target_compat: bool = False,
        dropout_during_sampling: bool = False,
    ):
        assert loss_type in {"l1", "l2"}
        self.loss_type = loss_type
        self.cfg_dropout_proba = float(cfg_dropout_proba)
        self.embedding_scale = float(embedding_scale)
        self.batch_cfg = bool(batch_cfg)
        self.scale_cfg = bool(scale_cfg)
        self.uniform_noise_compat = uniform_noise_compat
        self.xt_target_compat = xt_target_compat
        self.dropout_during_sampling = dropout_during_sampling

    def _noise_like(self, rng: jax.Array, x: jnp.ndarray) -> jnp.ndarray:
        if self.uniform_noise_compat:
            return jax.random.uniform(rng, x.shape, jnp.float32)
        return jax.random.normal(rng, x.shape, jnp.float32)

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
    ) -> jnp.ndarray:
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
        )

    # ---------------------------------------------------------------- train

    def q_sample(
        self, x_start: jnp.ndarray, times: jnp.ndarray, noise: jnp.ndarray
    ):
        """times: (B,) in [0, 1]. Returns (x_t, alphas, sigmas) broadcastable."""
        nd = x_start.ndim
        alphas, sigmas = alpha_sigma(times)
        alphas = alphas.reshape(-1, *((1,) * (nd - 1)))
        sigmas = sigmas.reshape(-1, *((1,) * (nd - 1)))
        return x_start * alphas + noise * sigmas, alphas, sigmas

    def training_losses(
        self,
        model_fn: ModelFn,
        x_start: jnp.ndarray,
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        noise: Optional[jnp.ndarray] = None,
        times: Optional[jnp.ndarray] = None,
        causal: bool = False,
        reduce: str = "mean",
    ) -> jnp.ndarray:
        """Reference `training_loosses` (vdm.py:91-109): t ~ U(0,1) per example.

        reduce='none' returns the per-example loss (B,) for the trainer's
        causal-grouped batched forwards."""
        rng_t, rng_noise, rng_cfg = jax.random.split(rng, 3)
        b = x_start.shape[0]
        if times is None:
            times = jax.random.uniform(rng_t, (b,), jnp.float32)
        if noise is None:
            noise = self._noise_like(rng_noise, x_start)
        x_t, alphas, sigmas = self.q_sample(x_start, times, noise)
        model_out = self._call_model(
            model_fn, x_t, times, conditioning, causal=causal, rng=rng_cfg, dropout=True
        ).astype(jnp.float32)
        base = x_t if self.xt_target_compat else x_start
        target = noise * alphas - base * sigmas
        err = model_out - target
        nd = x_start.ndim
        per_ex = (
            jnp.mean(jnp.abs(err), axis=tuple(range(1, nd)))
            if self.loss_type == "l1"
            else jnp.mean(jnp.square(err), axis=tuple(range(1, nd)))
        )
        return per_ex if reduce == "none" else jnp.mean(per_ex)

    # --------------------------------------------------------------- sample

    def p_sample_loop(
        self,
        model_fn: ModelFn,
        shape: Tuple[int, ...],
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        step: int = 100,
        causal: bool = False,
        init_data: Optional[jnp.ndarray] = None,
        return_all_timesteps: bool = False,
    ) -> jnp.ndarray:
        """Deterministic v-space sampler (vdm.py:42-74) as one lax.scan."""
        batch = shape[0]
        rng_init, rng_loop = jax.random.split(rng)
        audio0 = jax.random.normal(rng_init, shape, jnp.float32)
        if init_data is not None:
            audio0 = audio0 + init_data.astype(jnp.float32)

        steps = jnp.asarray(
            np.linspace(1.0, 0.0, step + 1, dtype=np.float32)
        )
        pairs = jnp.stack([steps[:-1], steps[1:]], axis=1)  # (step, 2)

        def body(carry, inputs):
            audio, i = carry
            t, t_next = inputs[0], inputs[1]
            step_rng = jax.random.fold_in(rng_loop, i)
            time_cond = jnp.full((batch,), t, dtype=jnp.float32)
            v_pred = self._call_model(
                model_fn,
                audio,
                time_cond,
                conditioning,
                causal=causal,
                rng=step_rng,
                dropout=self.dropout_during_sampling,
            ).astype(jnp.float32)
            alpha, sigma = alpha_sigma(t)
            alpha_next, sigma_next = alpha_sigma(t_next)
            x_pred = alpha * audio - sigma * v_pred
            noise_pred = sigma * audio + alpha * v_pred
            new_audio = alpha_next * x_pred + sigma_next * noise_pred
            return (new_audio, i + 1), (new_audio if return_all_timesteps else 0)

        (audio, _), traj = jax.lax.scan(body, (audio0, 0), pairs)
        if return_all_timesteps:
            return jnp.concatenate([audio0[None], traj], axis=0)
        return audio

    def p_sample_stepwise(
        self,
        model_fn: ModelFn,
        shape: Tuple[int, ...],
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        step: int = 100,
        causal: bool = False,
        init_data: Optional[jnp.ndarray] = None,
        compiler_options: Optional[dict] = None,
        model_params=None,
    ) -> jnp.ndarray:
        """v-space sampler with ONE jitted step + a host loop.

        Numerically identical to `p_sample_loop` (same per-step rng folding);
        the compiled graph is a single denoising step instead of the full
        scan — see GaussianDiffusion.ddim_sample_stepwise for why (the
        whole-loop HLO can exceed what a remote compile service accepts).
        model_params: when given, model_fn takes params FIRST and the
        per-step jit receives them as an ARGUMENT — closed-over concrete
        weights lower into the program as dense literal constants
        (benchmarks/hlo_compare_probe.py)."""
        import functools

        batch = shape[0]
        rng_init, rng_loop = jax.random.split(rng)
        audio = jax.random.normal(rng_init, shape, jnp.float32)
        if init_data is not None:
            audio = audio + init_data.astype(jnp.float32)
        dropout = self.dropout_during_sampling

        @functools.partial(jax.jit, compiler_options=compiler_options)
        def fwd(p, audio, t, step_idx, conditioning):
            mfn = model_fn if p is None else functools.partial(model_fn, p)
            step_rng = jax.random.fold_in(rng_loop, step_idx)
            time_cond = jnp.full((batch,), t, dtype=jnp.float32)
            return self._call_model(
                mfn, audio, time_cond, conditioning,
                causal=causal, rng=step_rng, dropout=dropout,
            ).astype(jnp.float32)

        @functools.partial(
            jax.jit, donate_argnums=(0,), compiler_options=compiler_options
        )
        def update(audio, v_pred, t, t_next):
            alpha, sigma = alpha_sigma(t)
            alpha_next, sigma_next = alpha_sigma(t_next)
            x_pred = alpha * audio - sigma * v_pred
            noise_pred = sigma * audio + alpha * v_pred
            return alpha_next * x_pred + sigma_next * noise_pred

        steps = np.linspace(1.0, 0.0, step + 1, dtype=np.float32)
        for i, (t, t_next) in enumerate(zip(steps[:-1], steps[1:])):
            t_ = jnp.asarray(t, jnp.float32)
            tn_ = jnp.asarray(t_next, jnp.float32)
            v_pred = fwd(model_params, audio, t_, jnp.asarray(i, jnp.int32),
                         conditioning)
            audio = update(audio, v_pred, t_, tn_)
        return audio

    def sample(
        self,
        model_fn: ModelFn,
        shape: Tuple[int, ...],
        conditioning: Conditioning,
        rng: jax.Array,
        *,
        step: int = 100,
        causal: bool = False,
        init_data: Optional[jnp.ndarray] = None,
        return_all_timesteps: bool = False,
        mode: str = "scan",
        compiler_options: Optional[dict] = None,
        model_params=None,
    ) -> jnp.ndarray:
        """mode: 'scan' (whole loop in one XLA program — call under jit) or
        'stepwise' (one jitted step + host loop — call OUTSIDE jit).
        model_params: see GaussianDiffusion.sample — when given, model_fn
        takes params FIRST; stepwise feeds them to its jit as an argument,
        scan binds them (the caller's jit should take them as an argument)."""
        if model_params is not None and mode != "stepwise":
            import functools

            model_fn = functools.partial(model_fn, model_params)
        if mode == "stepwise":
            assert not return_all_timesteps
            return self.p_sample_stepwise(
                model_fn, shape, conditioning, rng, step=step, causal=causal,
                init_data=init_data, compiler_options=compiler_options,
                model_params=model_params,
            )
        return self.p_sample_loop(
            model_fn,
            shape,
            conditioning,
            rng,
            step=step,
            causal=causal,
            init_data=init_data,
            return_all_timesteps=return_all_timesteps,
        )


def create_variational_diffusion(vdm_config) -> VDM:
    """Factory (reference: utils/script_util.py:251-268)."""
    return VDM(
        loss_type=vdm_config.loss_type,
        cfg_dropout_proba=vdm_config.cfg_dropout_proba,
        embedding_scale=vdm_config.embedding_scale,
        batch_cfg=vdm_config.batch_cfg,
        scale_cfg=vdm_config.scale_cfg,
        uniform_noise_compat=vdm_config.uniform_noise_compat,
        xt_target_compat=vdm_config.xt_target_compat,
    )
