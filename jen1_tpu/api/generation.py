"""Jen1 text-to-music inference API.

Signature-compatible rebuild of the reference Jen1 (generation.py:17-213):
`Jen1(ckpt_path).generate(prompt, seed, steps, batch_size, seconds, use_gdm,
task, init_audio, init_audio_sr, inpainting_scope)` -> waveform tensor in the
reference's (B, channels, samples) layout.

TPU-first differences:
  * model + diffusion are built once and cached per (steps, use_gdm) — the
    reference reconstructs the model and re-reads the checkpoint on every
    generate() call (generation.py:83 -> 36-74);
  * the sampling loop is a jit-compiled lax.scan on device; the codec decode
    runs on device too (the reference hops to CPU first, generation.py:129);
  * checkpoints load from either this framework's orbax layout or a reference
    .pth via the torch importer (ckpt/torch_import.py);
  * fixes reference quirks #8 (SURVEY §2.5): `flag`/`sample_length` are
    defined on every path and init-audio rank is checked with ndim.
"""

from __future__ import annotations

import math
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jen1_tpu.config import Config
from jen1_tpu.conditioning.conditioners import (
    assemble_conditioning,
    create_multi_conditioner,
)
from jen1_tpu.diffusion.gdm import create_gaussian_diffusion
from jen1_tpu.diffusion.vdm import create_variational_diffusion
from jen1_tpu.models.unet import unet_from_model_config


def _warn(msg: str) -> None:
    import warnings

    warnings.warn(f"jen1_tpu: {msg}", UserWarning, stacklevel=3)


def cast_weights_bf16(tree):
    """bf16 storage for the UNet's matrix weights; fp32-consumed leaves kept.

    Matrix leaves (ndim>=2 floats) become bf16 — under bf16 compute the ops
    cast kernels to the activation dtype at use (ops/linear.py:31,
    ops/conv.py:62), so outputs are bit-identical to fp32 storage while the
    per-forward weight HBM read halves. Vectors (biases, norm scales, Snake
    alphas) and the FiLM mapping head's kernels (to_time/to_features/
    to_mapping_*, which run in fp32 BEFORE the compute-dtype cast —
    models/unet.py _get_mapping) stay fp32.

    Accepts a tree of concrete arrays OR jax.ShapeDtypeStruct (so callers
    can cast shape trees before materializing — bench.py does this to avoid
    allocating the fp32 copy at all). Verified bit-exact under bf16 compute:
    tests/test_api.py TestWeightsDtype.
    """
    fp32_keep = ("to_time", "to_features", "to_mapping")

    def cast(path, v):
        if getattr(v, "ndim", 0) < 2:
            return v
        if not jnp.issubdtype(v.dtype, jnp.floating):
            return v
        keys = "/".join(str(getattr(k, "key", k)) for k in path)
        if any(s in keys for s in fp32_keep):
            return v
        if isinstance(v, jax.ShapeDtypeStruct):
            return jax.ShapeDtypeStruct(v.shape, jnp.bfloat16)
        return v.astype(jnp.bfloat16)

    return jax.tree_util.tree_map_with_path(cast, tree)


@jax.jit
def _to_int16(audio: jnp.ndarray) -> jnp.ndarray:
    """float [-1,1] -> 16-bit PCM, on device (halves the host fetch)."""
    return (jnp.clip(audio, -1.0, 1.0) * 32767.0).astype(jnp.int16)


class Jen1:
    def __init__(
        self,
        ckpt_path: Optional[str],
        sample_rate: int = 48_000,
        cross_attn_cond_ids=("prompt",),
        global_cond_ids=(),
        input_concat_ids=("masked_input", "mask"),
        config: Optional[Config] = None,
        codec=None,
        conditioner=None,
        use_ema_params: bool = False,
        weights_dtype: Optional[str] = None,
        lora_path: Optional[str] = None,
        lora_scale: Optional[float] = None,
    ):
        self.ckpt_path = ckpt_path
        # LoRA adapter checkpoint (a run dir written by
        # `train --lora-rank ...`, train/lora.py): merged into the base
        # weights ONCE at load — zero inference cost. lora_scale defaults to
        # config.lora_config.alpha / rank (rank is read off the adapter).
        self.lora_path = lora_path
        self.lora_scale = lora_scale
        self.sample_rate = sample_rate
        self.config = config or Config()
        # sample from the EMA weights (standard for diffusion) when the
        # checkpoint carries them (TrainState.ema_params, use_ema training)
        self.use_ema_params = use_ema_params
        # weights_dtype="bfloat16": store the UNet's matrix weights
        # (ndim>=2 leaves — ~all of the 303.5M params) in bf16 on device,
        # halving weight HBM residency and host->device transfer. Compute
        # is BIT-IDENTICAL to fp32 storage when compute_dtype is bf16: the
        # ops cast kernels to the activation dtype at use anyway
        # (ops/linear.py:31, ops/conv.py:62), so this removes the fp32
        # master copy, not precision. Leaves consumed in fp32 stay fp32:
        # vectors (biases, norm scales/offsets, Snake alphas — ops/norm.py,
        # ops/snake.py) and the FiLM mapping head's kernels (see
        # _load_params). Verified bit-exact: tests/test_api.py
        # TestWeightsDtype::test_bf16_compute_identity.
        assert weights_dtype in (None, "float32", "bfloat16"), weights_dtype
        self.weights_dtype = weights_dtype
        self.cross_attn_cond_ids = tuple(cross_attn_cond_ids)
        self.global_cond_ids = tuple(global_cond_ids)
        self.input_concat_ids = tuple(input_concat_ids)

        # Reference .pth checkpoints tie the 1x1 conv before/after each
        # Transformer1d (blocks.py:510,531,536); importing into an untied
        # model would silently misinterpret the weights.
        if ckpt_path is not None and str(ckpt_path).endswith(
            (".pth", ".pt", ".bin")
        ):
            if not self.config.model_config.tie_transformer_projections:
                _warn(
                    "reference .pth checkpoint requires "
                    "tie_transformer_projections=True; enabling it."
                )
                import dataclasses as _dc

                self.config.model_config = _dc.replace(
                    self.config.model_config, tie_transformer_projections=True
                )
            if not self.config.codec_segmented_latents:
                _warn(
                    "reference .pth checkpoint was trained on the segmented "
                    "(per-1s volume-normalized) latent pipeline; enabling "
                    "codec_segmented_latents."
                )
                self.config.codec_segmented_latents = True

        self.conditioner = conditioner or create_multi_conditioner(
            self.config.conditioner_config
        )
        t5c = self.config.conditioner_config.t5_config
        if (
            conditioner is None
            and t5c.weights_path is None
            and t5c.t5_model_name != "tiny-test"
        ):
            _warn(
                "T5 conditioner has no weights_path: the text encoder is "
                "RANDOM-initialized and prompts will not steer generation. "
                "Set config.conditioner_config.t5_config.weights_path to a "
                "converted FLAN-T5 checkpoint for real inference."
            )
        if codec is None:
            from jen1_tpu.codec.model import EncodecModel, encodec_48khz_config

            cw = self.config.codec_weights_path
            if cw is not None:
                from jen1_tpu.codec.model import (
                    convert_torch_encodec,
                    load_torch_encodec_state_dict,
                )

                ec = encodec_48khz_config()
                codec = EncodecModel(
                    ec,
                    params=convert_torch_encodec(
                        load_torch_encodec_state_dict(cw), ec
                    ),
                )
            else:
                _warn(
                    "no codec_weights_path configured: the EnCodec codec is "
                    "RANDOM-initialized, so decoded audio will be noise. Set "
                    "config.codec_weights_path to the pretrained EnCodec-48k "
                    "state_dict for real inference."
                )
                codec = EncodecModel(encodec_48khz_config())
        self.codec = codec
        self.compute_dtype = (
            jnp.bfloat16
            if self.config.model_config.dtype == "bfloat16"
            else jnp.float32
        )
        self.model = unet_from_model_config(self.config.model_config)
        self._params = None
        self._diffusion_cache: Dict[Tuple[int, bool], Any] = {}
        self._sample_cache: Dict[Any, Any] = {}
        # eval_shape of the chunked encoder re-traces the codec every
        # generate() call otherwise (~10s of ms of host work per request
        # batch in serving) — memoize per (encode fn, waveform shape)
        self._enc_shape_cache: Dict[Any, Any] = {}
        # Host-side phase walls of the LAST generate() call (seconds):
        # prep / encode / conditioner / assemble / sampler_dispatch /
        # decode_dispatch / fetch. JAX dispatch is async, so device compute
        # accumulates in 'fetch' (the np.asarray block); the other phases
        # are pure host serialization — what serving's dispatcher pays
        # between device batches (benchmarks/serve_bench.py reads this).
        self.last_timings: Dict[str, float] = {}
        # Optional jax.sharding.Mesh with a 'dp' axis: generate() shards the
        # batch over it (multi-chip inference; reference has none).
        self.mesh = None

    # ----------------------------------------------------------- weights

    def _load_params(self, latent_len: int):
        if self._params is not None:
            return self._params
        mc = self.config.model_config
        if self.ckpt_path is None:
            # random init (hermetic smoke / pre-training usage)
            b, l = 1, latent_len
            self._params = jax.jit(
                lambda r: self.model.init(
                    r,
                    jnp.zeros((b, l, mc.in_channels)),
                    jnp.zeros((b,), jnp.float32),
                    embedding=jnp.zeros(
                        (b, mc.context_embedding_max_length,
                         mc.context_embedding_features)
                    ),
                    embedding_mask=jnp.ones(
                        (b, mc.context_embedding_max_length), bool
                    ),
                    channels_list=[
                        jnp.zeros(
                            (b, l, mc.in_channels + max(1, mc.n_tracks))
                        )
                    ],
                    causal=False,
                )
            )(jax.random.PRNGKey(self.config.seed))
        elif str(self.ckpt_path).endswith((".pth", ".pt", ".bin")):
            from jen1_tpu.ckpt.torch_import import load_reference_checkpoint

            self._params, _, _ = load_reference_checkpoint(self.ckpt_path, mc)
        else:
            from jen1_tpu.ckpt.checkpoint import CheckpointManager

            mngr = CheckpointManager(self.ckpt_path)
            restored = mngr.restore()
            assert restored is not None, f"no checkpoint in {self.ckpt_path}"
            state, _ = restored
            if self.use_ema_params:
                params = state.get("ema_params")
                assert params is not None, (
                    "use_ema_params=True but the checkpoint has no "
                    "ema_params (train with config.use_ema=True)"
                )
            else:
                params = state["params"] if "params" in state else state
            self._params = {"params": params}
        if self.lora_path is not None:
            from jen1_tpu.ckpt.checkpoint import CheckpointManager
            from jen1_tpu.train.lora import adapter_rank, merge_lora

            restored = CheckpointManager(self.lora_path).restore()
            assert restored is not None, (
                f"no adapter checkpoint in {self.lora_path}"
            )
            lstate, _ = restored
            if self.use_ema_params and lstate.get("ema_params") is not None:
                adapter = lstate["ema_params"]
            else:
                adapter = (
                    lstate["params"] if "params" in lstate else lstate
                )
            scale = (
                self.lora_scale
                if self.lora_scale is not None
                else self.config.lora_config.alpha / adapter_rank(adapter)
            )
            self._params = {
                "params": merge_lora(self._params["params"], adapter, scale)
            }
        if self.weights_dtype == "bfloat16":
            self._params = cast_weights_bf16(self._params)
        return self._params

    def _get_diffusion(self, steps: int, use_gdm: bool):
        key = (steps, use_gdm)
        if key not in self._diffusion_cache:
            if use_gdm:
                self._diffusion_cache[key] = create_gaussian_diffusion(
                    self.config.diffusion_config.gaussian_diffusion,
                    sampling_steps=steps,
                )
            else:
                self._diffusion_cache[key] = create_variational_diffusion(
                    self.config.diffusion_config.variational_diffusion
                )
        return self._diffusion_cache[key]

    def _make_model_fn(self, params):
        """fp32-boundary wrapper over the UNet apply (samplers run fp32
        math around a compute_dtype model)."""
        compute_dtype = self.compute_dtype
        model = self.model

        def model_fn(x, t, **kw):
            kw["embedding"] = kw["embedding"].astype(compute_dtype)
            chl = kw.get("channels_list")
            if chl is not None:
                kw["channels_list"] = [c.astype(compute_dtype) for c in chl]
            out = model.apply(params, x.astype(compute_dtype), t, **kw)
            if isinstance(out, tuple):  # (out, encoder_cache)
                return (out[0].astype(jnp.float32), out[1])
            return out.astype(jnp.float32)

        return model_fn

    def _params_model_fn(self, p, x, t, **kw):
        """Params-first model_fn for samplers that jit internally (stepwise
        mode): the sampler passes `p` as a jit ARGUMENT so the weights never
        lower into the program as dense literal constants (see the scan-path
        comment in generate())."""
        return self._make_model_fn(p)(x, t, **kw)

    # ---------------------------------------------------------- generate

    def generate(
        self,
        prompt,  # str, or a sequence of batch_size per-example prompts
        seed: int = -1,
        steps: int = 100,
        batch_size: int = 1,
        seconds: float = 30,
        use_gdm: bool = False,
        task: str = "text_guided",
        init_audio=None,
        init_audio_sr: Optional[int] = None,
        inpainting_scope: Optional[Tuple[float, float]] = None,
        decode: bool = True,
        sampler_mode: str = "scan",
        decode_mode: str = "chunked",
        encode_mode: str = "chunked",
        encoder_reuse: int = 1,
        compiler_options: Optional[Dict[str, Any]] = None,
        rng_impl: str = "threefry2x32",
        output_dtype: str = "float32",
        output_transport: str = "host",
    ):
        """Returns waveform (B, channels, samples) float32 (or the latent
        (B, 128, frames) when decode=False). output_dtype="int16" instead
        returns 16-bit PCM converted ON DEVICE — half the host-fetch bytes,
        which bounds warm request latency on tunneled runtimes (serving's
        WAV/s16le output needs exactly this anyway). Unknown values raise.

        output_transport: "host" (default) blocks on the device->host fetch
        and returns np.ndarray; "device" returns the jax.Array right after
        ASYNC dispatch — the caller fetches (np.asarray) when it wants the
        bytes. Serving uses "device" to overlap batch N's fetch with batch
        N+1's host prep + dispatch (the dispatcher thread never blocks on
        transfer; see serve.GenerationService._complete_loop).

        rng_impl: "threefry2x32" (default; reproducible across backends) or
        "rbg" — the TPU hardware RngBitGenerator. The DDIM scan draws a
        latent-sized normal every step; with threefry that keygen costs 173
        us/step on v5e vs 58 us/step with rbg (benchmarks/b1_math_slope.py,
        ~8% of the 100-step B=1 wall). Same iid N(0,1) statistics; seed
        streams are NOT reproducible across impls.

        decode_mode: "chunked" (default) decodes 1 s latent chunks as one
        batched decoder call + overlap-add — EnCodec-48k's own segmented
        semantics, and the TPU fast path (the whole-clip decoder LSTM is a
        length-F sequential chain). "whole" decodes the full clip in one
        LSTM pass, byte-matching the reference's `audio_encoder.decoder(...)`
        call (generation.py:130).

        encode_mode: "chunked" (default) encodes `init_audio` (inpainting /
        continuation; zeros for text_guided) as batched 1 s chunks +
        latent-space overlap-add — the encode-direction mirror of
        decode_mode, avoiding the whole-clip encoder-LSTM scan. "whole"
        byte-matches the reference's single get_emb call.

        encoder_reuse: N > 1 runs the UNet encoder only every N-th DDIM step
        and reuses its cached features in between (training-free
        "Faster Diffusion" encoder propagation, arXiv:2312.09608) — ~N/(N-1)x
        fewer encoder FLOPs at a small fidelity cost. GDM scan sampler only.

        compiler_options defaults to config.compile_effort (None = XLA
        default effort — measured on v5e: compile ~250 s and ~4x faster
        programs than low effort). Pass
        {"exec_time_optimization_effort": -1.0} on hosts whose compiler is
        pathologically slow at default effort."""
        if output_dtype not in ("float32", "int16"):
            raise ValueError(
                f"output_dtype must be 'float32' or 'int16', got "
                f"{output_dtype!r}"
            )
        if output_transport not in ("host", "device"):
            raise ValueError(
                f"output_transport must be 'host' or 'device', got "
                f"{output_transport!r}"
            )
        if compiler_options is None:
            effort = getattr(self.config, "compile_effort", None)
            compiler_options = (
                {"exec_time_optimization_effort": float(effort)}
                if effort is not None
                else {}
            )
        timings: Dict[str, float] = {}
        _tprev = time.perf_counter()

        def _mark(phase: str) -> None:
            nonlocal _tprev
            now = time.perf_counter()
            timings[phase] = timings.get(phase, 0.0) + (now - _tprev)
            _tprev = now

        self.last_timings = timings
        seed = seed if seed != -1 else int(np.random.randint(0, 2**31 - 1))
        rng = jax.random.key(seed, impl=rng_impl)
        channels = self.codec.config.channels
        hop = self.codec.config.hop_length
        sample_length = int(seconds * self.sample_rate)

        no_init = init_audio is None
        if no_init:
            init_audio = np.zeros((batch_size, sample_length, channels), np.float32)
            init_audio_sr = self.sample_rate
        else:
            init_audio = np.asarray(init_audio, np.float32)
            if init_audio.ndim == 2:  # (T, ch) -> batch
                init_audio = np.repeat(init_audio[None], batch_size, axis=0)
            from jen1_tpu.data.audio_io import convert_audio

            init_audio = np.stack(
                [
                    convert_audio(a, init_audio_sr or self.sample_rate,
                                  self.sample_rate, channels)
                    for a in init_audio
                ]
            )

        # task semantics over waveform samples (generation.py:97-110)
        if task == "text_guided":
            mask = self._get_mask(sample_length, 0.0, seconds, batch_size,
                                  self.sample_rate)
            causal = False
        elif task == "music_inpaint":
            assert inpainting_scope is not None, "music_inpaint needs inpainting_scope"
            mask = self._get_mask(
                sample_length, inpainting_scope[0], inpainting_scope[1],
                batch_size, self.sample_rate,
            )
            causal = False
            if init_audio.shape[1] < sample_length:
                pad = sample_length - init_audio.shape[1]
                init_audio = np.pad(init_audio, ((0, 0), (0, pad), (0, 0)))
            init_audio = init_audio[:, :sample_length]
        elif task == "music_cont":
            cont_start = init_audio.shape[1]
            mask = self._get_mask(
                sample_length, cont_start / self.sample_rate, seconds,
                batch_size, self.sample_rate,
            )
            cont_len = sample_length - cont_start
            # The reference multiplies its noise tail by the mask, which is 0
            # over the to-generate region (generation.py:107-109) — the tail
            # is effectively zeros; made explicit here.
            tail = np.zeros((batch_size, cont_len, channels), np.float32)
            init_audio = np.concatenate([init_audio, tail], axis=1)
            causal = True
        else:
            raise ValueError(f"unknown task: {task}")

        # encode init audio to the latent space (reference get_emb). The
        # chunked path batches EnCodec's own 1 s segments into ONE encoder
        # call (the encoder LSTM is a T/hop-step sequential scan whole-clip
        # — benchmarks/DECODE_TPU.md, encode direction); it is the TPU fast
        # path for inpainting/continuation and skipped only for the
        # reference-exact segmented-latent distribution.
        if self.config.codec_segmented_latents:
            enc_fn = self.codec.encode_latent_segmented
        elif encode_mode == "chunked":
            enc_fn = self.codec.encode_latent_chunked
        else:  # "whole": byte-matches the reference's whole-clip get_emb
            enc_fn = self.codec.encode_latent
        _mark("prep")
        if no_init and task == "text_guided":
            # masked_input is identically zero here: the text_guided mask
            # zeroes the whole clip (reference generation.py:97-110
            # multiplies get_emb by that mask), so encoding the synthetic
            # zeros waveform is dead work — and in serving it is a whole
            # extra warm-up compile (the chunked-encoder program) plus
            # per-request encoder walls. Trace the same encode path with
            # eval_shape (pure host-side, no compile; memoized per shape)
            # for the latent grid and use literal zeros.
            shape_key = (enc_fn.__name__, init_audio.shape)
            sds = self._enc_shape_cache.get(shape_key)
            if sds is None:
                sds = jax.eval_shape(
                    enc_fn, jax.ShapeDtypeStruct(init_audio.shape, jnp.float32)
                )
                self._enc_shape_cache[shape_key] = sds
            init_emb = jnp.zeros(sds.shape, sds.dtype)
        else:
            init_emb = enc_fn(jnp.asarray(init_audio))
        _mark("encode")
        latent_len = init_emb.shape[1]
        latent_dim = init_emb.shape[2]

        # nearest-resize the waveform mask to latent frames (generation.py:117)
        idx = np.clip(
            (np.arange(latent_len) * (sample_length / latent_len)).astype(np.int64),
            0,
            sample_length - 1,
        )
        latent_mask = jnp.asarray(mask[:, idx, :])  # (B, F, 1)
        masked_emb = init_emb * latent_mask

        params = self._load_params(latent_len)
        if isinstance(prompt, str):
            prompts = [prompt] * batch_size
        else:
            prompts = list(prompt)
            assert len(prompts) == batch_size, (
                f"{len(prompts)} prompts != batch_size {batch_size}"
            )
        cond_out = self.conditioner([{"prompt": p} for p in prompts])
        _mark("conditioner")
        cond_dict = dict(cond_out)
        cond_dict["masked_input"] = masked_emb.astype(self.compute_dtype)
        cond_dict["mask"] = latent_mask.astype(self.compute_dtype)
        conditioning = assemble_conditioning(
            cond_dict,
            cross_attn_cond_ids=self.cross_attn_cond_ids,
            global_cond_ids=self.global_cond_ids,
            input_concat_ids=self.input_concat_ids,
        )

        if self.mesh is not None:
            # dp-shard the batch; with an sp axis > 1 the latent LENGTH is
            # additionally sharded (GSPMD partitions the UNet spatially,
            # inserting conv halo exchanges — long-form multi-chip sampling)
            from jen1_tpu.parallel.mesh import (
                batch_sharding,
                seq_sharding,
                shard_batch,
            )

            assert batch_size % self.mesh.shape["dp"] == 0, (
                f"batch_size {batch_size} not divisible by dp "
                f"{self.mesh.shape['dp']}"
            )
            conditioning = shard_batch(conditioning, self.mesh)
            if self.mesh.shape.get("sp", 1) > 1:
                sp_sh = seq_sharding(self.mesh)
                conditioning["input_concat_cond"] = jax.device_put(
                    conditioning["input_concat_cond"], sp_sh
                )
                init_emb = jax.device_put(init_emb, sp_sh)
            else:
                init_emb = jax.device_put(init_emb, batch_sharding(self.mesh))

        diffusion = self._get_diffusion(steps, use_gdm)
        shape = (batch_size, latent_len, latent_dim)
        init_data = None if no_init else init_emb

        # 'scan': whole loop in one XLA program (preferred on real TPU hosts);
        # 'stepwise': one jitted step + host loop, for environments whose
        # compile service rejects very large programs (full-size model);
        # 'dpm++' (GDM only): DPM-Solver++(2M) — 100-step-DDIM quality in
        # ~20-30 model calls (beyond-reference acceleration).
        if sampler_mode not in ("scan", "stepwise", "dpm++"):
            raise ValueError(
                f"sampler_mode must be 'scan', 'stepwise' or 'dpm++', "
                f"got {sampler_mode!r}"
            )
        if sampler_mode == "dpm++" and not use_gdm:
            raise ValueError("sampler_mode='dpm++' requires use_gdm=True")
        if encoder_reuse > 1 and not (
            use_gdm and sampler_mode in ("scan", "dpm++")
        ):
            raise ValueError(
                "encoder_reuse>1 (Faster-Diffusion encoder propagation) "
                "requires use_gdm=True with sampler_mode 'scan' or 'dpm++'"
            )
        step_kw = {} if use_gdm else {"step": steps}
        if encoder_reuse > 1:
            step_kw["encoder_reuse"] = int(encoder_reuse)
        _mark("assemble")
        if sampler_mode == "stepwise":
            latents = diffusion.sample(
                self._params_model_fn, shape, conditioning,
                jax.random.fold_in(rng, 2),
                causal=causal, init_data=init_data, mode="stepwise",
                compiler_options=compiler_options or None,
                model_params=params, **step_kw,
            )
        else:
            # Memoize the jitted sampler across generate() calls: a fresh
            # jax.jit(lambda ...) per call would re-trace + re-lower the
            # full-size UNet scan on EVERY request (minutes of host time on
            # a 1-core host, even when the executable itself is
            # persistent-cache warm) — fatal for serving throughput, where
            # every request lands here with identical static settings.
            #
            # params are an ARGUMENT of the jitted function, never a closure
            # capture: closed-over concrete weights lower into the module as
            # dense literal constants — measured 0.7+ GB of StableHLO for
            # the full-size UNet (benchmarks/hlo_compare_probe.py), which is
            # what killed every remote compile of generate()'s program at
            # ~28 min while bench.py's zeros-weights module (O(1) splat
            # constants, 1.8 MB) compiled in ~195 s. As an argument the
            # module is small, compile time is normal, and one executable
            # serves ANY weights (EMA vs raw, reloads) both in-process and
            # via the persistent cache.
            cache_key = (
                sampler_mode, steps, use_gdm, causal, shape,
                encoder_reuse,
                tuple(sorted((compiler_options or {}).items())),
            )
            sample_fn = self._sample_cache.get(cache_key)
            if sample_fn is None:
                mode_kw = {"mode": "dpm++"} if sampler_mode == "dpm++" else {}
                make_model_fn = self._make_model_fn

                def sample_fn_impl(p, r, c, i):
                    return diffusion.sample(
                        make_model_fn(p), shape, c, r, causal=causal,
                        init_data=i, **mode_kw, **step_kw,
                    )

                sample_fn = jax.jit(
                    sample_fn_impl,
                    compiler_options=compiler_options or None,
                )
                self._sample_cache[cache_key] = sample_fn
            latents = sample_fn(
                params, jax.random.fold_in(rng, 2), conditioning, init_data
            )
        _mark("sampler_dispatch")

        if not decode:
            if output_transport == "device":
                return jnp.transpose(latents, (0, 2, 1))  # (B, 128, F)
            out = np.asarray(latents).transpose(0, 2, 1)  # (B, 128, F)
            _mark("fetch")
            return out
        if decode_mode == "chunked":
            audio = self.codec.decode_latent_chunked(latents)
        elif decode_mode == "chunked_bf16":
            # TPU fast path: bf16 decoder weights halve the decoder's
            # bandwidth-bound weight reads; ~40 dB below the fp32 decode,
            # well under EnCodec's own quantization noise
            audio = self.codec.decode_latent_chunked(
                latents, dtype=jnp.bfloat16
            )
        elif decode_mode == "whole":
            audio = self.codec.decode_latent(latents)
        else:
            raise ValueError(
                f"decode_mode must be 'chunked', 'chunked_bf16' or 'whole', "
                f"got {decode_mode!r}"
            )
        if output_dtype == "int16":
            # 16-bit PCM conversion ON DEVICE: serving delivers WAV/s16le
            # anyway, and the int16 buffer is half the fp32 host fetch — on
            # a tunneled runtime the fetch bounds warm request latency
            # (benchmarks/SERVING_TPU.md notes).
            audio = _to_int16(audio)
        _mark("decode_dispatch")
        if output_transport == "device":
            return jnp.transpose(audio, (0, 2, 1))  # (B, ch, T), async
        out = np.asarray(audio).transpose(0, 2, 1)  # (B, ch, T)
        _mark("fetch")
        return out

    def generate_long(
        self,
        prompt,
        total_seconds: float,
        *,
        window_seconds: float = 30.0,
        context_seconds: float = 10.0,
        fade_seconds: float = 0.05,
        seed: int = -1,
        steps: int = 100,
        batch_size: int = 1,
        use_gdm: bool = False,
        sampler_mode: str = "scan",
        **gen_kw,
    ):
        """Arbitrary-length generation by chaining music_cont windows: the
        first window is text_guided; each next window conditions on the last
        `context_seconds` of audio so far and extends by
        (window_seconds - context_seconds). All continuation windows share
        one compiled graph (fixed shapes); window boundaries are stitched
        with a short crossfade. Returns (B, channels, total_samples).

        Beyond-reference capability: the reference can only continue once
        from a user-provided clip (generation.py:97-110); this composes the
        same task into open-ended long-form synthesis. Extra keyword args
        (decode_mode, encoder_reuse, compiler_options, ...) pass through to
        every underlying generate() call."""
        chunks = list(
            self.generate_long_stream(
                prompt, total_seconds,
                window_seconds=window_seconds,
                context_seconds=context_seconds,
                fade_seconds=fade_seconds, seed=seed, steps=steps,
                batch_size=batch_size, use_gdm=use_gdm,
                sampler_mode=sampler_mode, **gen_kw,
            )
        )
        return np.concatenate(chunks, axis=-1)

    def generate_long_stream(
        self,
        prompt,
        total_seconds: float,
        *,
        window_seconds: float = 30.0,
        context_seconds: float = 10.0,
        fade_seconds: float = 0.05,
        seed: int = -1,
        steps: int = 100,
        batch_size: int = 1,
        use_gdm: bool = False,
        sampler_mode: str = "scan",
        **gen_kw,
    ):
        """Streaming form of generate_long: yields finalized (B, channels,
        n_new) float32 chunks as each window completes, so a server can start
        delivering audio after the first window (~0.2 s on a v5e) instead of
        after the whole clip. Chunks concatenate exactly to the
        generate_long output: a window's crossfade region is held back until
        the next window finalizes it (or the stream ends)."""
        assert context_seconds < window_seconds, "context must be < window"
        seed = seed if seed != -1 else int(np.random.randint(0, 2**31 - 1))
        sr = self.sample_rate
        ctx_len = int(context_seconds * sr)
        fade = max(1, int(fade_seconds * sr))
        total = int(total_seconds * sr)

        audio = np.asarray(self.generate(
            prompt, seed=seed, steps=steps, batch_size=batch_size,
            seconds=window_seconds, use_gdm=use_gdm,
            sampler_mode=sampler_mode, **gen_kw,
        ))  # (B, ch, T)
        emitted = 0  # samples finalized and yielded so far

        def finalized(cur_audio, done):
            """All samples are final except the trailing fade region that the
            NEXT window may still blend into."""
            return cur_audio.shape[-1] if done else cur_audio.shape[-1] - fade

        widx = 0
        while True:
            done = audio.shape[-1] >= total
            upto = min(finalized(audio, done), total)
            if upto > emitted:
                yield audio[..., emitted:upto]
                emitted = upto
            if done or emitted >= total:
                return
            widx += 1
            ctx = audio[..., -ctx_len:].transpose(0, 2, 1)  # (B, T, ch)
            out = np.asarray(self.generate(
                prompt, seed=seed + widx, steps=steps, batch_size=batch_size,
                seconds=window_seconds, use_gdm=use_gdm, task="music_cont",
                init_audio=ctx, init_audio_sr=sr, sampler_mode=sampler_mode,
                **gen_kw,
            ))  # (B, ch, window) — first ctx_len samples are conditioned
            new_tail = out[..., ctx_len - fade:]
            ramp = np.linspace(0.0, 1.0, fade, dtype=np.float32)
            head = (
                audio[..., -fade:] * (1.0 - ramp) + new_tail[..., :fade] * ramp
            )
            audio = np.concatenate(
                [audio[..., :-fade], head, new_tail[..., fade:]], axis=-1
            )

    def generate_tracks(
        self,
        prompt,
        *,
        seed: int = -1,
        steps: int = 100,
        batch_size: int = 1,
        seconds: float = 30,
        use_gdm: bool = True,
        context_tracks: Optional[Dict[int, Any]] = None,
        context_tracks_sr: Optional[int] = None,
        decode: bool = True,
        compiler_options: Optional[Dict[str, Any]] = None,
        rng_impl: str = "threefry2x32",
    ):
        """Multi-track generation (JEN-1 Composer capability; the reference
        is single-track only — BASELINE configs[4]).

        Requires a composer config (jen1_tpu.config.composer_config /
        model_config.n_tracks > 1): the latent is n_tracks channel groups of
        codec dims, and `context_tracks` maps track index -> waveform
        (T, ch) or (B, T, ch) given as CONTEXT; the remaining tracks are
        generated conditioned on them plus the prompt (the track_gen
        training task, train/tasks.py). With no context, all tracks are
        generated jointly — mutually coherent stems.

        Returns (B, n_tracks, channels, samples) float32, or the latent
        (B, n_tracks * track_dim, frames) when decode=False.
        """
        from jen1_tpu.models.composer import (
            composer_conditioning,
            split_tracks,
            track_mask,
        )

        mc = self.config.model_config
        n_tracks = mc.n_tracks
        if n_tracks <= 1:
            raise ValueError(
                "generate_tracks needs a composer config "
                "(model_config.n_tracks > 1); see "
                "jen1_tpu.config.composer_config"
            )
        track_dim = mc.in_channels // n_tracks
        assert track_dim == self.codec.config.dimension, (
            f"track_dim {track_dim} != codec latent dim "
            f"{self.codec.config.dimension}"
        )
        if compiler_options is None:
            effort = getattr(self.config, "compile_effort", None)
            compiler_options = (
                {"exec_time_optimization_effort": float(effort)}
                if effort is not None
                else {}
            )
        seed = seed if seed != -1 else int(np.random.randint(0, 2**31 - 1))
        rng = jax.random.key(seed, impl=rng_impl)  # see generate()'s rng_impl
        channels = self.codec.config.channels
        sample_length = int(seconds * self.sample_rate)

        def encode_wave(wav):
            wav = np.asarray(wav, np.float32)
            if wav.ndim == 2:  # (T, ch) -> batch
                wav = np.repeat(wav[None], batch_size, axis=0)
            if context_tracks_sr and context_tracks_sr != self.sample_rate:
                from jen1_tpu.data.audio_io import convert_audio

                wav = np.stack([
                    convert_audio(a, context_tracks_sr, self.sample_rate,
                                  channels)
                    for a in wav
                ])
            if wav.shape[1] < sample_length:
                wav = np.pad(
                    wav, ((0, 0), (0, sample_length - wav.shape[1]), (0, 0))
                )
            wav = wav[:, :sample_length]
            return self.codec.encode_latent_chunked(jnp.asarray(wav))

        # latent geometry from a zero clip (same encode path as generate)
        zero_emb = encode_wave(np.zeros((sample_length, channels), np.float32))
        latent_len = zero_emb.shape[1]

        base = jnp.zeros(
            (batch_size, latent_len, n_tracks * track_dim), jnp.float32
        )
        keep = []
        for ti, wav in (context_tracks or {}).items():
            if not 0 <= int(ti) < n_tracks:
                raise ValueError(f"track index {ti} out of range 0..{n_tracks - 1}")
            lat = encode_wave(wav)
            base = base.at[..., ti * track_dim : (ti + 1) * track_dim].set(lat)
            keep.append(int(ti))
        mask = track_mask(batch_size, latent_len, n_tracks, keep)
        masked_input, mask_ch = composer_conditioning(base, mask, track_dim)

        params = self._load_params(latent_len)
        prompts = [prompt] * batch_size if isinstance(prompt, str) else list(prompt)
        assert len(prompts) == batch_size
        cond_dict = dict(self.conditioner([{"prompt": p} for p in prompts]))
        cond_dict["masked_input"] = masked_input.astype(self.compute_dtype)
        cond_dict["mask"] = mask_ch.astype(self.compute_dtype)
        conditioning = assemble_conditioning(
            cond_dict,
            cross_attn_cond_ids=self.cross_attn_cond_ids,
            global_cond_ids=self.global_cond_ids,
            input_concat_ids=self.input_concat_ids,
        )

        diffusion = self._get_diffusion(steps, use_gdm)
        shape = (batch_size, latent_len, n_tracks * track_dim)
        step_kw = {} if use_gdm else {"step": steps}
        make_model_fn = self._make_model_fn
        # params as a jit ARGUMENT, never a closure capture (see generate())
        sample_fn = jax.jit(
            lambda p, r, c: diffusion.sample(
                make_model_fn(p), shape, c, r, causal=False, **step_kw
            ),
            compiler_options=compiler_options or None,
        )
        latents = sample_fn(params, jax.random.fold_in(rng, 2), conditioning)

        if not decode:
            return np.asarray(latents).transpose(0, 2, 1)  # (B, n*D, F)
        # decode all tracks as ONE batched codec call: (n_tracks*B, F, D)
        per_track = jnp.concatenate(split_tracks(latents, n_tracks), axis=0)
        audio = np.asarray(self.codec.decode_latent_chunked(per_track))
        audio = audio.reshape(n_tracks, batch_size, *audio.shape[1:])
        return audio.transpose(1, 0, 3, 2)  # (B, n_tracks, ch, T)

    @staticmethod
    def _get_mask(
        sample_length: int,
        start_sec: float,
        end_sec: float,
        batch_size: int,
        sr: int = 48_000,
    ) -> np.ndarray:
        """1 = keep, 0 = to-generate, over waveform samples (generation.py:134-143).
        Returns (B, T, 1)."""
        mask = np.ones((sample_length,), np.float32)
        lo = int(math.floor(start_sec * sr))
        hi = int(math.ceil(end_sec * sr))
        mask[lo:hi] = 0.0
        return np.broadcast_to(
            mask[None, :, None], (batch_size, sample_length, 1)
        ).copy()


def save_audio(audio, file_path: str, sample_rate: int = 48_000) -> None:
    """Save (B, ch, T) / (ch, T) float audio to 16-bit WAV, or lossless
    FLAC when file_path ends in .flac (reference save_audio_tensor,
    generation.py:194-213, which is WAV-only via torchaudio)."""
    audio = np.asarray(audio, np.float32)
    if audio.ndim == 3:
        audio = audio[0]
    if file_path.lower().endswith(".flac"):
        from jen1_tpu.data.flac_write import write_flac

        write_flac(file_path, audio.T, sample_rate)
        return
    from jen1_tpu.data.audio_io import write_wav

    write_wav(file_path, audio.T, sample_rate)
