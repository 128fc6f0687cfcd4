"""Configuration system.

Real (instantiable) dataclasses mirroring every knob of the reference config
namespaces (reference: utils/config.py:6-102, utils/conditioner_config.py:10-37),
plus JSON round-tripping and dotted-path CLI overrides — the reference has no
file/CLI parsing at all (SURVEY §5 "code-as-config").
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple


@dataclass
class DataConfig:
    """Reference: utils/config.py:6-21."""

    dataset_dir: str = ""
    sr: int = 48_000
    channels: int = 2
    min_duration: float = 0.0  # seconds
    max_duration: float = 300.0  # seconds
    sample_duration: float = 10.0  # seconds; sets the latent length (150 fps)
    aug_shift: bool = True
    batch_size: int = 3  # must be divisible by the number of tasks
    shuffle: bool = True
    train_test_split: float = 0.5
    durations_path: Optional[str] = None
    cumsum_path: Optional[str] = None
    audio_file_txt_path: Optional[str] = None
    # TPU-native additions: precomputed-latent directory (offline wav->latent
    # preprocessing replaces the reference's per-item Encodec encode inside the
    # dataloader worker, dataset/dataloader.py:108-113).
    latents_dir: Optional[str] = None
    num_workers: int = 0
    # Host->device dtype for the latent batch. 'float32' (default) ships
    # latents exactly as stored; 'bfloat16' halves the per-step upload —
    # the sustained-step bound on bandwidth-constrained hosts (the B=96
    # batch is 73.7 MB fp32; benchmarks/TRAIN_RUN_TPU.md measured the
    # 1.58 s steady step to be upload-bound at ~32 MB/s). bf16 latents
    # round the diffusion TARGETS to 8-bit mantissa; loss curves shift at
    # the 1e-3 level while the model already computes in bf16.
    latents_upload_dtype: str = "float32"


@dataclass
class GDMConfig:
    """Discrete Gaussian diffusion. Reference: utils/config.py:24-33."""

    steps: int = 1000
    noise_schedule: str = "linear"  # 'linear' | 'cosine'
    # 'noise' | 'x0' | 'v'. Deliberate divergence from the reference *config*
    # default 'noise' (utils/config.py:27): the reference *factory* default is
    # 'v' (utils/script_util.py:218) and the JEN-1 paper trains v-prediction,
    # so 'v' is the intended objective. Reference .pth imports must use the
    # objective the checkpoint was trained with.
    objective: str = "v"
    loss_type: str = "l2"  # 'l1' | 'l2'
    cfg_dropout_proba: float = 0.2
    embedding_scale: float = 0.8
    batch_cfg: bool = True
    scale_cfg: bool = True
    ddim_sampling_eta: float = 1.0
    # Bug-compat switches (see SURVEY §2.5): the reference draws *uniform*
    # noise where Gaussian is intended (gdm.py:161,237,247) and applies CFG
    # dropout during sampling (gdm.py:121). Defaults fix both; flip for
    # seed-parity testing against the PyTorch reference.
    uniform_noise_compat: bool = False
    dropout_during_sampling: bool = False
    # DDIM sampling step count (None = full `steps`-step DDPM). Honored by
    # create_gaussian_diffusion when its sampling_steps argument is None —
    # previously setting this attribute was a silent no-op (it wasn't a
    # declared field and the factory ignored it), which made two benchmarks
    # unknowingly sample the full 1000-step DDPM chain.
    sampling_timesteps: Optional[int] = None


@dataclass
class VDMConfig:
    """Continuous-time trig-schedule v-diffusion. Reference: utils/config.py:36-42."""

    loss_type: str = "l2"
    cfg_dropout_proba: float = 0.2
    embedding_scale: float = 0.8
    batch_cfg: bool = True
    scale_cfg: bool = True
    # Reference computes the v-target as `noise*alpha - x_t*sigma` (vdm.py:106)
    # where the standard target is `noise*alpha - x_start*sigma`; default is the
    # standard target, flip for parity with the reference implementation.
    xt_target_compat: bool = False
    uniform_noise_compat: bool = False


@dataclass
class DiffusionConfig:
    gaussian_diffusion: GDMConfig = field(default_factory=GDMConfig)
    variational_diffusion: VDMConfig = field(default_factory=VDMConfig)


@dataclass
class ModelConfig:
    """1-D UNet denoiser. Reference: utils/config.py:50-74."""

    in_channels: int = 128
    channels: int = 128
    multipliers: Tuple[int, ...] = (1, 1, 1, 2, 2, 4, 4, 4, 8, 8)
    factors: Tuple[int, ...] = (1, 4, 4, 4, 2, 2, 2, 2, 2)
    num_blocks: Tuple[int, ...] = (1, 3, 3, 3, 3, 3, 3, 3, 1)
    attentions: Tuple[int, ...] = (0, 0, 0, 1, 1, 1, 1, 1, 1)
    patch_size: int = 1
    resnet_groups: int = 8
    use_context_time: bool = True
    kernel_multiplier_downsample: int = 2
    use_nearest_upsample: bool = False
    use_skip_scale: bool = True
    use_snake: bool = False
    use_stft: bool = False
    use_stft_context: bool = False
    use_xattn_time: bool = True
    out_channels: int = 128
    context_features: Optional[int] = None
    context_features_multiplier: int = 4
    context_channels: Tuple[int, ...] = (129,)  # masked_input(128) + mask(1)
    context_embedding_features: int = 1024
    context_embedding_max_length: int = 128
    attention_heads: int = 8
    attention_features: Optional[int] = None
    attention_multiplier: int = 1
    stft_num_fft: int = 1023
    stft_hop_length: int = 256
    # TPU-native knobs
    # Composer multi-track layout: latent channels are n_tracks groups of
    # in_channels/n_tracks codec dims; task masks become per-track channels
    # (models/composer.py). 1 = standard single-track JEN-1.
    n_tracks: int = 1
    dtype: str = "bfloat16"  # compute dtype; params are always fp32
    use_flash_attention: bool = True  # Pallas kernel for long sequences
    # Engage the Pallas kernel above this length. Real-v5e microbenchmark
    # (benchmarks/FLASH_ATTENTION_TPU.md): ~parity at 512, 1.5-1.6x at 1536,
    # 5-8x at 4500-4608 vs the XLA path.
    flash_min_seq_len: int = 1024
    # The reference applies the *same* 1x1 conv before and after each
    # Transformer1d's blocks (tied weights — blocks.py:510,531,536). Default
    # unties them; enable for torch-checkpoint import parity.
    tie_transformer_projections: bool = False
    remat: bool = False  # jax.checkpoint each down/up block (memory for FLOPs)


@dataclass
class OptimizerConfig:
    """Reference: utils/config.py:77-82 and train.py:56-60,84."""

    lr: float = 3e-5
    beta_1: float = 0.9
    beta_2: float = 0.95
    weight_decay: float = 0.1
    grad_clip: float = 0.7
    # torch.optim.lr_scheduler.LinearLR defaults (train.py:84): warm from
    # lr*start_factor to lr*end_factor over total_iters optimizer steps.
    lr_start_factor: float = 1.0 / 3.0
    lr_end_factor: float = 1.0
    lr_total_iters: int = 5
    # Non-finite gradients skip the update instead of poisoning params/
    # moments (optax.apply_if_finite; bf16-training failure containment).
    skip_nonfinite_updates: bool = True
    # Run the whole optimizer over one flattened vector (optax.flatten).
    # MEASURED SLOWER on v5e (benchmarks/TRAIN_STEP_TPU.md flatten A/B:
    # +23 ms at B=3, neutral at B=96 — the flat<->tree copies cost more
    # than the per-leaf launches they remove), so off by default; kept as
    # a knob for param-regimes with many tiny leaves. Optimizer-state
    # layout (and thus checkpoints) differ across the flag.
    flatten_optimizer: bool = False
    # Fused AdamW (train/fused_optim.py): clip + moments + weight decay +
    # apply in one expression per leaf — one XLA loop reading (g, mu, nu, p)
    # and writing (mu, nu, p) instead of the optax chain's ~15-20 HBM
    # sweeps over 303.5 M params. Identical math (parity-tested); only
    # grad_accum_every == 1 (the v5e big-batch recipe) uses it — MultiSteps
    # accumulation falls back to the optax chain. Optimizer-state layout
    # (and thus checkpoints) differ across the flag.
    fused_adamw: bool = True


@dataclass
class T5Config:
    """Reference: utils/conditioner_config.py:10-15."""

    id: str = "prompt"
    t5_model_name: str = "google/flan-t5-large"
    max_length: int = 128
    project_out: bool = True
    # Local path to converted weights (no-egress environments can't download).
    weights_path: Optional[str] = None


@dataclass
class IntConfig:
    id: str = "seconds_start"
    min_val: int = 0
    max_val: int = 512


@dataclass
class NumberConfig:
    id: str = "seconds_total"
    min_val: float = 0
    max_val: float = 512


@dataclass
class ConditionerConfig:
    """Reference: utils/conditioner_config.py:30-37.

    Note the reference factory returns inside its loop so only the first
    conditioner type is ever built (utils/script_util.py:156-178); here all
    requested conditioners are instantiated (SURVEY §2.5 #4, fixed).
    """

    cond_dim: int = 1024
    default_keys: Dict[str, str] = field(default_factory=dict)
    # Default is 't5' only: the reference's *effective* behavior (its factory
    # bug builds only the first type, utils/script_util.py:156-178), and the
    # model's conditioning dict only consumes 'prompt' by default anyway
    # (cross_attn_cond_ids). Add 'int'/'number' explicitly to enable them —
    # missing metadata keys then fall back to each conditioner's min_val via
    # MultiConditioner fill_values instead of crashing.
    conditioning_type: Tuple[str, ...] = ("t5",)
    t5_config: T5Config = field(default_factory=T5Config)
    int_config: IntConfig = field(default_factory=IntConfig)
    number_config: NumberConfig = field(default_factory=NumberConfig)


@dataclass
class ParallelConfig:
    """Device-mesh layout. The reference supports only DDP (train.py:30,88-89);

    here data parallelism is the first-class axis, with room for tensor/
    sequence axes (SURVEY §2.2 'TPU-native equivalent')."""

    dp: int = -1  # -1: all devices
    tp: int = 1
    # sequence-parallel axis: the latent LENGTH dimension is sharded and
    # GSPMD partitions the UNet spatially (conv halo exchanges inserted by
    # XLA) — for long-form latents that exceed one chip.
    sp: int = 1
    # ZeRO-3-style parameter+optimizer sharding over the dp axis (params
    # all-gathered at use, grads reduce-scattered — XLA GSPMD collectives);
    # composes with tp.
    fsdp: bool = False
    mesh_axis_names: Tuple[str, ...] = ("dp", "sp", "tp")


@dataclass
class LoraConfig:
    """LoRA finetuning (train/lora.py). Beyond-reference: the torch
    reference only finetunes ALL 300M+ params (`is_finetuning`,
    utils/config.py:89). rank=0 disables (full finetuning/pretraining)."""

    rank: int = 0
    # merge scale = alpha / rank (the LoRA-paper parameterization: quality
    # is stable in alpha when rank changes)
    alpha: float = 16.0
    # regex over "."-joined param paths; None/"" = train/lora.DEFAULT_TARGETS
    # (attention + cross-attention q/kv/out and the FFN linears)
    targets: Optional[str] = None
    # frozen base weights: an orbax run dir or a reference .pth; None
    # adapts the random init (hermetic tests)
    base_ckpt: Optional[str] = None


@dataclass
class Config:
    """Root config. Reference: utils/config.py:85-102."""

    save_dir: str = ""
    log_dir: str = ""
    # Local path to the pretrained EnCodec-48k torch state_dict (.pt/.pth/.bin,
    # facebookresearch/encodec layout). Without it the codec is random-init
    # and decoded audio is noise — Jen1 warns loudly (reference loads the
    # pretrained codec via pip, generation.py:34).
    codec_weights_path: Optional[str] = None
    # Use the reference's exact latent pipeline (per-1s-segment volume
    # normalization, codes concatenated across 1%-overlapping segments —
    # dataset/dataloader.py:108-115): reference-trained checkpoints expect
    # THIS latent distribution/length. Default off: whole-clip encode is the
    # TPU-native path (static shape, no per-segment normalization). Jen1
    # auto-enables it when loading a reference .pth.
    codec_segmented_latents: bool = False
    # XLA exec_time_optimization_effort for the jitted train/eval steps and
    # samplers. None (XLA default) measured on v5e for the full-size
    # 100-step scan sampler: compile ~250 s and the program runs ~4x faster
    # than at -1.0 (0.22 s vs 0.85 s per 30 s clip) — low effort only saves
    # compile time on pathological hosts; set -1.0 there.
    compile_effort: Optional[float] = None
    # (the reference's `use_ddp` flag has no equivalent here: parallelism is
    # mesh-based — see `parallel_config`. Constructing Config(use_ddp=...)
    # raises TypeError by design.)
    use_fp16: bool = True  # on TPU this selects bf16 compute
    use_ema: bool = False
    ema_decay: float = 0.999
    is_finetuning: bool = False
    seed: int = 4996
    tasks: Tuple[str, ...] = ("text_guided", "music_inpaint", "music_cont")
    num_epoch: int = 100
    eval_interval: int = 30
    grad_accum_every: int = 10
    diffusion_type: str = "gdm"  # 'gdm' | 'vdm'
    dataset_config: DataConfig = field(default_factory=DataConfig)
    diffusion_config: DiffusionConfig = field(default_factory=DiffusionConfig)
    model_config: ModelConfig = field(default_factory=ModelConfig)
    optimizer_config: OptimizerConfig = field(default_factory=OptimizerConfig)
    conditioner_config: ConditionerConfig = field(default_factory=ConditionerConfig)
    parallel_config: ParallelConfig = field(default_factory=ParallelConfig)
    lora_config: LoraConfig = field(default_factory=LoraConfig)

    # ---------------------------------------------------------------- io

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self, path: Optional[str] = None) -> str:
        text = json.dumps(self.to_dict(), indent=2, default=str)
        if path is not None:
            with open(path, "w") as f:
                f.write(text)
        return text

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return _dataclass_from_dict(cls, d)

    @classmethod
    def from_json(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def override(self, **dotted: Any) -> "Config":
        """Apply dotted-path overrides, e.g. override(**{"model_config.channels": 64})."""
        d = self.to_dict()
        for key, value in dotted.items():
            node = d
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node[parts[-1]] = value
        return Config.from_dict(d)


def _dataclass_from_dict(cls, d):
    if not dataclasses.is_dataclass(cls):
        return d
    kwargs = {}
    hints = {f.name: f for f in dataclasses.fields(cls)}
    for name, f in hints.items():
        if name not in d:
            continue
        value = d[name]
        ftype = f.type
        origin = getattr(ftype, "__origin__", None)
        if dataclasses.is_dataclass(_resolve(ftype)) and isinstance(value, dict):
            kwargs[name] = _dataclass_from_dict(_resolve(ftype), value)
        elif isinstance(value, list) and origin is tuple:
            kwargs[name] = tuple(value)
        elif isinstance(value, list) and _is_tuple_annotation(ftype):
            kwargs[name] = tuple(value)
        else:
            kwargs[name] = value
    return cls(**kwargs)


def _resolve(tp):
    """Resolve string annotations from `from __future__ import annotations`."""
    if isinstance(tp, str):
        return globals().get(tp.split("[")[0], tp)
    return tp


def _is_tuple_annotation(tp) -> bool:
    return isinstance(tp, str) and tp.startswith("Tuple")


def composer_config(n_tracks: int = 4) -> Config:
    """JEN-1-Composer-style multi-track configuration (BASELINE configs[4]).

    Tracks live as channel groups in one latent: in/out = 128 * n_tracks, and
    the channel-concat conditioning carries each track's masked latent plus a
    per-track mask channel, so any subset of tracks conditions the rest
    (track-wise inpainting generalizes the single-track task masks).
    Long-form generation at 30 s+ keeps latent frames <= ~4500 at the top
    level, where the Pallas flash-attention path engages.
    """
    cfg = Config()
    mc = cfg.model_config
    cfg.model_config = dataclasses.replace(
        mc,
        in_channels=128 * n_tracks,
        out_channels=128 * n_tracks,
        context_channels=(128 * n_tracks + n_tracks,),
        n_tracks=n_tracks,
        use_flash_attention=True,
    )
    # the three single-track tasks generalize to per-track-channel masks
    # (temporal masks tiled over tracks) + the track subset task proper
    cfg.tasks = ("text_guided", "music_inpaint", "music_cont", "track_gen")
    cfg.dataset_config = dataclasses.replace(
        cfg.dataset_config, batch_size=4
    )
    return cfg


def longform_config() -> Config:
    """Long-form preset whose end-to-end TPU path actually executes the
    Pallas flash-attention kernel (VERDICT r1 weak #6: in the default config
    attention lives at cumulative downsample >=64, so even a 120 s latent
    attends over <=281 frames — far below flash_min_seq_len).

    This preset adds attention at level 1 (downsample 4): a standard 30 s
    clip attends over 4500/4 = 1125 frames there — above the 1024 kernel
    threshold, in the regime the real-v5e microbenchmark shows 1.5-8x over
    the XLA path (benchmarks/FLASH_ATTENTION_TPU.md). The e2e delta is
    measured in benchmarks/FLASH_E2E_TPU.md. Checkpoints are NOT
    weight-compatible with the default config (extra transformer blocks).
    """
    cfg = Config()
    mc = cfg.model_config
    cfg.model_config = dataclasses.replace(
        mc,
        attentions=(0, 1, 0) + mc.attentions[3:],
        use_flash_attention=True,
    )
    return cfg


def tiny_test_config() -> Config:
    """A miniature config for fast hermetic tests (same topology, tiny dims)."""
    cfg = Config()
    cfg.model_config = ModelConfig(
        in_channels=8,
        channels=8,
        multipliers=(1, 2, 2, 4),
        factors=(2, 2, 2),
        num_blocks=(1, 1, 1),
        attentions=(0, 1, 1),
        resnet_groups=2,
        context_channels=(9,),
        context_embedding_features=16,
        context_embedding_max_length=6,
        attention_heads=2,
        attention_multiplier=1,
        out_channels=8,
        dtype="float32",
        use_flash_attention=False,
    )
    cfg.diffusion_config.gaussian_diffusion.steps = 8
    cfg.diffusion_config.gaussian_diffusion.noise_schedule = "cosine"  # linear overflows beta<=1 at tiny step counts
    cfg.conditioner_config.cond_dim = 16
    cfg.dataset_config.batch_size = 3
    cfg.grad_accum_every = 1
    return cfg


def tiny_composer_test_config(n_tracks: int = 2) -> Config:
    """Miniature Composer config (multi-track): track_dim=4 codec dims per
    track, same tiny UNet topology as tiny_test_config."""
    track_dim = 4
    cfg = tiny_test_config()
    cfg.model_config = dataclasses.replace(
        cfg.model_config,
        in_channels=track_dim * n_tracks,
        out_channels=track_dim * n_tracks,
        context_channels=(track_dim * n_tracks + n_tracks,),
        n_tracks=n_tracks,
    )
    cfg.tasks = ("text_guided", "music_inpaint", "music_cont", "track_gen")
    cfg.dataset_config = dataclasses.replace(cfg.dataset_config, batch_size=4)
    return cfg
