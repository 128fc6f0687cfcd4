"""jen1_tpu — a TPU-native (JAX/XLA/Pallas) text-to-music diffusion framework.

A from-scratch rebuild of the capabilities of JEN-1 (reference:
0417keito/JEN-1-pytorch): a 1-D UNet denoiser over Encodec-48k latents,
conditioned on FLAN-T5 text embeddings, trained jointly on text-guided
generation / music inpainting / music continuation with omnidirectional
(bidirectional + causal) convolution/attention masking, sampled with DDPM /
DDIM / continuous-time v-diffusion under classifier-free guidance.

Design notes (TPU-first, not a port):
  * channels-last (B, L, C) activations everywhere — C rides the TPU lane dim.
  * `causal` is a static compile-time flag: two compiled graph variants replace
    the reference's runtime branch (reference: jen1/model/blocks.py:44-51).
  * samplers are jit-compiled `lax.scan` loops with donated state — the whole
    100-step DDIM loop runs on-device with zero host round-trips
    (reference runs a Python loop: jen1/diffusion/gdm/gdm.py:202).
  * mixed precision: fp32 params, bf16 compute, fp32 softmax/normalization.
  * parallelism via `jax.sharding.Mesh` + NamedSharding: dp batch axis,
    Megatron tp on attention/FFN, ZeRO-3 fsdp over dp, and an sp axis that
    GSPMD-partitions the latent length (reference only attempts DDP:
    train.py:30,88).
  * beyond-reference: DPM-Solver++(2M) sampler, Composer multi-track
    conditioning, VGGish FAD, batch/multi-chip inference CLI.

Quick start:

    from jen1_tpu.api.generation import Jen1, save_audio
    jen1 = Jen1("path/to/ckpt")          # orbax dir or reference .pth
    audio = jen1.generate("a beautiful song", steps=100, seconds=30)
    save_audio(audio, "sample.wav")
"""

__version__ = "0.2.0"

from jen1_tpu import config as config  # noqa: F401
