"""Export jen1_tpu UNetCFG1d params to a reference-compatible .pth.

The inverse of ckpt/torch_import.py: flax params -> the torch state_dict
layout of the reference UNetCFG1d (jen1/model/model.py), so models trained
on TPU can be loaded back into the PyTorch reference (both directions of the
framework switch). Locked by a round-trip test:
convert_reference_unet(export_reference_unet(params)) == params.

Weight layout transforms (inverse of the importer's):
  kernel (in, out)    -> torch Linear  (out, in)
  kernel (K, in, out) -> torch Conv1d  (out, in, K)
  kernel (K, in, out) -> torch ConvT1d (in, out, K)
  scale/bias          -> norm weight/bias

Requires tie_transformer_projections=True (the reference ties each
Transformer1d's in/out 1x1 conv, blocks.py:510,531,536); our conv_in maps to
the single tied `conv1d`.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _t(a):
    import torch

    return torch.from_numpy(np.asarray(a, np.float32).copy())


def _lin(out: Dict, p: Dict, name: str) -> None:
    out[f"{name}.weight"] = _t(np.asarray(p["kernel"]).T)
    if "bias" in p:
        out[f"{name}.bias"] = _t(p["bias"])


def _conv(out: Dict, p: Dict, name: str) -> None:
    out[f"{name}.weight"] = _t(np.asarray(p["kernel"]).transpose(2, 1, 0))
    out[f"{name}.bias"] = _t(p["bias"])


def _convtr(out: Dict, p: Dict, name: str) -> None:
    out[f"{name}.weight"] = _t(np.asarray(p["kernel"]).transpose(1, 2, 0))
    out[f"{name}.bias"] = _t(p["bias"])


def _norm(out: Dict, p: Dict, name: str) -> None:
    out[f"{name}.weight"] = _t(p["scale"])
    out[f"{name}.bias"] = _t(p["bias"])


def _conv_block(out: Dict, p: Dict, pre: str) -> None:
    if "groupnorm" in p:
        _norm(out, p["groupnorm"], f"{pre}.groupnorm")
    if "snake" in p:
        out[f"{pre}.activation.alpha"] = _t(
            np.asarray(p["snake"]["alpha"]).reshape(1, -1, 1)
        )
    _conv(out, p["project"], f"{pre}.project.conv")


def _resnet(out: Dict, p: Dict, pre: str) -> None:
    _conv_block(out, p["block1"], f"{pre}.block1")
    _conv_block(out, p["block2"], f"{pre}.block2")
    if "to_scale_shift" in p:
        _lin(out, p["to_scale_shift"]["to_scale_shift"],
             f"{pre}.to_scale_shift.to_scale_shift.1")
    if "to_out" in p:
        _conv(out, p["to_out"], f"{pre}.to_out.conv")


def _attention(out: Dict, p: Dict, pre: str) -> None:
    _norm(out, p["norm"], f"{pre}.norm")
    _norm(out, p["norm_context"], f"{pre}.norm_context")
    _lin(out, p["to_q"], f"{pre}.to_q")
    _lin(out, p["to_kv"], f"{pre}.to_kv")
    _lin(out, p["to_out"], f"{pre}.attention.to_out")


def _transformer(out: Dict, p: Dict, pre: str) -> None:
    _norm(out, p["group_norm"], f"{pre}.group_norm")
    _conv(out, p["conv_in"], f"{pre}.conv1d.conv")  # tied in/out conv
    k = 0
    while f"block{k}" in p:
        bp = p[f"block{k}"]
        _attention(out, bp["attention"], f"{pre}.blocks.{k}.attention")
        _lin(out, bp["feed_forward"]["linear1"],
             f"{pre}.blocks.{k}.feed_forward.0")
        _lin(out, bp["feed_forward"]["linear2"],
             f"{pre}.blocks.{k}.feed_forward.2")
        if "cross_attention" in bp:
            _attention(out, bp["cross_attention"],
                       f"{pre}.blocks.{k}.cross_attention")
        k += 1


def _time_pos(out: Dict, p: Dict, pre: str) -> None:
    out[f"{pre}.0.weights"] = _t(p["pos"]["weights"])
    _lin(out, p["linear"], f"{pre}.1")


def export_reference_unet(params: Dict[str, Any], model_config) -> Dict:
    """flax params (as produced by unet_from_model_config(...).init) ->
    reference torch state_dict."""
    p = params["params"] if "params" in params else params
    mc = model_config
    assert mc.tie_transformer_projections, (
        "export requires tie_transformer_projections=True (the reference "
        "model ties each Transformer1d's in/out conv)"
    )
    n = len(mc.multipliers) - 1
    unet = p["unet"]
    out: Dict[str, Any] = {}

    _time_pos(out, unet["to_time"], "to_time.0")
    _lin(out, unet["to_mapping_1"], "to_mapping.0")
    _lin(out, unet["to_mapping_2"], "to_mapping.2")
    if "to_features" in unet:
        _lin(out, unet["to_features"], "to_features.0")

    _resnet(out, unet["to_in"]["block"], "to_in.block")
    for i in range(n):
        d = unet[f"downsample{i}"]
        _conv(out, d["downsample"]["conv"], f"downsamples.{i}.downsample.conv")
        for j in range(mc.num_blocks[i]):
            _resnet(out, d[f"block{j}"], f"downsamples.{i}.blocks.{j}")
        if mc.attentions[i]:
            _transformer(out, d["transformer"], f"downsamples.{i}.transformer")

    bott = unet["bottleneck"]
    _resnet(out, bott["pre_block"], "bottleneck.pre_block")
    _resnet(out, bott["post_block"], "bottleneck.post_block")
    if mc.attentions[-1]:
        _transformer(out, bott["transformer"], "bottleneck.transformer")

    for jpos, i in enumerate(reversed(range(n))):
        u = unet[f"upsample{jpos}"]
        n_layers = mc.num_blocks[i] + (1 if mc.attentions[i] else 0)
        for j in range(n_layers):
            _resnet(out, u[f"block{j}"], f"upsamples.{jpos}.blocks.{j}")
        if mc.attentions[i]:
            _transformer(out, u["transformer"], f"upsamples.{jpos}.transformer")
        up_pre = f"upsamples.{jpos}.upsample"
        if mc.factors[i] == 1:
            _conv(out, u["upsample"], up_pre)
        elif mc.use_nearest_upsample:
            _conv(out, u["upsample"], f"{up_pre}.1")
        else:
            _convtr(out, u["upsample"], up_pre)

    _resnet(out, unet["to_out"]["block"], "to_out.block")

    out["fixed_embedding.embedding.weight"] = _t(
        p["fixed_embedding"]["embedding"]
    )
    if mc.use_xattn_time:
        _time_pos(out, p["to_time_embedding"], "to_time_embedding.0")
    return out


def save_reference_checkpoint(
    path: str, params: Dict[str, Any], model_config, *,
    epoch: int = 0, learning_rate: float = 0.0,
) -> None:
    """Write the reference's .pth format: {'model', 'epoch', 'learning_rate'}
    (utils/script_util.py:79-90 sans optimizer)."""
    import torch

    torch.save(
        {
            "model": export_reference_unet(params, model_config),
            "epoch": epoch,
            "learning_rate": learning_rate,
        },
        path,
    )
