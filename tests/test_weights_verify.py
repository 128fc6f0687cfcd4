"""Pretrained-weights verification (VERDICT r1 #3): key coverage, param
coverage, and the jen1-verify-weights CLI.

De-circularizes the codec converter evidence three ways:
  * the public-layout transcription (jen1_tpu/codec/torch_keys.py) is an
    independent witness checked against BOTH the torch mock's state_dict
    keys and the converter's consumed-key set;
  * the mock now carries the real codebook buffers (inited/cluster_size/
    embed_avg) so ignore-list accounting is exercised, not assumed;
  * strict conversion raises on any unconsumed key, so a layout misreading
    can no longer pass silently.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from jen1_tpu.codec.model import (  # noqa: E402
    EncodecConfig,
    EncodecModel,
    _RecordingDict,
    convert_torch_encodec,
)
from jen1_tpu.codec.torch_keys import coverage_report, expected_torch_keys  # noqa: E402
from tests.encodec_torch_mock import MockEncodec  # noqa: E402


def _tiny_48k_style():
    cfg = EncodecConfig(
        sample_rate=1600, channels=2, dimension=8, n_filters=2,
        ratios=(5, 4, 2), n_q=4, bins=16, causal=False,
        norm="time_group_norm", normalize=True, segment=1.0, overlap=0.01,
    )
    torch.manual_seed(0)
    mock = MockEncodec(
        sample_rate=cfg.sample_rate, channels=cfg.channels,
        dimension=cfg.dimension, n_filters=cfg.n_filters, ratios=cfg.ratios,
        n_q=cfg.n_q, bins=cfg.bins, norm=cfg.norm, causal=cfg.causal,
        normalize=cfg.normalize, segment=cfg.segment, overlap=cfg.overlap,
    ).eval()
    return cfg, mock


class TestPublicKeyLayout:
    def test_expected_keys_match_mock_time_group_norm(self):
        """The independent public-layout transcription and the torch mock
        agree exactly on the 48k-style key set (params + buffers)."""
        cfg, mock = _tiny_48k_style()
        params, buffers = expected_torch_keys(
            n_stages=len(cfg.ratios), n_q=cfg.n_q, norm="time_group_norm"
        )
        assert set(mock.state_dict().keys()) == params | buffers

    def test_expected_keys_match_mock_weight_norm(self):
        torch.manual_seed(1)
        mock = MockEncodec(
            sample_rate=1600, channels=1, dimension=8, n_filters=2,
            ratios=(4, 2), n_q=2, bins=16, norm="weight_norm", causal=True,
            normalize=False, segment=None,
        ).eval()
        params, buffers = expected_torch_keys(
            n_stages=2, n_q=2, norm="weight_norm"
        )
        assert set(mock.state_dict().keys()) == params | buffers

    def test_converter_consumes_every_param_key(self):
        cfg, mock = _tiny_48k_style()
        rec = _RecordingDict(mock.state_dict())
        convert_torch_encodec(rec, cfg)
        cov = coverage_report(rec.keys(), rec.consumed,
                              n_stages=len(cfg.ratios), n_q=cfg.n_q)
        assert cov["unexplained"] == []
        assert cov["missing_vs_public_layout"] == []
        assert cov["unexpected_vs_public_layout"] == []
        assert len(cov["ignored_buffers"]) == 3 * cfg.n_q

    def test_strict_conversion_raises_on_unconsumed_key(self):
        cfg, mock = _tiny_48k_style()
        sd = dict(mock.state_dict())
        sd["encoder.model.99.conv.conv.weight"] = torch.zeros(1)
        with pytest.raises(ValueError, match="unconsumed"):
            convert_torch_encodec(sd, cfg)
        # strict=False forces through
        convert_torch_encodec(sd, cfg, strict=False)

    def test_missing_key_raises(self):
        cfg, mock = _tiny_48k_style()
        sd = dict(mock.state_dict())
        del sd["decoder.model.0.conv.conv.weight"]
        with pytest.raises(KeyError):
            convert_torch_encodec(sd, cfg)


class TestVerifyWeightsCLI:
    @pytest.fixture(scope="class")
    def ckpt_path(self, tmp_path_factory):
        cfg, mock = _tiny_48k_style()
        path = tmp_path_factory.mktemp("w") / "encodec_tiny.pth"
        torch.save(mock.state_dict(), str(path))
        return cfg, str(path)

    def test_verify_codec_report(self, ckpt_path):
        from jen1_tpu.ckpt.verify_weights import verify_codec

        cfg, path = ckpt_path
        # mock weights are random, so reconstruction SNR is meaningless —
        # disable the SNR gate and check the structural gates + that a
        # finite SNR number is produced
        report = verify_codec(path, min_snr_db=-1e9, sweep_seconds=0.5,
                              config=cfg)
        assert report["checks"]["key_coverage"] is True
        assert report["checks"]["param_coverage"] is True
        assert report["param_coverage"]["uninitialized"] == []
        assert report["param_coverage"]["shape_mismatch"] == []
        assert np.isfinite(report["round_trip"]["snr_db"])
        assert report["ok"] is True

    def test_verify_codec_snr_gate_fails_random_weights(self, ckpt_path):
        from jen1_tpu.ckpt.verify_weights import verify_codec

        cfg, path = ckpt_path
        report = verify_codec(path, min_snr_db=3.0, sweep_seconds=0.5,
                              config=cfg)
        # random-weight codec cannot reconstruct a sweep at >=3 dB SNR:
        # the gate that catches weight-scramble bugs actually gates
        assert report["checks"]["snr"] is False
        assert report["ok"] is False

    def test_verify_codec_accepts_hf_layout_checkpoint(self, tmp_path):
        """A HuggingFace transformers EncodecModel .pth passes the same
        structural gates: the loader auto-detects and remaps the HF layout
        (codec/hf_import.py), then key/param coverage run as usual."""
        transformers = pytest.importorskip("transformers")
        from jen1_tpu.ckpt.verify_weights import verify_codec
        from jen1_tpu.codec.model import EncodecConfig

        hf_cfg = transformers.EncodecConfig(
            sampling_rate=1600, audio_channels=2, hidden_size=8,
            num_filters=2, num_residual_layers=1, upsampling_ratios=[5, 4, 2],
            codebook_size=16, codebook_dim=8, target_bandwidths=[0.5],
            normalize=True, chunk_length_s=1.0, overlap=0.01,
            norm_type="time_group_norm", use_causal_conv=False,
        )
        torch.manual_seed(0)
        hf = transformers.EncodecModel(hf_cfg)
        path = tmp_path / "encodec_hf_tiny.pth"
        torch.save(hf.state_dict(), str(path))
        cfg = EncodecConfig(
            sample_rate=1600, channels=2, dimension=8, n_filters=2,
            ratios=(5, 4, 2), n_q=int(hf.quantizer.get_num_quantizers_for_bandwidth(0.5)),
            bins=16, causal=False, norm="time_group_norm",
        )
        report = verify_codec(str(path), min_snr_db=-1e9, sweep_seconds=0.5,
                              config=cfg)
        assert report["checks"]["key_coverage"] is True
        assert report["checks"]["param_coverage"] is True
        assert report["ok"] is True

    def test_cli_main_json_output(self, ckpt_path, tmp_path, monkeypatch):
        import jen1_tpu.ckpt.verify_weights as vw

        cfg, path = ckpt_path
        out = tmp_path / "report.json"
        real_verify = vw.verify_codec
        monkeypatch.setattr(  # route the CLI through the tiny config
            vw, "verify_codec",
            lambda p, **kw: real_verify(p, config=cfg, **kw),
        )
        rc = vw.main(["--codec-weights", path, "--min-snr-db=-1e9",
                      "--sweep-seconds", "0.5", "--json", str(out)])
        assert rc == 0
        report = json.loads(out.read_text())
        assert report["ok"] is True
