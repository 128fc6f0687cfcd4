"""FAD vs the PyTorch reference (VERDICT r1 #4): the north-star "FAD parity"
as an actual measurement, not machinery.

Protocol in jen1_tpu/eval/fad_reference.py: shared random-weight checkpoint,
matched injected noise, shared codec decode, FAD over the two audio sets.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def report():
    from jen1_tpu.eval.fad_reference import fad_against_reference

    return fad_against_reference(
        n_clips=4, latent_len=24, steps=16, sampling=4, seed=0,
        with_control=True,
    )


@pytest.mark.slow
class TestFADAgainstReference:
    def test_matched_seed_fad_near_zero(self, report):
        """Identical noise through both frameworks' samplers at one shared
        checkpoint -> near-identical audio -> FAD ~ 0."""
        assert np.isfinite(report["fad_matched"])
        assert report["fad_matched"] < 1e-2, report

    def test_matched_fad_far_below_control(self, report):
        """The control (different seeds) shows the metric's scale: matched
        FAD must be orders of magnitude smaller — the number means parity,
        not metric blindness."""
        assert report["fad_control"] > 100 * max(report["fad_matched"], 1e-12), report

    def test_latent_parity(self, report):
        assert report["latent_rel_err"] < 5e-2, report

    def test_cli_against_reference(self, monkeypatch, capsys):
        """jen1-eval --against-reference prints a one-line JSON report."""
        import jen1_tpu.eval.fad_reference as fr
        import jen1_tpu.eval.run_eval as re_mod

        # tiny shapes for CLI speed: shrink the defaults through the seam
        real = fr.fad_against_reference
        monkeypatch.setattr(
            fr, "fad_against_reference",
            lambda **kw: real(**{**kw, "n_clips": 2, "latent_len": 24,
                                 "steps": 16, "sampling": 4,
                                 "with_control": False}),
        )
        rc = re_mod.main(["--against-reference", "--n-clips", "2"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert "fad_matched" in out and np.isfinite(out["fad_matched"])
