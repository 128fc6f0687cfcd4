"""Integration tests of the training entrypoint (train/train.py run()):
end-to-end on precomputed latents, plus deterministic kill-and-resume
(VERDICT r1 weak #7 / next-round #8: the reference replays data from scratch
and resets best-loss tracking on resume, train.py:63-81)."""

import json
import os

import numpy as np
import pytest

from jen1_tpu.config import tiny_test_config
from jen1_tpu.train.train import run

# compile-heavy end-to-end module: excluded from `pytest -m 'not slow'`
pytestmark = pytest.mark.slow


def _write_latents(path, n_files=8, frames=48, dim=8, seed=0):
    os.makedirs(path, exist_ok=True)
    rng = np.random.default_rng(seed)
    for i in range(n_files):
        np.save(
            os.path.join(path, f"clip{i}.npy"),
            rng.normal(size=(frames, dim)).astype(np.float32),
        )
        with open(os.path.join(path, f"clip{i}.json"), "w") as f:
            json.dump({"prompt": f"song {i}"}, f)


def _config(tmp_path, tag):
    cfg = tiny_test_config()
    cfg.dataset_config.latents_dir = str(tmp_path / "latents")
    cfg.dataset_config.batch_size = 3
    cfg.dataset_config.train_test_split = 0.5
    cfg.save_dir = str(tmp_path / f"ckpt_{tag}")
    cfg.log_dir = str(tmp_path / f"logs_{tag}")
    cfg.eval_interval = 2
    cfg.num_epoch = 100
    cfg.parallel_config.dp = 1  # single-device: batch 3 need not divide dp
    cfg.conditioner_config.cond_dim = 16
    cfg.conditioner_config.t5_config.t5_model_name = "tiny-test"
    cfg.conditioner_config.t5_config.max_length = 6
    return cfg


def _read_losses(log_dir):
    losses = {}
    with open(os.path.join(log_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "loss/train" in rec:
                losses[rec["step"]] = rec["loss/train"]
    return losses


@pytest.fixture(scope="module")
def latents_dir(tmp_path_factory):
    p = tmp_path_factory.mktemp("train_cli")
    _write_latents(p / "latents")
    return p


@pytest.fixture(scope="module")
def full_run(latents_dir):
    """ONE 5-step profiled run shared by the tests below: each run() call
    recompiles the train/eval graphs, which on this 1-core host costs minutes
    — the assertions (checkpointing, loss trajectory, profile trace) are
    independent reads of the same run's artifacts."""
    cfg = _config(latents_dir, "full")
    state = run(cfg, max_steps=5, profile=True)
    return cfg, state


class TestTrainCLI:
    def test_run_trains_and_checkpoints(self, full_run):
        cfg, state = full_run
        assert int(state.step) == 5
        losses = _read_losses(cfg.log_dir)
        assert losses and all(np.isfinite(v) for v in losses.values())
        from jen1_tpu.ckpt.checkpoint import CheckpointManager

        assert CheckpointManager(cfg.save_dir).latest_step() is not None

    def test_resume_reproduces_trajectory(self, latents_dir, full_run):
        """Kill after 3 steps, resume, and match the unkilled run's losses at
        the same global steps (VERDICT done-criterion for item #8). The
        unkilled baseline is the shared full_run (profiling does not change
        the computed trajectory)."""
        full_cfg, _ = full_run
        full_losses = _read_losses(full_cfg.log_dir)

        kill_cfg = _config(latents_dir, "killed")
        run(kill_cfg, max_steps=3)  # ckpt saved at the step-2 eval
        resumed = run(kill_cfg, max_steps=3)  # resumes from step 2 -> 5
        assert int(resumed.step) == 5
        res_losses = _read_losses(kill_cfg.log_dir)
        for step in (4, 5):
            assert step in res_losses and step in full_losses
            np.testing.assert_allclose(
                res_losses[step], full_losses[step], rtol=1e-5,
                err_msg=f"resumed trajectory diverged at step {step}",
            )

    def test_profile_flag_writes_trace(self, full_run):
        """--profile captures a jax.profiler trace of steps 2-4 (SURVEY §5:
        absent in the reference)."""
        cfg, _ = full_run
        import glob

        traces = glob.glob(
            os.path.join(cfg.log_dir, "**", "*.trace.json.gz"), recursive=True
        ) + glob.glob(
            os.path.join(cfg.log_dir, "**", "*.xplane.pb"), recursive=True
        )
        assert traces, os.listdir(cfg.log_dir)
