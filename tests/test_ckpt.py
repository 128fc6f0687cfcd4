"""Checkpoint lifecycle tests (orbax manager + tolerant restore)."""

import jax.numpy as jnp
import numpy as np
import pytest

from jen1_tpu.ckpt.checkpoint import CheckpointManager


def make_state(scale=1.0):
    return {
        "params": {
            "layer": {"kernel": jnp.full((4, 4), scale), "bias": jnp.zeros((4,))}
        },
        "step": jnp.asarray(7, jnp.int32),
    }


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        state = make_state(2.0)
        mngr.save(10, state, loss=1.5, learning_rate=3e-5)
        assert mngr.latest_step() == 10
        restored, meta = mngr.restore(template=make_state())
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["layer"]["kernel"]),
            np.full((4, 4), 2.0),
        )
        assert meta["loss"] == 1.5
        assert meta["learning_rate"] == 3e-5

    def test_keep_best_k(self, tmp_path):
        mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
        for step, loss in [(1, 5.0), (2, 1.0), (3, 3.0), (4, 2.0)]:
            mngr.save(step, make_state(step), loss=loss)
        steps = sorted(mngr.manager.all_steps())
        # lowest-loss checkpoints survive: steps 2 (1.0) and 4 (2.0)
        assert steps == [2, 4], steps
        assert mngr.best_step() == 2

    def test_restore_best(self, tmp_path):
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(1, make_state(1.0), loss=3.0)
        mngr.save(2, make_state(2.0), loss=1.0)
        mngr.save(3, make_state(3.0), loss=2.0)
        restored, _ = mngr.restore_best(template=make_state())
        np.testing.assert_array_equal(
            np.asarray(restored["params"]["layer"]["kernel"]), np.full((4, 4), 2.0)
        )

    def test_restore_none_when_empty(self, tmp_path):
        mngr = CheckpointManager(str(tmp_path / "empty"))
        assert mngr.restore() is None

    def test_partial_restore_shape_tolerant(self, tmp_path):
        """load_model_diffsize capability (script_util.py:125-148)."""
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(1, {"params": {"a": jnp.ones((3, 3)), "b": jnp.ones((2,))}},
                  loss=1.0)
        template = {"params": {"a": jnp.zeros((3, 3)), "b": jnp.zeros((5,))}}
        merged, skipped = mngr.restore_partial(template)
        np.testing.assert_array_equal(np.asarray(merged["params"]["a"]), np.ones((3, 3)))
        np.testing.assert_array_equal(np.asarray(merged["params"]["b"]), np.zeros((5,)))
        assert skipped == [("params", "b")]


class TestTorchImportHelpers:
    def test_orig_mod_prefix_stripped(self):
        from jen1_tpu.ckpt.torch_import import _SD

        sd = _SD({"_orig_mod.layer.weight": np.ones((2, 3), np.float32)})
        assert "layer.weight" in sd
        p = sd.lin_nobias("layer")
        assert p["kernel"].shape == (3, 2)
