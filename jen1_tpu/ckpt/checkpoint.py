"""Orbax-backed checkpoint lifecycle.

Capability parity with the reference (utils/script_util.py:49-148,
trainer.py:77-83): step- and loss-stamped checkpoints, latest-by-step and
best-by-loss discovery, keep-k-best garbage collection, and shape-tolerant
partial restore for finetuning (`load_model_diffsize`). Multi-host-safe and
async-capable via orbax instead of torch.save files.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 3,
        keep_best: bool = True,
    ):
        """keep_best=True retains the k lowest-loss checkpoints (reference
        cleanup_checkpoints keep=3, script_util.py:65-76); False keeps the k
        most recent."""
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m["loss"]) if keep_best else None,
            best_mode="min",
            create=True,
        )
        self.manager = ocp.CheckpointManager(directory, options=options)
        self.directory = directory

    # ---------------------------------------------------------------- save

    def save(
        self,
        step: int,
        state: Any,
        *,
        loss: float,
        learning_rate: Optional[float] = None,
        extra_meta: Optional[Dict[str, Any]] = None,
        wait: bool = True,
    ) -> None:
        """Save a pytree state (e.g. TrainState) with loss/lr metadata
        (reference stores {'model','epoch','optimizer','learning_rate'},
        script_util.py:85-88). extra_meta rides along in the JSON sidecar
        (e.g. best_val / data-iterator position for deterministic resume)."""
        metrics = {"loss": float(loss)}
        if learning_rate is not None:
            metrics["learning_rate"] = float(learning_rate)
        meta = dict(metrics)
        if extra_meta:
            meta.update(extra_meta)
        self.manager.save(
            int(step),
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
            metrics=metrics,
        )
        if wait:
            self.manager.wait_until_finished()

    # ------------------------------------------------------------- restore

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def best_step(self) -> Optional[int]:
        return self.manager.best_step()

    def restore(self, step: Optional[int] = None, template: Any = None):
        """Restore state at `step` (default: latest). With a `template`
        pytree, dtypes/shardings follow the template."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return None
        if template is not None:
            restored = self.manager.restore(
                step,
                args=ocp.args.Composite(
                    state=ocp.args.StandardRestore(template),
                    meta=ocp.args.JsonRestore(),
                ),
            )
        else:
            restored = self.manager.restore(step)
        return restored["state"], restored.get("meta", {})

    def restore_best(self, template: Any = None):
        step = self.best_step()
        if step is None:
            return None
        return self.restore(step, template)

    # ------------------------------------------- shape-tolerant finetuning

    def restore_partial(self, template: Any, step: Optional[int] = None):
        """Copy only shape-matching leaves from the checkpoint into a copy of
        `template`, warning on mismatches — the reference's
        `load_model_diffsize` (script_util.py:125-148)."""
        if step is None:
            step = self.latest_step()
        assert step is not None, "no checkpoint to restore"
        raw = self.manager.restore(step)
        saved = raw["state"]
        skipped = []

        flat_saved = _flatten(saved)

        def merge(path, leaf):
            key = path
            if key in flat_saved and np.shape(flat_saved[key]) == np.shape(leaf):
                return jax.numpy.asarray(flat_saved[key], dtype=leaf.dtype)
            skipped.append(key)
            return leaf

        merged = _map_with_path(merge, template)
        return merged, skipped


def _flatten(tree, prefix=()) -> Dict[tuple, Any]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (str(k),)))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, prefix + (str(i),)))
    else:
        out[prefix] = tree
    return out


def _map_with_path(fn, tree, prefix=()):
    if isinstance(tree, dict):
        return {k: _map_with_path(fn, v, prefix + (str(k),)) for k, v in tree.items()}
    if isinstance(tree, (list, tuple)):
        t = [_map_with_path(fn, v, prefix + (str(i),)) for i, v in enumerate(tree)]
        return type(tree)(t)
    return fn(prefix, tree)
