"""Orbax checkpointing with full train-state resume.

The reference only ever *saves* generator weights (epoch-stamped) and
overwrites a single file per discriminator; optimizer state is never saved
and `start_epoch` is hardcoded to 1, so true resume is impossible
(reference `train.py:133,308-319`; SURVEY.md §5). Here the whole TrainState
(params, BN stats, optimizer moments, step) round-trips through Orbax, and
epoch-stamped generator-only checkpoints are still written so the evaluation
sweep (`test.py`) keeps its reference-shaped input.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import orbax.checkpoint as ocp

from eegan_tpu.training.state import FrozenEncoders, TrainState


class CheckpointManager:
    def __init__(self, model_dir: str, max_to_keep: Optional[int] = None):
        self.model_dir = os.path.abspath(model_dir)
        os.makedirs(self.model_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.model_dir, "state"),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    # -- full train state (resume) -------------------------------------
    def save_state(self, epoch: int, state: TrainState) -> None:
        self._mgr.save(epoch, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore_state(self, template: TrainState,
                      epoch: Optional[int] = None) -> Tuple[TrainState, int]:
        epoch = epoch if epoch is not None else self._mgr.latest_step()
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {self.model_dir}")
        restored = self._mgr.restore(
            epoch, args=ocp.args.StandardRestore(template))
        return restored, int(epoch)

    # -- epoch-stamped generator snapshots (eval sweep input) ----------
    def save_generator(self, epoch: int, state: TrainState) -> str:
        """netG_{epoch} + attr_enhance_{epoch} (reference train.py:308-315)."""
        path = os.path.join(self.model_dir, f"netG_{epoch}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"g_params": state.g_params,
                          "g_stats": state.g_stats,
                          "attr_params": state.attr_params}, force=True)
        ckptr.wait_until_finished()
        return path

    def load_generator(self, epoch: int, template: Any) -> Any:
        path = os.path.join(self.model_dir, f"netG_{epoch}")
        ckptr = ocp.StandardCheckpointer()
        return ckptr.restore(path, target=template)

    def available_generator_epochs(self):
        out = []
        for name in os.listdir(self.model_dir):
            if name.startswith("netG_"):
                try:
                    out.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return sorted(out)

    # -- frozen encoders (converted once from torch) -------------------
    def save_frozen(self, frozen: FrozenEncoders, path: Optional[str] = None) -> str:
        path = path or os.path.join(self.model_dir, "frozen_encoders")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"text_vars": frozen.text_vars,
                          "image_vars": frozen.image_vars}, force=True)
        ckptr.wait_until_finished()
        return path

    def load_frozen(self, template: FrozenEncoders,
                    path: Optional[str] = None) -> FrozenEncoders:
        path = path or os.path.join(self.model_dir, "frozen_encoders")
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path, target={
            "text_vars": template.text_vars,
            "image_vars": template.image_vars})
        return FrozenEncoders(**restored)

    def close(self):
        self._mgr.close()
