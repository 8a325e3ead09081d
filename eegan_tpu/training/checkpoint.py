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
        try:
            restored = self._mgr.restore(
                epoch, args=ocp.args.StandardRestore(template))
        except Exception as first_err:
            if template.g_ema is None:
                raise
            # Recoverable only if TRAIN.G_EMA_DECAY was turned on after this
            # checkpoint was written (saved tree lacks g_ema/attr_ema):
            # restore without them and seed the EMA from the restored params.
            # Any other failure (transient I/O, corruption in a checkpoint
            # that DOES contain the EMA subtrees) must surface, not be
            # "fixed" by silently resetting the EMA — the bare restore below
            # fails on structure mismatch in that case and we re-raise the
            # original error.
            import jax
            import jax.numpy as jnp

            bare = template.replace(g_ema=None, attr_ema=None)
            try:
                restored = self._mgr.restore(
                    epoch, args=ocp.args.StandardRestore(bare))
            except Exception:
                raise first_err
            copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
            restored = restored.replace(g_ema=copy(restored.g_params),
                                        attr_ema=copy(restored.attr_params))
        return restored, int(epoch)

    # -- epoch-stamped generator snapshots (eval sweep input) ----------
    def save_generator(self, epoch: int, state: TrainState) -> str:
        """netG_{epoch} + attr_enhance_{epoch} (reference train.py:308-315).

        These snapshots exist solely to feed the evaluation sweep
        (`test.py` / FID / IS), so when G-EMA is on they carry the EMA
        params — the eval-quality weights — not the raw optimizer iterate
        (the raw params live in the full-state resume checkpoints)."""
        g_p = state.g_ema if state.g_ema is not None else state.g_params
        a_p = state.attr_ema if state.attr_ema is not None else state.attr_params
        path = os.path.join(self.model_dir, f"netG_{epoch}")
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, {"g_params": g_p,
                          "g_stats": state.g_stats,
                          "attr_params": a_p}, force=True)
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
