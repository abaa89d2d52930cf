"""Checkpoint / resume for training.

Rebuild of the reference's checkpoint conventions
(``/root/reference/scripts/training/train_timestamps.py:894-1074``,
``train_fsdp_timestamps.py:931-1133``): periodic ``checkpoint_<step>`` pruned to
the latest, ``latesttrain`` each epoch, ``besteval`` on WER improvement, plus an
eval-ready inference checkpoint handed to async eval. State includes step,
epoch, best_eval_wer, params, optimizer, and dims.

Storage is Orbax (sharded, async-capable) — the TPU-native replacement for
torch.save of FULL_STATE_DICTs; ``save_eval_checkpoint`` emits the torch-free
``.npz`` interchange format (and ``.pt`` export lives in models/convert.py).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax

from olmoasr_tpu.models.dims import ModelDimensions
from olmoasr_tpu.training.train import TrainState


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


class CheckpointManager:
    """Directory layout:

    <ckpt_dir>/
      step_<N>/            orbax composite: state (params/opt/step) + meta
      latest -> step_<N>   (tracked via orbax's own step bookkeeping)
    """

    def __init__(self, ckpt_dir: str, *, max_to_keep: int = 1):
        ocp = _ocp()
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(
        self,
        step: int,
        state: TrainState,
        dims: ModelDimensions,
        *,
        epoch: int = 0,
        best_eval_wer: Optional[float] = None,
        wait: bool = False,
    ) -> None:
        ocp = _ocp()
        meta = {
            "dims": dims.to_dict(),
            "epoch": epoch,
            "global_step": step,
            "best_eval_wer": best_eval_wer,
        }
        self.manager.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                meta=ocp.args.JsonSave(meta),
            ),
        )
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(
        self, state_template: TrainState, step: Optional[int] = None
    ) -> Tuple[TrainState, Dict[str, Any]]:
        ocp = _ocp()
        step = step if step is not None else self.manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.ckpt_dir}")
        restored = self.manager.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(state_template),
                meta=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["meta"]

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


def save_eval_checkpoint(path: str, state: TrainState, dims: ModelDimensions):
    """Inference-ready checkpoint for the async eval subprocess
    (train_fsdp_timestamps.py:991-1021 'eval_*' analog): strips the padding
    embedding row like gen_inf_ckpt.py."""
    from olmoasr_tpu.models.convert import save_npz_checkpoint, strip_padding_row

    params = jax.tree.map(np.asarray, state.params)
    save_npz_checkpoint(path, strip_padding_row(params), dims)


def resume_or_init(
    ckpt_dir: str,
    init_fn,
    dims: ModelDimensions,
) -> Tuple[TrainState, Dict[str, Any], "CheckpointManager"]:
    """Run-id style resume (train_timestamps.py:2196-2205): if a checkpoint
    exists, restore it; else start fresh."""
    mgr = CheckpointManager(ckpt_dir)
    template = init_fn()
    if mgr.latest_step() is not None:
        state, meta = mgr.restore(template)
        return state, meta, mgr
    return template, {"epoch": 0, "global_step": 0, "best_eval_wer": None}, mgr
