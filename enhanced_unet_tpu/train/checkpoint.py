"""Checkpointing with the reference's best-mIoU gating semantics.

Parity target: reference train_eval.py:1143-1151 (save
{epoch, model/optimizer state, best_miou, best_loss, history} on new-best
val mIoU) and 1188-1202 (load with default-path fallback).

Uses orbax PyTreeCheckpointer for the train-state pytree; the history dict
and scalar metadata ride alongside as JSON so they remain human-readable.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


def _meta_path(path: str) -> str:
    return os.path.join(path, "meta.json")


def save_checkpoint(
    path: str,
    state,
    epoch: int,
    best_miou: float,
    best_loss: float,
    history: Dict,
) -> None:
    """Write train state + metadata; overwrites any existing checkpoint."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    tree = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    ckptr.save(os.path.join(path, "state"), tree, force=True)
    meta = {
        "epoch": int(epoch),
        "best_miou": float(best_miou),
        "best_loss": float(best_loss),
        "history": jax.tree.map(
            lambda x: np.asarray(x).tolist() if hasattr(x, "tolist") else x,
            history,
        ),
    }
    with open(_meta_path(path), "w", encoding="utf-8") as f:
        json.dump(meta, f)


def load_checkpoint(path: str, state) -> Tuple[Any, Dict]:
    """Restore into an existing TrainState template; returns (state, meta)."""
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = ckptr.restore(
        os.path.join(path, "state"),
        args=ocp.args.PyTreeRestore(template),
    )
    meta: Dict = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path), "r", encoding="utf-8") as f:
            meta = json.load(f)
    state = state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return state, meta


def checkpoint_exists(path: str) -> bool:
    return os.path.exists(_meta_path(os.path.abspath(path)))
