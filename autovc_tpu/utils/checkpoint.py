"""Checkpoint save/load for autovc_tpu pytrees.

Native format: a single ``.ckpt`` file — pickled dict of numpy leaves plus
metadata (mirroring the reference's three torch formats, SURVEY.md §5):
  * auto_encoder:    {step, params, ema_params?, opt_state?}
  * speaker_encoder: {step, params, speakers}
  * vocoder:         {params}

Unlike the reference (which saves optimizer state but never restores it,
auto_encoder/model.py:149-156), ``load`` returns everything that was saved so
resume is exact.  Reference ``.pt``/``.pyt`` files load transparently through
:mod:`autovc_tpu.utils.torch_compat`.
"""
from __future__ import annotations

import os
import pickle
from typing import Any, Dict

import jax
import numpy as np

FORMAT_VERSION = 1


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, payload: Dict[str, Any]) -> None:
    """Atomically write a checkpoint (tmp + rename, so a preempted save never
    corrupts the previous one — part of the failure-recovery story)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    blob = {"format_version": FORMAT_VERSION}
    for k, v in payload.items():
        blob[k] = _to_numpy_tree(v)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(blob, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    if _is_torch_checkpoint(path):
        raise ValueError(
            f"{path} is a PyTorch checkpoint; use load_model() which converts "
            "it via torch_compat")
    with open(path, "rb") as f:
        blob = pickle.load(f)
    blob.pop("format_version", None)
    return blob


def _is_torch_checkpoint(path: str) -> bool:
    if path.endswith((".pt", ".pyt", ".pth")):
        return True
    # torch zipfile serialization magic
    try:
        with open(path, "rb") as f:
            head = f.read(4)
        return head == b"PK\x03\x04"
    except OSError:
        return False


def latest_checkpoint(model_dir: str, suffix: str = ".ckpt") -> str | None:
    """Most recently modified checkpoint in a directory (resume-from-latest,
    the preemption-recovery primitive the reference lacks)."""
    if not os.path.isdir(model_dir):
        return None
    cands = [os.path.join(model_dir, f) for f in os.listdir(model_dir)
             if f.endswith(suffix)]
    if not cands:
        return None
    return max(cands, key=os.path.getmtime)
