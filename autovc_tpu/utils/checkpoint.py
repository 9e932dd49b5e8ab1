"""Checkpoint save/load for autovc_tpu pytrees.

Native format (v2): one ``.ckpt`` file that is a ZIP container holding

  * ``manifest.json`` — the payload tree with every array leaf replaced by a
    ``{"__tensor__": name}`` reference (dicts/lists stay native JSON;
    tuples/namedtuples carry an explicit marker so structure round-trips);
  * one raw ``.npy`` member per tensor (``np.lib.format``, never pickled).

This replaces the v1 pickled-dict format: loading a checkpoint no longer
executes arbitrary bytecode (``pickle.load`` of an untrusted file is code
execution), the container is inspectable with any zip tool, and partial
reads are possible.  v1 files still load through a shim (format detected by
magic, not suffix).

Contents mirror the reference's three torch formats (SURVEY.md §5):
  * auto_encoder:    {step, params, ema_params?, opt_state?}
  * speaker_encoder: {step, params, speakers}
  * vocoder:         {params}

Unlike the reference (which saves optimizer state but never restores it,
auto_encoder/model.py:149-156), ``load`` returns everything that was saved so
resume is exact.  Optimizer states are namedtuple pytrees; load them back
into structure with :func:`restore_like`.  Reference ``.pt``/``.pyt`` files
load transparently through :mod:`autovc_tpu.utils.torch_compat`.

``save_checkpoint(..., block=False)`` snapshots the pytree to host memory
synchronously (cheap) and performs the file write on a background thread, so
periodic saves never stall the training step; call :func:`wait_for_saves`
before relying on the file.
"""
from __future__ import annotations

import io
import json
import os
import threading
import zipfile
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict

import jax
import numpy as np

FORMAT_VERSION = 2
_MANIFEST = "manifest.json"

# ---------------------------------------------------------------------------
# Tree <-> (manifest, tensors) codec
# ---------------------------------------------------------------------------


def _is_array(x) -> bool:
    return hasattr(x, "shape") and hasattr(x, "dtype")


def _encode(node, tensors: Dict[str, np.ndarray]):
    """Payload tree -> JSON-able manifest tree + tensor table."""
    if _is_array(node):
        name = f"t{len(tensors)}"
        arr = np.asarray(node)
        if arr.dtype.kind == "V" or arr.dtype.name == "bfloat16":
            # np.lib.format cannot store extension dtypes (ml_dtypes
            # bfloat16) without pickle; store the raw bits + dtype tag.
            tensors[name] = arr.view(np.uint16) \
                if arr.dtype.name == "bfloat16" else arr.view(np.uint8)
            return {"__tensor__": name, "__viewed__": arr.dtype.name}
        tensors[name] = arr
        return {"__tensor__": name}
    if isinstance(node, dict):
        assert all(isinstance(k, str) and not k.startswith("__")
                   for k in node), f"unserialisable dict keys: {list(node)}"
        return {k: _encode(v, tensors) for k, v in node.items()}
    if isinstance(node, tuple):
        enc = {"__tuple__": [_encode(v, tensors) for v in node]}
        if hasattr(node, "_fields"):                   # namedtuple (optax)
            enc["__fields__"] = list(node._fields)
        return enc
    if isinstance(node, list):
        return [_encode(v, tensors) for v in node]
    if node is None or isinstance(node, (bool, int, float, str)):
        return node
    if isinstance(node, (np.integer, np.floating)):
        return node.item()
    raise TypeError(f"cannot serialise checkpoint leaf of type "
                    f"{type(node).__name__}")


def _decode(node, tensors):
    """Manifest tree -> payload tree.  Namedtuples come back as plain dicts
    keyed by field name (rebuild real structure with :func:`restore_like`)."""
    if isinstance(node, dict):
        if "__tensor__" in node:
            arr = tensors(node["__tensor__"])
            viewed = node.get("__viewed__")
            if viewed == "bfloat16":
                import ml_dtypes
                arr = arr.view(ml_dtypes.bfloat16)
            return arr
        if "__tuple__" in node:
            items = [_decode(v, tensors) for v in node["__tuple__"]]
            if "__fields__" in node:
                return dict(zip(node["__fields__"], items))
            return tuple(items)
        return {k: _decode(v, tensors) for k, v in node.items()}
    if isinstance(node, list):
        return [_decode(v, tensors) for v in node]
    return node


def restore_like(target, loaded):
    """Rebuild ``loaded`` (a :func:`load_checkpoint` tree) in the exact
    structure of ``target`` — namedtuples (optax states), tuples and lists
    regain their types.  Use for resuming optimizer state:

        opt_state = restore_like(tx.init(params), blob["opt_state"])
    """
    if isinstance(target, tuple) and hasattr(target, "_fields"):
        vals = [loaded[f] if isinstance(loaded, dict) else getattr(loaded, f)
                for f in target._fields]
        return type(target)(*[restore_like(t, v)
                              for t, v in zip(target, vals)])
    if isinstance(target, tuple):
        return tuple(restore_like(t, v) for t, v in zip(target, loaded))
    if isinstance(target, list):
        return [restore_like(t, v) for t, v in zip(target, loaded)]
    if isinstance(target, dict):
        return {k: restore_like(v, loaded[k]) for k, v in target.items()}
    return loaded


# ---------------------------------------------------------------------------
# Save (atomic, optionally async)
# ---------------------------------------------------------------------------

_EXECUTOR: ThreadPoolExecutor | None = None
_PENDING: list[Future] = []
_LOCK = threading.Lock()


def _write(path: str, manifest: dict, tensors: Dict[str, np.ndarray]):
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    # arrays are incompressible noise-like floats: ZIP_STORED skips the
    # pointless deflate pass
    with zipfile.ZipFile(tmp, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr(_MANIFEST, json.dumps(manifest))
        for name, arr in tensors.items():
            buf = io.BytesIO()
            np.lib.format.write_array(buf, arr, allow_pickle=False)
            zf.writestr(name + ".npy", buf.getvalue())
    os.replace(tmp, path)   # atomic: a preempted save never corrupts


def save_checkpoint(path: str, payload: Dict[str, Any],
                    block: bool = True) -> None:
    """Write a checkpoint atomically (tmp + rename).

    ``block=False`` returns as soon as the pytree is snapshotted to host
    numpy; the serialisation + file write run on a background thread (one
    writer thread, so saves to the same path stay ordered).  A failure in a
    background save raises on the next save/:func:`wait_for_saves` call.
    """
    global _EXECUTOR
    tensors: Dict[str, np.ndarray] = {}
    manifest = {"format_version": FORMAT_VERSION,
                "payload": _encode(payload, tensors)}
    if block:
        _write(path, manifest, tensors)
        return
    with _LOCK:
        if _EXECUTOR is None:
            _EXECUTOR = ThreadPoolExecutor(max_workers=1,
                                           thread_name_prefix="ckpt-save")
        _reap_pending()
        _PENDING.append(_EXECUTOR.submit(_write, path, manifest, tensors))


def _reap_pending():
    done = [f for f in _PENDING if f.done()]
    for f in done:
        _PENDING.remove(f)
        f.result()   # surface background write errors


def wait_for_saves() -> None:
    """Block until every async save has hit disk (call before exit/eval)."""
    with _LOCK:
        while _PENDING:
            _PENDING.pop(0).result()


# ---------------------------------------------------------------------------
# Load
# ---------------------------------------------------------------------------


def load_checkpoint(path: str, allow_v1: bool = False) -> Dict[str, Any]:
    """Load a checkpoint.  v2 zip containers load pickle-free.

    ``allow_v1=True`` additionally accepts the legacy v1 pickled-dict format
    written by early versions of this framework.  It is OFF by default
    because ``pickle.load`` of an untrusted file is arbitrary code
    execution — only enable it for files you wrote yourself.
    """
    if _is_torch_checkpoint(path):
        raise ValueError(
            f"{path} is a PyTorch checkpoint; use load_model() which converts "
            "it via torch_compat")
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":                      # v2 zip container
        with zipfile.ZipFile(path) as zf:
            manifest = json.loads(zf.read(_MANIFEST))

            def tensor(name):
                return np.lib.format.read_array(
                    io.BytesIO(zf.read(name + ".npy")), allow_pickle=False)

            return _decode(manifest["payload"], tensor)
    # v1 legacy shim: a pickled dict of numpy leaves written by rounds 1-2.
    if head[:1] != b"\x80" or not allow_v1:   # \x80 = pickle PROTO opcode
        raise ValueError(
            f"{path} is not a v2 checkpoint"
            + ("" if allow_v1 else
               " (if it is a legacy v1 pickle YOU wrote, pass allow_v1=True"
               " — v1 loading executes pickle bytecode and is opt-in)"))
    import pickle
    with open(path, "rb") as f:
        blob = pickle.load(f)
    blob.pop("format_version", None)
    return blob


def _is_torch_checkpoint(path: str) -> bool:
    if path.endswith((".pt", ".pyt", ".pth")):
        return True
    # Both torch's serialisation and our v2 format are zipfiles; ours is
    # identified by its manifest member, torch's by its pickle payload.
    try:
        with open(path, "rb") as f:
            head = f.read(4)
        if head != b"PK\x03\x04":
            return False
        with zipfile.ZipFile(path) as zf:
            return _MANIFEST not in zf.namelist()
    except (OSError, zipfile.BadZipFile):
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
