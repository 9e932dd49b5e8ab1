"""Device mesh + sharding rules.

The reference has **no** distributed execution (single GPU; SURVEY.md §2c).
This module is the first-class replacement: an explicit
``jax.sharding.Mesh`` with a ``data`` axis (DP) and an optional ``model``
axis (TP), plus a regex rule table mapping parameter paths to
``PartitionSpec``s.  Everything else is GSPMD: the train/convert steps are
written once as global-semantics functions and jitted with these shardings —
XLA inserts the psum/all-gather collectives over ICI.

Model-parallel notes: these models (~30 M params max) fit on one chip, so TP
is a mechanism, not a necessity — the rule table shards the widest matmuls
(decoder LSTM gates, WaveRNN fc/GRU gates, conv channels) across ``model``
when a mesh with that axis is provided, and degrades to replication on a
data-only mesh.
"""
from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] | None = None,
              axis_names: Tuple[str, ...] = ("data",),
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    ``make_mesh()`` -> 1-D data mesh over all devices;
    ``make_mesh((4, 2), ("data", "model"))`` -> DP x TP grid.
    """
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
        axis_names = axis_names[:1]
    assert int(np.prod(shape)) == len(devices), \
        f"mesh shape {shape} != {len(devices)} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


# Parameter-path regex -> PartitionSpec factory.  Paths look like
# 'decoder/lstm2/0/w_ih', 'encoder/convs/1/conv/w', 'fc1/w'.
# Specs reference the 'model' axis; on a data-only mesh they are filtered to
# replication automatically.
TP_RULES: Tuple[Tuple[str, Tuple], ...] = (
    # LSTM/GRU gate matrices: shard the (gates*H) output dim.
    (r".*/(w_ih|w_hh)$", (None, "model")),
    (r".*/(b_ih|b_hh)$", ("model",)),
    # Conv channels: shard output channels (O, I, K).
    (r".*convs?/\d+/conv/w$", ("model", None, None)),
    (r".*convs?/\d+/conv/b$", ("model",)),
    # Linear layers (O, I): shard the output dim.
    (r".*(proj|linear|fc\d|I)/w$", ("model", None)),
    (r".*(proj|linear|fc\d|I)/b$", ("model",)),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def _spec_for(path: str, leaf, mesh: Mesh, rules) -> P:
    if "model" not in mesh.axis_names:
        return P()
    model_size = mesh.shape["model"]
    for pattern, spec in rules:
        if re.fullmatch(pattern, path):
            if len(spec) > leaf.ndim:
                continue
            # only shard when the dimension divides evenly
            ok = all(ax is None
                     or leaf.shape[i] % model_size == 0
                     for i, ax in enumerate(spec))
            if ok:
                return P(*spec)
    return P()


def param_shardings(params, mesh: Mesh, rules=TP_RULES):
    """NamedSharding tree for a parameter pytree: TP rules where they apply,
    replication otherwise."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, _spec_for(_path_str(path), leaf, mesh, rules)),
        params)


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = None):
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def shard_params(params, mesh: Mesh, rules=TP_RULES):
    """Place a parameter pytree onto the mesh per the rule table."""
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def tree_shardings_like(tree, sharding):
    """A sharding pytree of ``sharding`` for every leaf of ``tree``."""
    return jax.tree_util.tree_map(lambda _: sharding, tree)
