"""PyTorch checkpoint/state-dict -> autovc_tpu pytree conversion.

The reference ships three checkpoint formats (SURVEY.md §5 checkpoint/resume):
  * AutoEncoder: ``{"step", "model_state", "optimizer_state"}``
    (auto_encoder/model.py:171-176)
  * SpeakerEncoder: ``{"step", "model_state", "speakers"}``
    (speaker_encoder/model.py:106-114)
  * WaveRNN: bare ``state_dict`` (wavernn/model.py:478-482)

This module maps those tensors onto our pytrees.  Layout notes:
  * torch ``nn.LSTM``/``nn.GRU`` keep gate order (i,f,g,o)/(r,z,n) — the same
    order our fused kernels use — but store ``weight_ih_l{k}`` as (4H, I);
    we store (I, 4H), so conversion is a transpose.
  * bidirectional LSTMs add ``_reverse``-suffixed tensors per layer.
  * conv weights share the (O, I, K) layout — straight copy.

Only numpy is required here; the functions accept any mapping of
name -> array-like (a real torch ``state_dict`` works via ``.numpy()``).
"""
from __future__ import annotations

import numpy as np


def _np(t):
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _key(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


def lstm_layer_from_torch(sd, prefix: str, layer: int, reverse: bool = False):
    suf = f"_l{layer}" + ("_reverse" if reverse else "")
    return {
        "w_ih": _np(sd[_key(prefix, f"weight_ih{suf}")]).T,
        "w_hh": _np(sd[_key(prefix, f"weight_hh{suf}")]).T,
        "b_ih": _np(sd[_key(prefix, f"bias_ih{suf}")]),
        "b_hh": _np(sd[_key(prefix, f"bias_hh{suf}")]),
    }


gru_layer_from_torch = lstm_layer_from_torch  # identical tensor layout


def lstm_stack_from_torch(sd, prefix: str, num_layers: int):
    return [lstm_layer_from_torch(sd, prefix, i) for i in range(num_layers)]


def bilstm_stack_from_torch(sd, prefix: str, num_layers: int):
    return [{"fwd": lstm_layer_from_torch(sd, prefix, i),
             "bwd": lstm_layer_from_torch(sd, prefix, i, reverse=True)}
            for i in range(num_layers)]


def linear_from_torch(sd, prefix: str):
    p = {"w": _np(sd[_key(prefix, "weight")])}
    if _key(prefix, "bias") in sd:
        p["b"] = _np(sd[_key(prefix, "bias")])
    return p


def conv1d_from_torch(sd, prefix: str):
    p = {"w": _np(sd[_key(prefix, "weight")])}
    if _key(prefix, "bias") in sd:
        p["b"] = _np(sd[_key(prefix, "bias")])
    return p


def batchnorm_from_torch(sd, prefix: str):
    return {
        "scale": _np(sd[_key(prefix, "weight")]),
        "bias": _np(sd[_key(prefix, "bias")]),
        "mean": _np(sd[_key(prefix, "running_mean")]),
        "var": _np(sd[_key(prefix, "running_var")]),
    }


def conv_bn_from_torch(sd, conv_prefix: str, bn_prefix: str):
    return {"conv": conv1d_from_torch(sd, conv_prefix),
            "bn": batchnorm_from_torch(sd, bn_prefix)}
