"""1-D convolution + batch-norm + linear blocks.

Covers what the reference gets from ATen: ``ConvNorm``/``LinearNorm``
(auto_encoder/net_layers.py:3-49) and ``nn.BatchNorm1d``.  Convolutions lower
to ``lax.conv_general_dilated`` — XLA already emits near-roofline MXU code
for these (SURVEY.md §2b) — with Xavier-uniform init matching the reference's
``w_init_gain`` semantics.

Layout: (B, C, T) ("NCW"), same as the reference, so checkpoint conversion
is a transpose-free copy for conv weights.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from autovc_tpu.ops import precision as PREC

Params = Dict[str, Any]

_GAINS = {
    "linear": 1.0,
    "relu": math.sqrt(2.0),
    "tanh": 5.0 / 3.0,
    "sigmoid": 1.0,
}

CONV_PRECISION = jax.lax.Precision.HIGHEST


def xavier_uniform(key, shape, gain: float = 1.0, fan_in: int | None = None,
                   fan_out: int | None = None):
    """Xavier/Glorot uniform; for conv weights (O, I, K): fan_in = I*K."""
    if fan_in is None or fan_out is None:
        if len(shape) == 3:  # (O, I, K)
            fan_out = shape[0] * shape[2]
            fan_in = shape[1] * shape[2]
        else:               # (O, I) linear
            fan_out, fan_in = shape
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, minval=-a, maxval=a,
                              dtype=jnp.float32)


def init_conv1d(key, in_channels: int, out_channels: int, kernel_size: int,
                bias: bool = True, w_init_gain: str = "linear") -> Params:
    wkey, bkey = jax.random.split(key)
    p = {"w": xavier_uniform(wkey, (out_channels, in_channels, kernel_size),
                             _GAINS[w_init_gain])}
    if bias:
        # PyTorch Conv1d default bias init: U(-1/sqrt(fan_in), ..)
        k = 1.0 / math.sqrt(in_channels * kernel_size)
        p["b"] = jax.random.uniform(bkey, (out_channels,), minval=-k,
                                    maxval=k, dtype=jnp.float32)
    return p


def conv1d(params: Params, x: jnp.ndarray, padding: int = 0,
           stride: int = 1, dilation: int = 1) -> jnp.ndarray:
    """(B, C_in, T) -> (B, C_out, T')."""
    lhs, rhs = PREC.conv_operands(x, params["w"])
    out = PREC.conv_output(jax.lax.conv_general_dilated(
        lhs, rhs,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        **PREC.conv_kwargs()))
    if "b" in params:
        out = out + params["b"][None, :, None]
    return out


def init_linear(key, in_dim: int, out_dim: int, bias: bool = True,
                w_init_gain: str = "linear") -> Params:
    wkey, bkey = jax.random.split(key)
    p = {"w": xavier_uniform(wkey, (out_dim, in_dim), _GAINS[w_init_gain])}
    if bias:
        k = 1.0 / math.sqrt(in_dim)
        p["b"] = jax.random.uniform(bkey, (out_dim,), minval=-k, maxval=k,
                                    dtype=jnp.float32)
    return p


def linear(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    out = PREC.dot(x, params["w"].T)
    if "b" in params:
        out = out + params["b"]
    return out


def init_batchnorm(num_features: int) -> Params:
    return {
        "scale": jnp.ones((num_features,), jnp.float32),
        "bias": jnp.zeros((num_features,), jnp.float32),
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }


def batchnorm1d(params: Params, x: jnp.ndarray, train: bool = False,
                momentum: float = 0.1, eps: float = 1e-5,
                axis_name: str | None = None):
    """BatchNorm over (B, C, T), stats on (B, T).

    In training mode returns (out, updated_params) where running stats follow
    PyTorch's momentum convention (new = (1-m)*old + m*batch) and the batch
    variance uses the biased estimator for normalisation but the unbiased one
    for the running update — matching ``nn.BatchNorm1d``.

    Under data parallelism pass ``axis_name`` to compute cross-replica batch
    stats with ``lax.pmean`` (sync BN — the deliberate DP-vs-BN decision
    called out in SURVEY.md §7).
    """
    if train:
        mean = jnp.mean(x, axis=(0, 2))
        sq_mean = jnp.mean(x * x, axis=(0, 2))
        if axis_name is not None:
            mean = jax.lax.pmean(mean, axis_name)
            sq_mean = jax.lax.pmean(sq_mean, axis_name)
        var = sq_mean - mean * mean
        n = x.shape[0] * x.shape[2]
        if axis_name is not None:
            n = n * jax.lax.psum(1, axis_name)
        unbiased = var * (n / max(n - 1, 1))
        new_params = dict(params,
                          mean=(1 - momentum) * params["mean"] + momentum * mean,
                          var=(1 - momentum) * params["var"] + momentum * unbiased)
    else:
        mean, var = params["mean"], params["var"]
        new_params = params
    inv = jax.lax.rsqrt(var + eps) * params["scale"]
    out = (x - mean[None, :, None]) * inv[None, :, None] \
        + params["bias"][None, :, None]
    return out, new_params


def init_conv_bn(key, in_channels: int, out_channels: int, kernel_size: int,
                 w_init_gain: str = "linear") -> Params:
    """ConvNorm + BatchNorm1d pair (the reference's standard block,
    e.g. encoder.py:39-48)."""
    return {
        "conv": init_conv1d(key, in_channels, out_channels, kernel_size,
                            w_init_gain=w_init_gain),
        "bn": init_batchnorm(out_channels),
    }


def conv_bn(params: Params, x: jnp.ndarray, kernel_size: int,
            train: bool = False, activation=None, axis_name=None):
    """conv(k, same-pad) -> BN -> optional activation.  Returns
    (out, updated_params)."""
    out = conv1d(params["conv"], x, padding=(kernel_size - 1) // 2)
    out, bn_new = batchnorm1d(params["bn"], out, train=train,
                              axis_name=axis_name)
    if activation is not None:
        out = activation(out)
    return out, dict(params, bn=bn_new)
