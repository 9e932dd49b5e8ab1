"""Recurrent cores as fused-gate ``lax.scan`` kernels.

TPU-first design for the LSTM/BLSTM/GRU stacks the reference gets from cuDNN
(``nn.LSTM`` in auto_encoder/encoder.py:51, decoder.py:37,53,
speaker_encoder/model.py:49; ``nn.GRU`` in wavernn/model.py:161-162):

* the input projection ``x @ W_ih`` for *all* timesteps is hoisted out of the
  recurrence into one large (B·T, I) x (I, 4H) matmul that saturates the MXU;
* the scan carries only (h, c) and performs a single (B, H) x (H, 4H) matmul
  per step — the minimal sequential work an LSTM admits;
* gate nonlinearities fuse into the scan body (VPU epilogue).

Weight layout matches PyTorch semantics (gate order i,f,g,o for LSTM and
r,z,n for GRU, separate b_ih/b_hh) so converted reference checkpoints load
without re-derivation; matrices are stored pre-transposed as (in, 4H)/(H, 4H)
for right-multiplication.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp

from autovc_tpu.ops import precision as PREC

Params = Dict[str, Any]

# Recurrences are parity-tested against PyTorch at rtol 1e-4; the default
# policy keeps full fp32 matmuls (the tensors are small — the batch dimension
# provides MXU work).  Training loops opt into bf16 via PREC.compute("bf16").
DOT_PRECISION = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return PREC.dot(a, b)


def _scan_unroll() -> int:
    """Unroll factor for the recurrence scans (resolved at trace time).

    On TPU, unrolling the scan body 8x cuts the *backward* pass ~2.7x (the
    transposed scan stops re-dispatching one tiny matmul per step); on CPU
    it only bloats compile time, so tests keep unroll=1."""
    return 8 if jax.default_backend() == "tpu" else 1


def _uniform(key, shape, scale):
    return jax.random.uniform(key, shape, minval=-scale, maxval=scale,
                              dtype=jnp.float32)


# ---------------------------------------------------------------------------
# LSTM
# ---------------------------------------------------------------------------


def init_lstm_layer(key, input_size: int, hidden_size: int) -> Params:
    """One LSTM layer, PyTorch default init: U(-1/sqrt(H), 1/sqrt(H))."""
    k = 1.0 / jnp.sqrt(hidden_size)
    keys = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(keys[0], (input_size, 4 * hidden_size), k),
        "w_hh": _uniform(keys[1], (hidden_size, 4 * hidden_size), k),
        "b_ih": _uniform(keys[2], (4 * hidden_size,), k),
        "b_hh": _uniform(keys[3], (4 * hidden_size,), k),
    }


def lstm_layer(params: Params, x: jnp.ndarray, reverse: bool = False,
               h0: jnp.ndarray | None = None, c0: jnp.ndarray | None = None):
    """Run one LSTM layer over (B, T, I) -> outputs (B, T, H), final (h, c).

    The input projection runs as one big time-parallel matmul; only the
    (B, H) x (H, 4H) recurrent matmul lives in the scan.
    """
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    # (B, T, 4H): hoisted input projection + both biases.
    xp = _dot(x, params["w_ih"]) + params["b_ih"] + params["b_hh"]
    h = jnp.zeros((B, H), x.dtype) if h0 is None else h0
    c = jnp.zeros((B, H), x.dtype) if c0 is None else c0

    w_hh = params["w_hh"]

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + PREC.rec_dot(h, w_hh)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (h, c), ys = jax.lax.scan(step, (h, c), jnp.swapaxes(xp, 0, 1),
                              reverse=reverse, unroll=_scan_unroll())
    return jnp.swapaxes(ys, 0, 1), (h, c)


def init_lstm_stack(key, input_size: int, hidden_size: int,
                    num_layers: int) -> List[Params]:
    keys = jax.random.split(key, num_layers)
    return [init_lstm_layer(keys[i],
                            input_size if i == 0 else hidden_size,
                            hidden_size)
            for i in range(num_layers)]


def lstm_stack(params: Sequence[Params], x: jnp.ndarray):
    """Unidirectional multi-layer LSTM.  Returns (outputs, last-layer (h, c),
    and the per-layer final hidden states stacked as (L, B, H))."""
    finals = []
    for layer in params:
        x, (h, c) = lstm_layer(layer, x)
        finals.append(h)
    return x, (h, c), jnp.stack(finals)


def init_bilstm_stack(key, input_size: int, hidden_size: int,
                      num_layers: int) -> List[Params]:
    """Bidirectional stack: each layer holds 'fwd' and 'bwd' sublayers; layer
    l > 0 consumes the concatenated (2H) outputs of layer l-1 (PyTorch
    ``bidirectional=True`` semantics)."""
    keys = jax.random.split(key, num_layers * 2)
    layers = []
    for i in range(num_layers):
        in_size = input_size if i == 0 else 2 * hidden_size
        layers.append({
            "fwd": init_lstm_layer(keys[2 * i], in_size, hidden_size),
            "bwd": init_lstm_layer(keys[2 * i + 1], in_size, hidden_size),
        })
    return layers


def _bilstm_layer_dirbatch(lp: Params, x: jnp.ndarray) -> jnp.ndarray:
    """One bidirectional layer with both directions batched into ONE scan.

    The forward and backward passes are independent recurrences of identical
    shape; running them as two scans costs 2T sequential rounds of a
    row-starved (B, H) x (H, 4H) matmul.  Reversing the input for the
    backward direction and stacking it as extra batch rows runs both in T
    rounds of one (2, B, H) x (2, H, 4H) batched matmul — same math, half
    the sequential rounds, double the MXU row occupancy (measured ~1.8x on
    the AutoVC encoder BLSTM, TPU v5e, any batch size).
    """
    B, T, _ = x.shape
    H = lp["fwd"]["w_hh"].shape[0]
    xr = jnp.flip(x, axis=1)
    xp_f = _dot(x, lp["fwd"]["w_ih"]) + lp["fwd"]["b_ih"] + lp["fwd"]["b_hh"]
    xp_b = _dot(xr, lp["bwd"]["w_ih"]) + lp["bwd"]["b_ih"] + lp["bwd"]["b_hh"]
    xp = jnp.concatenate([xp_f, xp_b], axis=0)          # (2B, T, 4H)
    w_hh = jnp.stack([lp["fwd"]["w_hh"], lp["bwd"]["w_hh"]])   # (2, H, 4H)
    h = jnp.zeros((2 * B, H), x.dtype)
    c = jnp.zeros((2 * B, H), x.dtype)

    def step(carry, xp_t):
        h, c = carry
        hp = PREC.rec_bdot(h.reshape(2, B, H), w_hh).reshape(2 * B, 4 * H)
        gates = xp_t + hp
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    _, ys = jax.lax.scan(step, (h, c), jnp.swapaxes(xp, 0, 1),
                         unroll=_scan_unroll())
    ys = jnp.swapaxes(ys, 0, 1)                         # (2B, T, H)
    return jnp.concatenate([ys[:B], jnp.flip(ys[B:], axis=1)], axis=-1)


def bilstm_stack(params: Sequence[Params], x: jnp.ndarray) -> jnp.ndarray:
    """Bidirectional multi-layer LSTM over (B, T, I) -> (B, T, 2H).

    Each layer runs both directions in a single direction-batched scan
    (:func:`_bilstm_layer_dirbatch`); outputs concatenate [forward, backward]
    on the feature axis, exactly the layout the AutoVC encoder slices into
    fwd/bwd codes (auto_encoder/encoder.py:74-77).
    """
    for layer in params:
        x = _bilstm_layer_dirbatch(layer, x)
    return x


def lstm_stack_skewed(params: Sequence[Params], x: jnp.ndarray):
    """Multi-layer LSTM with all layers fused into ONE pipelined scan.

    Layer l at global step s processes its timestep t = s - l (a pipeline
    skew), so the whole L-layer stack runs in T + L - 1 sequential rounds
    instead of L separate T-round scans.  Each round performs ONE batched
    matmul carrying every layer's recurrent step plus the in-scan input
    projections of layers >= 1 — (2L-1, B, H) x (2L-1, H, 4H) — so the
    per-round launch/latency overhead is paid once for the stack.

    Requirements: all layers share hidden size H and layers >= 1 take H-dim
    inputs (true for any `init_lstm_stack` stack).  The fused weight block
    (~(2L-1) * H * 4H) must fit VMEM — right for the speaker encoder
    (3 x 256: 5 MB f32), wrong for the AutoVC decoder LSTM2 (2 x 1024:
    24 MB bf16 — use :func:`lstm_stack`, whose per-layer scans keep one
    8 MB weight resident at a time).

    Same return contract as :func:`lstm_stack`: (outputs, last-layer (h, c),
    per-layer final hidden states (L, B, H)).  Numerics are identical (the
    batched matmul computes each layer's gate matmul as its own batch
    entry); masking freezes a layer's state outside its valid time range.
    """
    L = len(params)
    if L == 1:
        return lstm_stack(params, x)
    B, T, _ = x.shape
    H = params[0]["w_hh"].shape[0]
    for p in params[1:]:
        assert p["w_ih"].shape == (H, 4 * H) and p["w_hh"].shape[0] == H, \
            "lstm_stack_skewed needs uniform hidden size"

    # Hoisted input projection for layer 0 over all T steps, padded with
    # L-1 trailing drain rounds.
    xp0 = _dot(x, params[0]["w_ih"]) + params[0]["b_ih"] + params[0]["b_hh"]
    xp0 = jnp.pad(jnp.swapaxes(xp0, 0, 1), ((0, L - 1), (0, 0), (0, 0)))

    w_big = jnp.concatenate([
        jnp.stack([p["w_hh"] for p in params]),          # (L, H, 4H)
        jnp.stack([p["w_ih"] for p in params[1:]]),      # (L-1, H, 4H)
    ])                                                   # (2L-1, H, 4H)
    b_rest = jnp.stack([p["b_ih"] + p["b_hh"] for p in params[1:]])

    h0 = jnp.zeros((L, B, H), x.dtype)
    c0 = jnp.zeros((L, B, H), x.dtype)
    steps = jnp.arange(T + L - 1)

    def step(carry, inp):
        h, c, y_prev = carry
        xp0_t, s = inp
        big = PREC.rec_bdot(jnp.concatenate([h, y_prev[:-1]]), w_big)
        hp, xp_in = big[:L], big[L:]
        gates = jnp.concatenate([
            (xp0_t + hp[0])[None],
            xp_in + b_rest[:, None, :] + hp[1:],
        ])                                               # (L, B, 4H)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        # layer l is live at global step s iff 0 <= s - l < T
        t_l = s - jnp.arange(L)
        live = ((t_l >= 0) & (t_l < T))[:, None, None]
        h = jnp.where(live, h_new, h)
        c = jnp.where(live, c_new, c)
        y_prev = jnp.where(live, h_new, y_prev)
        return (h, c, y_prev), h[L - 1]

    (h, c, _), ys = jax.lax.scan(step, (h0, c0, h0), (xp0, steps),
                                 unroll=_scan_unroll())
    outs = jnp.swapaxes(ys[L - 1:], 0, 1)                # (B, T, H)
    return outs, (h[L - 1], c[L - 1]), h


# ---------------------------------------------------------------------------
# GRU
# ---------------------------------------------------------------------------


def init_gru_layer(key, input_size: int, hidden_size: int) -> Params:
    k = 1.0 / jnp.sqrt(hidden_size)
    keys = jax.random.split(key, 4)
    return {
        "w_ih": _uniform(keys[0], (input_size, 3 * hidden_size), k),
        "w_hh": _uniform(keys[1], (hidden_size, 3 * hidden_size), k),
        "b_ih": _uniform(keys[2], (3 * hidden_size,), k),
        "b_hh": _uniform(keys[3], (3 * hidden_size,), k),
    }


def gru_cell(params: Params, xp_t: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """One GRU step given the *precomputed* input projection
    ``xp_t = x_t @ w_ih + b_ih`` (shape (B, 3H)).

    PyTorch gate semantics: r, z from the summed projections; the candidate
    n uses ``r * (h @ w_hn + b_hn)`` — b_hh must stay inside the reset gate,
    which is why it cannot be folded into ``xp_t``.
    """
    hp = PREC.rec_dot(h, params["w_hh"]) + params["b_hh"]
    H = h.shape[-1]
    xr, xz, xn = xp_t[..., :H], xp_t[..., H:2 * H], xp_t[..., 2 * H:]
    hr, hz, hn = hp[..., :H], hp[..., H:2 * H], hp[..., 2 * H:]
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1.0 - z) * n + z * h


def gru_project_inputs(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Hoisted time-parallel input projection for :func:`gru_cell`."""
    return _dot(x, params["w_ih"]) + params["b_ih"]


def gru_layer(params: Params, x: jnp.ndarray,
              h0: jnp.ndarray | None = None):
    """One GRU layer over (B, T, I) -> outputs (B, T, H), final h."""
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    xp = gru_project_inputs(params, x)
    h = jnp.zeros((B, H), x.dtype) if h0 is None else h0

    def step(h, xp_t):
        h = gru_cell(params, xp_t, h)
        return h, h

    h, ys = jax.lax.scan(step, h, jnp.swapaxes(xp, 0, 1),
                         unroll=_scan_unroll())
    return jnp.swapaxes(ys, 0, 1), h
