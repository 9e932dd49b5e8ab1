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


# ---------------------------------------------------------------------------
# LSTM recurrence core with a hand-derived VJP.
#
# XLA's autodiff of a scan accumulates the recurrent weight gradient INSIDE
# the backward scan: every step pays a (4H, B) x (B, H) outer-product matmul
# at tiny row counts, which made the AE train step's backward ~6x the cost
# of its forward (measured 32 ms backward vs 5 ms forward on v5e).  The
# custom VJP instead
#   * saves the post-activation gates and cell states during the forward,
#   * runs a backward scan whose ONLY matmul is the unavoidable sequential
#     dependency dh_{t-1} += dgates_t @ W_hh^T, and
#   * computes dW_hh as ONE big time-parallel (T*G*B, H)^T x (T*G*B, 4H)
#     matmul after the scan (dW_ih falls out of the hoisted input
#     projection's own VJP, which was already time-parallel).
# Layouts are time-major (T, G, B, ...) with G batched recurrences (G=1 for
# a plain layer, G=2 for a direction-batched BLSTM layer).
# ---------------------------------------------------------------------------


def _core_rec_dot_T(da, w_hh):
    """(G, B, 4H) x (G, 4H, H)^T — the backward's sequential matmul."""
    if PREC._rec_use_bf16(da.shape[1], w_hh.shape[1]):
        return jnp.einsum("gbk,ghk->gbh", da.astype(jnp.bfloat16),
                          w_hh.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum("gbk,ghk->gbh", da, w_hh,
                      precision=jax.lax.Precision.HIGHEST)


def _lstm_core_scan(xp, w_hh, h0, c0, save: bool):
    def step(carry, xp_t):
        h, c = carry
        a = xp_t + PREC.rec_bdot(h, w_hh)
        ai, af, ag, ao = jnp.split(a, 4, axis=-1)
        i, f, o = (jax.nn.sigmoid(ai), jax.nn.sigmoid(af),
                   jax.nn.sigmoid(ao))
        g = jnp.tanh(ag)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        out = (h, jnp.concatenate([i, f, g, o], axis=-1), c) if save else h
        return (h, c), out

    (h, c), outs = jax.lax.scan(step, (h0, c0), xp,
                                unroll=_scan_unroll())
    return (h, c), outs


@jax.custom_vjp
def _lstm_core(xp, w_hh, h0, c0):
    """Batched LSTM recurrence given hoisted gate pre-activations.

    Args:
      xp: (T, G, B, 4H) input projections + biases; w_hh: (G, H, 4H);
      h0/c0: (G, B, H).
    Returns: (ys (T, G, B, H), h_fin, c_fin).
    """
    (h, c), ys = _lstm_core_scan(xp, w_hh, h0, c0, save=False)
    return ys, h, c


def _lstm_core_fwd(xp, w_hh, h0, c0):
    (h, c), (ys, gates, cs) = _lstm_core_scan(xp, w_hh, h0, c0, save=True)
    return (ys, h, c), (gates, cs, ys, w_hh, h0, c0)


def _lstm_core_bwd(res, cts):
    gates, cs, ys, w_hh, h0, c0 = res
    dys, dh_fin, dc_fin = cts
    c_prev = jnp.concatenate([c0[None], cs[:-1]], axis=0)
    h_prev = jnp.concatenate([h0[None], ys[:-1]], axis=0)

    def bstep(carry, inp):
        dh_rec, dc = carry
        dy_t, gates_t, c_t, c_prev_t = inp
        i, f, g, o = jnp.split(gates_t, 4, axis=-1)
        dh = dy_t + dh_rec
        tc = jnp.tanh(c_t)
        da_o = dh * tc * o * (1.0 - o)
        dc = dc + dh * o * (1.0 - tc * tc)
        da_i = dc * g * i * (1.0 - i)
        da_g = dc * i * (1.0 - g * g)
        da_f = dc * c_prev_t * f * (1.0 - f)
        da = jnp.concatenate([da_i, da_f, da_g, da_o], axis=-1)
        return (_core_rec_dot_T(da, w_hh), dc * f), da

    (dh0, dc0), das = jax.lax.scan(
        bstep, (dh_fin, dc_fin), (dys, gates, cs, c_prev),
        reverse=True, unroll=_scan_unroll())
    # weight gradient: one large time-parallel contraction, policy-routed
    if PREC.mode() == "bf16":
        dw = jnp.einsum("tgbh,tgbk->ghk", h_prev.astype(jnp.bfloat16),
                        das.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    else:
        dw = jnp.einsum("tgbh,tgbk->ghk", h_prev, das,
                        precision=jax.lax.Precision.HIGHEST)
    return das, dw, dh0, dc0


_lstm_core.defvjp(_lstm_core_fwd, _lstm_core_bwd)


def lstm_layer(params: Params, x: jnp.ndarray, reverse: bool = False,
               h0: jnp.ndarray | None = None, c0: jnp.ndarray | None = None):
    """Run one LSTM layer over (B, T, I) -> outputs (B, T, H), final (h, c).

    The input projection runs as one big time-parallel matmul; only the
    (B, H) x (H, 4H) recurrent matmul lives in the scan (custom-VJP core, so
    the backward pays the same per-step cost as the forward).
    """
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    # (B, T, 4H): hoisted input projection + both biases.
    xp = _dot(x, params["w_ih"]) + params["b_ih"] + params["b_hh"]
    h = jnp.zeros((B, H), x.dtype) if h0 is None else h0
    c = jnp.zeros((B, H), x.dtype) if c0 is None else c0

    xpT = jnp.swapaxes(xp, 0, 1)[:, None]               # (T, 1, B, 4H)
    if reverse:
        xpT = jnp.flip(xpT, axis=0)
    ys, h, c = _lstm_core(xpT, params["w_hh"][None], h[None], c[None])
    ys = ys[:, 0]
    if reverse:
        ys = jnp.flip(ys, axis=0)
    return jnp.swapaxes(ys, 0, 1), (h[0], c[0])


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
    xp = jnp.stack([jnp.swapaxes(xp_f, 0, 1),
                    jnp.swapaxes(xp_b, 0, 1)], axis=1)  # (T, 2, B, 4H)
    w_hh = jnp.stack([lp["fwd"]["w_hh"], lp["bwd"]["w_hh"]])   # (2, H, 4H)
    h0 = jnp.zeros((2, B, H), x.dtype)
    ys, _, _ = _lstm_core(xp, w_hh, h0, h0)             # (T, 2, B, H)
    out_f = jnp.swapaxes(ys[:, 0], 0, 1)                # (B, T, H)
    out_b = jnp.flip(jnp.swapaxes(ys[:, 1], 0, 1), axis=1)
    return jnp.concatenate([out_f, out_b], axis=-1)


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


def _gru_rec_dot_T(dhp, w_hh):
    if PREC._rec_use_bf16(dhp.shape[0], w_hh.shape[0]):
        return jnp.matmul(dhp.astype(jnp.bfloat16),
                          w_hh.T.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(dhp, w_hh.T, precision=jax.lax.Precision.HIGHEST)


def _gru_core_scan(xp, w_hh, b_hh, h0, save: bool):
    H = h0.shape[-1]

    def step(h, xp_t):
        hp = PREC.rec_dot(h, w_hh) + b_hh
        xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        h_new = (1.0 - z) * n + z * h
        out = (h_new, jnp.concatenate([r, z, n, hn], axis=-1)) if save \
            else h_new
        return h_new, out

    return jax.lax.scan(step, h0, xp, unroll=_scan_unroll())


@jax.custom_vjp
def _gru_core(xp, w_hh, b_hh, h0):
    """GRU recurrence given hoisted input projections (same custom-VJP
    rationale as :func:`_lstm_core`: the backward's only matmul is the
    sequential dhp @ W_hh^T; dW_hh is one big time-parallel contraction).

    xp: (T, B, 3H); w_hh: (H, 3H); b_hh: (3H,); h0: (B, H).
    Returns (ys (T, B, H), h_fin)."""
    h, ys = _gru_core_scan(xp, w_hh, b_hh, h0, save=False)
    return ys, h


def _gru_core_fwd(xp, w_hh, b_hh, h0):
    h, (ys, acts) = _gru_core_scan(xp, w_hh, b_hh, h0, save=True)
    return (ys, h), (acts, ys, w_hh, h0)


def _gru_core_bwd(res, cts):
    acts, ys, w_hh, h0 = res
    dys, dh_fin = cts
    h_prev = jnp.concatenate([h0[None], ys[:-1]], axis=0)

    def bstep(dh_rec, inp):
        dy_t, acts_t, h_prev_t = inp
        H = h_prev_t.shape[-1]
        r, z, n, hn = (acts_t[..., :H], acts_t[..., H:2 * H],
                       acts_t[..., 2 * H:3 * H], acts_t[..., 3 * H:])
        dh = dy_t + dh_rec
        dn = dh * (1.0 - z)
        da_n = dn * (1.0 - n * n)
        dz = dh * (h_prev_t - n)
        da_z = dz * z * (1.0 - z)
        dr = da_n * hn
        da_r = dr * r * (1.0 - r)
        dhp = jnp.concatenate([da_r, da_z, da_n * r], axis=-1)
        dxp = jnp.concatenate([da_r, da_z, da_n], axis=-1)
        dh_prev = dh * z + _gru_rec_dot_T(dhp, w_hh)
        return dh_prev, (dxp, dhp)

    dh0, (dxps, dhps) = jax.lax.scan(
        bstep, dh_fin, (dys, acts, h_prev),
        reverse=True, unroll=_scan_unroll())
    T, B, H = h_prev.shape
    if PREC.mode() == "bf16":
        dw = jnp.matmul(h_prev.reshape(T * B, H).T.astype(jnp.bfloat16),
                        dhps.reshape(T * B, -1).astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    else:
        dw = jnp.matmul(h_prev.reshape(T * B, H).T,
                        dhps.reshape(T * B, -1),
                        precision=jax.lax.Precision.HIGHEST)
    db = jnp.sum(dhps, axis=(0, 1))
    return dxps, dw, db, dh0


_gru_core.defvjp(_gru_core_fwd, _gru_core_bwd)


def gru_layer(params: Params, x: jnp.ndarray,
              h0: jnp.ndarray | None = None):
    """One GRU layer over (B, T, I) -> outputs (B, T, H), final h."""
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    xp = gru_project_inputs(params, x)
    h = jnp.zeros((B, H), x.dtype) if h0 is None else h0
    ys, h = _gru_core(jnp.swapaxes(xp, 0, 1), params["w_hh"],
                      params["b_hh"], h)
    return jnp.swapaxes(ys, 0, 1), h
