"""Pallas TPU kernel for the LSTM recurrence (inference path).

The ``lax.scan`` LSTM (ops/rnn.py) re-reads the recurrent gate matrix
``w_hh`` — 16 MB f32 for the decoder's H=1024 layer (reference
autovc/auto_encoder/decoder.py:53) — from HBM on every one of the T
sequential steps, so each step costs ~100 us of pure HBM traffic.  This
kernel is the SURVEY.md §2b "fused LSTM-scan" design:

  * the input projection ``x @ w_ih + b`` for ALL timesteps stays OUTSIDE
    the kernel as one large time-parallel MXU matmul (same hoisting as the
    scan path);
  * ``w_hh`` is cast to bf16 and **resident in VMEM** for the whole
    sequence — per-step HBM traffic drops to the (B, 4H) projected-input
    block, streamed with a double-buffered async DMA;
  * the (h, c) carry lives in VMEM scratch; per-step output rows are
    DMA'd back to HBM from a double-buffered staging buffer so the kernel
    never holds the (T, B, H) output in VMEM.

Numerics: gates accumulate in f32 (bf16 operands on the MXU,
``preferred_element_type=f32``), matching the fast-math policy of the
WaveRNN sampling kernel; parity vs the f32 scan is ~1e-2 absolute on
unit-scale activations (tested in tests/test_lstm_pallas.py), and the
convert path's end metrics are unchanged.  Training keeps the
differentiable ``lax.scan`` path.
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Params = Dict[str, Any]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(xp_hbm,            # (T, Bp, 4H) bf16, HBM
            w_hh_ref,          # (H, 4H) bf16, VMEM
            out_hbm,           # (T, Bp, H) f32, HBM
            in_buf, in_sem,    # scratch: (2, Bp, 4H) bf16 + DMA sems
            out_buf, out_sem,  # scratch: (2, Bp, H) f32 + DMA sems
            h_ref, c_ref,      # scratch: (Bp, H) f32
            *, T, H):

    def load(slot, t):
        return pltpu.make_async_copy(xp_hbm.at[t], in_buf.at[slot],
                                     in_sem.at[slot])

    def store(slot, t):
        return pltpu.make_async_copy(out_buf.at[slot], out_hbm.at[t],
                                     out_sem.at[slot])

    load(0, 0).start()
    h_ref[...] = jnp.zeros_like(h_ref)
    c_ref[...] = jnp.zeros_like(c_ref)

    def body(t, _):
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < T)
        def _():
            load(nxt, t + 1).start()

        load(slot, t).wait()
        gates = in_buf[slot].astype(jnp.float32) + jnp.dot(
            h_ref[...].astype(jnp.bfloat16), w_hh_ref[...],
            preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c = f * c_ref[...] + i * g
        h = o * jnp.tanh(c)
        c_ref[...] = c
        h_ref[...] = h

        # Reuse of this staging slot two steps later requires its DMA done.
        @pl.when(t >= 2)
        def _():
            store(slot, t - 2).wait()

        out_buf[slot] = h
        store(slot, t).start()
        return 0

    jax.lax.fori_loop(0, T, body, 0)
    for t in range(max(0, T - 2), T):      # drain the last 1-2 stores
        store(t % 2, t).wait()


@functools.partial(jax.jit, static_argnames=("reverse", "interpret"))
def lstm_layer_pallas(params: Params, x: jnp.ndarray,
                      reverse: bool = False, interpret: bool = False):
    """Drop-in inference replacement for ``ops.rnn.lstm_layer`` (zero initial
    state): (B, T, I) -> outputs (B, T, H), final (h, c)."""
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    if H % 128 != 0:
        # narrow layers (e.g. the encoder's dim_neck=32 BLSTM) misalign the
        # (.., H) VMEM staging tiles AND gain nothing from weight residency
        # (their w_hh is KBs) — keep the scan.
        from autovc_tpu.ops import rnn as R
        return R.lstm_layer(params, x, reverse=reverse)
    Bp = max(16, _round_up(B, 16))            # bf16 sublane tile

    # Hoisted time-parallel input projection (both biases folded in).
    xp = (jnp.einsum("bti,ig->btg", x, params["w_ih"])
          + params["b_ih"] + params["b_hh"])
    if reverse:
        xp = xp[:, ::-1]
    xp = jnp.swapaxes(xp, 0, 1)                           # (T, B, 4H)
    xp = jnp.pad(xp, ((0, 0), (0, Bp - B), (0, 0))).astype(jnp.bfloat16)
    w_hh = params["w_hh"].astype(jnp.bfloat16)

    kern = functools.partial(_kernel, T=T, H=H)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, Bp, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, Bp, 4 * H), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, Bp, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Bp, H), jnp.float32),
            pltpu.VMEM((Bp, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(xp, w_hh)

    ys = jnp.swapaxes(out, 0, 1)[:B]                      # (B, T, H)
    h = ys[:, -1]
    if reverse:
        ys = ys[:, ::-1]
        h = ys[:, 0]
    # final cell state is not exposed (no caller of the inference path needs
    # it); return h twice to keep the scan-path signature.
    return ys, (h, h)


def lstm_stack_pallas(params, x: jnp.ndarray, interpret: bool = False):
    """Inference multi-layer LSTM via the Pallas layer kernel (matches
    ``ops.rnn.lstm_stack`` outputs)."""
    for layer in params:
        x, (h, _) = lstm_layer_pallas(layer, x, interpret=interpret)
    return x, (h, h), None


def bilstm_stack_pallas(params, x: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Inference bidirectional stack via the Pallas layer kernel (matches
    ``ops.rnn.bilstm_stack``)."""
    for layer in params:
        fwd, _ = lstm_layer_pallas(layer["fwd"], x, interpret=interpret)
        bwd, _ = lstm_layer_pallas(layer["bwd"], x, reverse=True,
                                   interpret=interpret)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    return x
