"""Pallas TPU kernel for small-batch LSTM stack inference.

Why a kernel: single-utterance AE conversion runs the decoder recurrences
at 1-4 MXU rows, where the XLA scan pays ~3-5 us of loop/dispatch overhead
per sequential round — the 2x1024 decoder stack alone was ~70-90% of the
whole generator's latency (r4 ablation: 2.2-4.1 ms of a ~3 ms forward).
Here the WHOLE stack is ONE kernel invocation:

  * every recurrent weight (w_hh per layer, w_ih + bias for layers >= 1)
    is resident in VMEM (2x1024 stack: ~24 MB bf16 — v5e VMEM holds it);
  * layer 0's input projection is hoisted to one time-parallel MXU matmul
    in XLA (exactly as the scan path does);
  * the L layers run SKEWED inside one in-kernel ``fori_loop``: round s
    advances layer l at timestep t = s - l, so the stack finishes in
    T + L - 1 rounds whose only cost is L chained small matmuls.
    (Layouts keep a unit G axis from a G=2 direction-batched BLSTM
    variant that was built, measured slower than the unrolled XLA scan
    for the KB-scale encoder BLSTM, and deleted.)

Inference-only: the training path keeps the XLA scan with the hand-derived
VJP (ops/rnn.py:_lstm_core) — this kernel has no backward.

Numerics: matmuls in bf16 operands / f32 accumulation when ``fast_math``
and H >= 256, f32 otherwise; the cell elementwise math is always f32.
NOTE this deviates from ops/precision.rec_dot on purpose: rec_dot keeps
rows==1 in f32 (XLA's HBM matvec beats the bf16 unpack there), but inside
this kernel the per-round cost is VMEM weight streaming, which bf16 halves
— so B=1, the kernel's primary regime, stays bf16 (documented in
precision.py's policy comment).  Parity vs ops.rnn.lstm_stack is tested in
tests/test_lstm_pallas.py (interpret mode on CPU incl. a bf16-gate
deviation-bound test, hardware on TPU).

Reference being replaced: the cuDNN LSTM stacks of
auto_encoder/decoder.py:37-77 and encoder.py:51 (via models/autoencoder).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autovc_tpu.ops import precision as PREC


def _kernel(xp_ref,        # (T + L - 1, G, Bp, 4H) f32
            whh_ref,       # (L, G, H, 4H) cdt
            wih_ref,       # (L-1, G, H, 4H) cdt, or (1, G, 8, 128) dummy
            b_ref,         # (max(L-1,1), G, Bp, 4H) f32
            out_ref,       # (T, G, Bp, H) f32
            *, T, L, G, Bp, H, cdt):
    def dot(a, w):
        return jnp.dot(a.astype(cdt), w.astype(cdt),
                       preferred_element_type=jnp.float32)

    def rounds(s, carry):
        hs, cs, ys = carry                    # each: tuple of L x (G,Bp,H)
        t0 = jnp.minimum(s, T - 1)
        xp_t = xp_ref[t0]                     # (G, Bp, 4H) f32
        new_h, new_c, new_y = [], [], []
        for l in range(L):
            # 2D blocks with the unit G dim peeled off: unit leading dims
            # force relayouts in every round and blow up Mosaic's
            # vectorizer/compile time
            inp = (xp_t[0] if l == 0
                   else dot(ys[l - 1][0], wih_ref[l - 1, 0])
                   + b_ref[l - 1, 0])
            gates = (inp + dot(hs[l][0], whh_ref[l, 0]))[None]
            ai, af, ag, ao = jnp.split(gates, 4, axis=-1)
            i, f, o = (jax.nn.sigmoid(ai), jax.nn.sigmoid(af),
                       jax.nn.sigmoid(ao))
            gg = jnp.tanh(ag)
            c_new = f * cs[l] + i * gg
            h_new = o * jnp.tanh(c_new)
            t_l = s - l
            live = jnp.logical_and(t_l >= 0, t_l < T)
            new_h.append(jnp.where(live, h_new, hs[l]))
            new_c.append(jnp.where(live, c_new, cs[l]))
            new_y.append(jnp.where(live, h_new, ys[l]))

        t_out = s - (L - 1)

        @pl.when(jnp.logical_and(t_out >= 0, t_out < T))
        def _():
            out_ref[pl.ds(t_out, 1)] = new_h[L - 1][None]

        return tuple(new_h), tuple(new_c), tuple(new_y)

    zero = tuple(jnp.zeros((G, Bp, H), jnp.float32) for _ in range(L))
    # plain loop: a manual 2x round unroll measured only ~3% (the
    # per-round cost is VMEM weight streaming, not loop bookkeeping —
    # see CLAUDE.md negative results), not worth the masking complexity
    jax.lax.fori_loop(0, T + L - 1, rounds, (zero, zero, zero))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_VMEM_BUDGET = 120 * 1024 * 1024


def _fits_vmem(T: int, L: int, G: int, B: int, H: int, cdt_bytes: int) -> bool:
    """Static VMEM footprint estimate for the fused stack kernel (xp +
    weights + output + slack); callers fall back to the XLA scan when it
    does not fit (e.g. the 2x1024 stack in exact-f32 mode)."""
    Bp = max(8, _round_up(B, 8))
    xp = (T + L - 1) * G * Bp * 4 * H * 4
    w = (L + max(L - 1, 0)) * G * H * 4 * H * cdt_bytes
    out = T * G * Bp * H * 4
    return xp + w + out + (8 << 20) < _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("fast_math", "interpret"))
def _stack_core(xp0, whh, wih, b, fast_math: bool, interpret: bool):
    """xp0: (T, G, B, 4H) layer-0 projections (+ its biases).
    Returns ys: (T, G, B, H) last-layer outputs."""
    T, G, B, H4 = xp0.shape
    L = whh.shape[0]
    H = H4 // 4
    cdt = jnp.bfloat16 if (fast_math and H >= PREC.REC_BF16_MIN_HIDDEN) \
        else jnp.float32
    Bp = max(8, _round_up(B, 8))
    if Bp != B:
        xp0 = jnp.pad(xp0, ((0, 0), (0, 0), (0, Bp - B), (0, 0)))
    if L > 1:
        xp0 = jnp.pad(xp0, ((0, L - 1), (0, 0), (0, 0), (0, 0)))
        wih = wih.astype(cdt)
        bb = jnp.broadcast_to(b[:, :, None, :], (L - 1, G, Bp, H4))
    else:
        wih = jnp.zeros((1, G, 8, 128), cdt)      # never indexed
        bb = jnp.zeros((1, G, Bp, H4), jnp.float32)
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, L=L, G=G, Bp=Bp, H=H, cdt=cdt),
        out_shape=jax.ShapeDtypeStruct((T, G, Bp, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_BUDGET),
        interpret=interpret,
    )(xp0, whh.astype(cdt), wih, bb)
    return out[:, :, :B]


def _hoist_xp0(params0, x):
    return (PREC.dot(x, params0["w_ih"]) + params0["b_ih"]
            + params0["b_hh"])


# ---------------------------------------------------------------------------
# Streamed slab kernel: serving row counts (B > 8), weights VMEM-resident,
# time axis streamed through HBM in double-buffered blocks
# ---------------------------------------------------------------------------

_STREAM_TB_CAP = 16
_STREAM_BUDGET = 48 << 20


def _stream_kernel(xin_hbm,         # (NB, TB, Bp, 4H) f32: layer-0 xp
                   whh_ref,         # (L, H, 4H) cdt
                   wih_ref,         # (max(L-1,1), H, 4H) cdt
                   b_ref,           # (max(L-1,1), 1, 4H) f32
                   yout_hbm,        # (NB, TB, Bp, H) f32: last-layer h
                   xbuf, xsem, ybuf, ysem,
                   *, NB, TB, Bp, H, L, cdt):
    def xdma(slot, b):
        return pltpu.make_async_copy(xin_hbm.at[b], xbuf.at[slot],
                                     xsem.at[slot])

    def ydma(slot, b):
        return pltpu.make_async_copy(ybuf.at[slot], yout_hbm.at[b],
                                     ysem.at[slot])

    def dot(a, w):
        return jnp.dot(a.astype(cdt), w[...],
                       preferred_element_type=jnp.float32)

    xdma(0, 0).start()

    def block(b, carry):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < NB)
        def _():
            xdma(jax.lax.rem(b + 1, 2), b + 1).start()

        xdma(slot, b).wait()

        @pl.when(b >= 2)
        def _():
            ydma(slot, b - 2).wait()

        def step(i, carry):
            hs, cs = carry
            xp = xbuf[slot, i]                     # (Bp, 4H) f32
            new_h, new_c = [], []
            for l in range(L):
                inp = xp if l == 0 else (
                    dot(new_h[l - 1], wih_ref[l - 1]) + b_ref[l - 1, 0])
                gates = inp + dot(hs[l], whh_ref[l])
                ai, af, ag, ao = jnp.split(gates, 4, axis=-1)
                c = (jax.nn.sigmoid(af) * cs[l]
                     + jax.nn.sigmoid(ai) * jnp.tanh(ag))
                new_h.append(jax.nn.sigmoid(ao) * jnp.tanh(c))
                new_c.append(c)
            ybuf[slot, i] = new_h[L - 1]
            return (tuple(new_h), tuple(new_c))

        carry = jax.lax.fori_loop(0, TB, step, carry)
        ydma(slot, b).start()
        return carry

    zero = tuple(jnp.zeros((Bp, H), jnp.float32) for _ in range(L))
    jax.lax.fori_loop(0, NB, block, (zero, zero))
    @pl.when(NB >= 2)
    def _():
        ydma(jax.lax.rem(NB, 2), NB - 2).wait()
    ydma(jax.lax.rem(NB - 1, 2), NB - 1).wait()


def lstm_stack_stream(params: Sequence, x: jnp.ndarray,
                      interpret: bool = False):
    """Uniform-H LSTM stack inference at SERVING row counts, one fused
    streamed kernel.

    Same output contract as :func:`lstm_stack_pallas`, but the per-step
    tensors stream through HBM in double-buffered blocks instead of living
    wholly in VMEM — so it handles slab geometries (64 rows x 400 steps x
    2x1024: ~420 MB of hoisted projections) the resident kernel cannot.
    All L layers advance at the SAME timestep per round (layer l's input
    projection of layer l-1's fresh output runs in-kernel against the
    VMEM-resident ``w_ih``), so a round is L chained matmul pairs with no
    scan-loop weight re-streaming — the XLA skewed scan this replaces
    measured 18.5 us/round vs an 8.2 us compute floor at the slab geometry
    (scripts/exp_slab_stages.py, VERDICT r4 #6).
    """
    L = len(params)
    B, T, _ = x.shape
    H = params[0]["w_hh"].shape[0]
    cdt = (jnp.bfloat16
           if (PREC.mode() == "bf16" and H >= PREC.REC_BF16_MIN_HIDDEN)
           else jnp.float32)
    Bp = max(8, _round_up(B, 8))
    per_step = (4 * H + H) * Bp * 4
    TB = max(8, min(_STREAM_TB_CAP,
                    (_STREAM_BUDGET // (2 * per_step)) // 8 * 8,
                    _round_up(T, 8)))
    Tp = _round_up(T, TB)
    NB = Tp // TB

    xp0 = _hoist_xp0(params[0], x)                       # (B, T, 4H) f32
    xp0 = jnp.swapaxes(xp0, 0, 1)
    xp0 = jnp.pad(xp0, ((0, Tp - T), (0, Bp - B), (0, 0)))
    xin = xp0.reshape(NB, TB, Bp, 4 * H)

    whh = jnp.stack([p["w_hh"] for p in params]).astype(cdt)
    if L > 1:
        wih = jnp.stack([p["w_ih"] for p in params[1:]]).astype(cdt)
        b = jnp.stack([(p["b_ih"] + p["b_hh"])[None, :]
                       for p in params[1:]]).astype(jnp.float32)
    else:
        wih = jnp.zeros((1, 8, 128), cdt)
        b = jnp.zeros((1, 1, 4 * H), jnp.float32)

    kern = functools.partial(_stream_kernel, NB=NB, TB=TB, Bp=Bp, H=H, L=L,
                             cdt=cdt)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    yout = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((NB, TB, Bp, H), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), vmem, vmem, vmem],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, TB, Bp, 4 * H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, TB, Bp, H), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(xin, whh, wih, b)
    ys = yout.reshape(Tp, Bp, H)[:T, :B]
    return jnp.swapaxes(ys, 0, 1)


def lstm_stack_pallas(params: Sequence, x: jnp.ndarray,
                      interpret: bool = False):
    """Uniform-H LSTM stack inference, one fused kernel.

    Same contract as :func:`autovc_tpu.ops.rnn.lstm_stack` (outputs only —
    final states are not returned; the AE inference paths never use them).
    Requirements: all layers share hidden size H and layers >= 1 take H-dim
    inputs (any ``init_lstm_stack`` stack qualifies).
    """
    L = len(params)
    B, T, _ = x.shape
    H = params[0]["w_hh"].shape[0]
    fast = PREC.mode() == "bf16"
    cdt_bytes = 2 if (fast and H >= PREC.REC_BF16_MIN_HIDDEN) else 4
    if not (interpret or _fits_vmem(T, L, 1, B, H, cdt_bytes)):
        from autovc_tpu.ops import rnn as R
        return R.lstm_stack(params, x)[0]
    xp0 = jnp.swapaxes(_hoist_xp0(params[0], x), 0, 1)[:, None]  # (T,1,B,4H)
    whh = jnp.stack([p["w_hh"] for p in params])[:, None]        # (L,1,H,4H)
    if L > 1:
        wih = jnp.stack([p["w_ih"] for p in params[1:]])[:, None]
        b = jnp.stack([p["b_ih"] + p["b_hh"]
                       for p in params[1:]])[:, None]
    else:
        wih = whh[:1, :, :1, :1]                                 # dummy
        b = jnp.zeros((1, 1) + params[0]["b_ih"].shape, x.dtype)
    ys = _stack_core(xp0, whh, wih, b, fast, interpret)          # (T,1,B,H)
    return jnp.swapaxes(ys[:, 0], 0, 1)
