"""Pallas TPU kernel for the WaveRNN autoregressive sampling loop.

Why a kernel: the XLA ``lax.scan`` version re-reads every recurrent weight
matrix from HBM on each of the ~3-12k sequential steps and pays per-step
fusion/dispatch overhead.  Here the whole loop is ONE kernel invocation:

  * all weights (two GRUs + three fc layers + the per-step input
    projections, ~8 MB bf16) are **resident in VMEM** for the entire
    generation — zero per-step weight traffic;
  * the per-step conditioning (raw mel + aux splits + sampling noise,
    packed into one lane-aligned (T, B, D) array) streams from HBM with a
    **double-buffered async DMA** that overlaps the next step's load with
    the current step's compute.  Streaming the RAW conditioning and doing
    the small input projections in-kernel (one 128-row matmul per segment,
    weights in VMEM) keeps the streamed block at 5x128 = 640 lanes instead
    of the 3200 lanes a pre-projected layout needs — 5x less HBM stream
    traffic and a prologue that only transposes/concats instead of writing
    multi-GB projection blocks (measured ~35% of sampling wall time at
    3200 lanes);
  * the MOL/RAW sampling (Gumbel-max pick + logistic inverse-CDF) runs on
    the VPU with lane-mask arithmetic; samples accumulate in VMEM and are
    written out once.

The packed layout (5 segments of 128 lanes, compute dtype):
  [ mel|a1|0 ] [ a2|0 ] [ a3|0 ] [ a4|0 ] [ gumbel|logistic|0 ]

Numerics match :func:`autovc_tpu.models.wavernn._generate_scan` given the
same pregenerated noise (verified in tests/test_wavernn_pallas.py).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autovc_tpu.config import WaveRNNConfig

Params = Dict[str, Any]

LOG_SCALE_MIN = float(np.log(1e-14))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(step_in_hbm,        # (T, Bp, D) compute-dtype, HBM
            w_x_ref,            # (1, rd)
            w_c0_ref,           # (s0, rd)   [mel|a1] -> I
            w_c1_ref,           # (sa, 3rd)  a2 -> GRU2 input proj
            w_c2_ref, w_c3_ref,  # (sa, fc)  a3 -> fc1, a4 -> fc2
            w_ih1_ref, w_hh1_ref,   # (rd, 3rd)
            w_ih2x_ref, w_hh2_ref,  # (rd, 3rd)
            w_fc1_ref, w_fc2_ref,   # (rd, fc)
            w_fc3_ref,              # (fc, 128)
            bI_ref,                     # (1, rd) f32
            b1_ref, bh1_ref,            # (1, 3rd) f32
            bih2_ref, bh2_ref,          # (1, 3rd) f32
            bf1_ref, bf2_ref,           # (1, fc) f32
            b3_ref,                     # (1, 128) f32
            out_ref,            # (T, Bp) f32 VMEM
            buf, sem,           # scratch: (2, Bp, D), DMA sems (2,)
            *, T, Bp, rd, fc, s0, sa, n_classes, nr_mix, raw_mode, cdt):
    def dma(slot, t):
        return pltpu.make_async_copy(step_in_hbm.at[t], buf.at[slot],
                                     sem.at[slot])

    dma(0, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (Bp, 128), 1)

    def body(t, carry):
        x, h1, h2 = carry          # (Bp,1) f32, (Bp,rd) f32 x2
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)

        @pl.when(t + 1 < T)
        def _():
            dma(nxt, t + 1).start()

        dma(slot, t).wait()
        blk = buf[slot]            # (Bp, D) cdt

        def dot(a, b_ref_val):
            return jnp.dot(a.astype(cdt), b_ref_val,
                           preferred_element_type=jnp.float32)

        # in-kernel input projections from the raw conditioning segments
        o1, o2, o3 = s0, s0 + sa, s0 + 2 * sa
        pre_I = dot(blk[:, :s0], w_c0_ref[...]) + bI_ref[0][None, :]
        pre_r2 = (dot(blk[:, o1:o1 + sa], w_c1_ref[...])
                  + bih2_ref[0][None, :])
        pre_f1 = (dot(blk[:, o2:o2 + sa], w_c2_ref[...])
                  + bf1_ref[0][None, :])
        pre_f2 = (dot(blk[:, o3:o3 + sa], w_c3_ref[...])
                  + bf2_ref[0][None, :])
        noise = blk[:, o3 + sa:o3 + sa + 128].astype(jnp.float32)

        def gru(h, xp, w_hh, b_hh):
            hp = dot(h, w_hh) + b_hh
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            return (1.0 - z) * n + z * h

        xI = x * w_x_ref[0][None, :] + pre_I
        h1 = gru(h1, dot(xI, w_ih1_ref[...]) + b1_ref[0][None, :],
                 w_hh1_ref[...], bh1_ref[0][None, :])
        x1 = xI + h1
        h2 = gru(h2, dot(x1, w_ih2x_ref[...]) + pre_r2,
                 w_hh2_ref[...], bh2_ref[0][None, :])
        x2 = x1 + h2
        x3 = jnp.maximum(dot(x2, w_fc1_ref[...]) + pre_f1, 0.0)
        x4 = jnp.maximum(dot(x3, w_fc2_ref[...]) + pre_f2, 0.0)
        logits = dot(x4, w_fc3_ref[...]) + b3_ref[0][None, :]  # (Bp, 128)

        pick_dim = n_classes if raw_mode else nr_mix
        gumbel = noise  # first pick_dim lanes are the Gumbel noise
        neg_inf = jnp.float32(-1e30)
        scored = jnp.where(lane < pick_dim, logits + gumbel, neg_inf)
        pick = jnp.argmax(scored, axis=-1).astype(jnp.int32)   # (Bp,)

        if raw_mode:
            sample = (2.0 * pick.astype(jnp.float32)
                      / (n_classes - 1.0) - 1.0)
        else:
            pick_b = pick[:, None]
            means = jnp.sum(
                jnp.where(lane == pick_b + nr_mix, logits, 0.0), axis=-1)
            log_scales = jnp.maximum(
                jnp.sum(jnp.where(lane == pick_b + 2 * nr_mix, logits, 0.0),
                        axis=-1), LOG_SCALE_MIN)
            # logistic noise rides in lane pick_dim of the noise block
            logistic = jnp.sum(
                jnp.where(lane == pick_dim, noise, 0.0), axis=-1)
            sample = jnp.clip(means + jnp.exp(log_scales) * logistic,
                              -1.0, 1.0)

        out_ref[pl.ds(t, 1), :] = sample[None, :]
        return (sample[:, None], h1, h2)

    init = (jnp.zeros((Bp, 1), jnp.float32),
            jnp.zeros((Bp, rd), jnp.float32),
            jnp.zeros((Bp, rd), jnp.float32))
    jax.lax.fori_loop(0, T, body, init)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "fast_math", "interpret"))
def generate_scan_pallas(params: Params, mels: jnp.ndarray,
                         aux: jnp.ndarray, key, cfg: WaveRNNConfig,
                         fast_math: bool = True,
                         interpret: bool = False) -> jnp.ndarray:
    """Drop-in replacement for ``wavernn._generate_scan``: (B, T) samples.

    Host-side (traced) prologue packs the RAW conditioning + noise into the
    lane-aligned (T, Bp, D) streaming block; the input projections and the
    sequential loop both run in the kernel (weights VMEM-resident).
    """
    B, T, feat = mels.shape
    rd, fc, d = cfg.rnn_dims, cfg.fc_dims, cfg.aux_dims
    n_classes = cfg.n_classes
    raw_mode = cfg.mode == "RAW"
    nr_mix = n_classes // 3
    cdt = jnp.bfloat16 if fast_math else jnp.float32

    a1, a2, a3, a4 = (aux[..., i * d:(i + 1) * d] for i in range(4))

    wI = params["I"]["w"]                      # (rd, 1 + feat + aux)
    w_x = wI[:, 0]
    w_ih2 = params["rnn2"]["w_ih"]             # (rd + aux, 3rd)
    w_fc1 = params["fc1"]["w"]                 # (fc, rd + aux)
    w_fc2 = params["fc2"]["w"]

    # sampling noise (identical draw order to _generate_scan)
    k1, k2 = jax.random.split(key)
    pick_dim = n_classes if raw_mode else nr_mix
    u1 = jax.random.uniform(k1, (T, B, pick_dim), minval=1e-5,
                            maxval=1.0 - 1e-5)
    gumbel = -jnp.log(-jnp.log(u1))
    u2 = jax.random.uniform(k2, (T, B), minval=1e-5, maxval=1.0 - 1e-5)
    logistic = jnp.log(u2) - jnp.log(1.0 - u2)

    # ---- pack the streaming block (T, Bp, D) ----------------------------
    # lane-aligned segments: [mel|a1|0](s0) [a2|0](sa) [a3|0] [a4|0]
    # [noise](128) — raw conditioning, NOT pre-projected: 5x fewer lanes.
    Bp = max(8, _round_up(B, 8))
    s0 = _round_up(feat + d, 128)
    sa = _round_up(d, 128)
    noise = jnp.zeros((T, B, 128), jnp.float32)
    noise = noise.at[..., :pick_dim].set(gumbel)
    noise = noise.at[..., pick_dim].set(logistic)

    def z(n):
        return jnp.zeros((T, B, n), jnp.float32)

    parts = [jnp.swapaxes(mels, 0, 1), jnp.swapaxes(a1, 0, 1),
             z(s0 - feat - d)]
    for a in (a2, a3, a4):
        parts += [jnp.swapaxes(a, 0, 1), z(sa - d)]
    parts.append(noise)
    step_in = jnp.concatenate(parts, axis=-1)              # (T, B, D)
    D = step_in.shape[-1]
    assert D == s0 + 3 * sa + 128
    step_in = jnp.pad(step_in, ((0, 0), (0, Bp - B), (0, 0))).astype(cdt)

    # ---- weights (VMEM-resident) ----------------------------------------
    def pad_rows(w, rows):
        return jnp.zeros((rows, w.shape[1]), cdt).at[:w.shape[0]].set(
            w.astype(cdt))

    w_c0 = pad_rows(wI[:, 1:].T, s0)               # [mel|a1] -> I
    w_c1 = pad_rows(w_ih2[rd:], sa)                # a2 -> GRU2 in-proj
    w_c2 = pad_rows(w_fc1[:, rd:].T, sa)           # a3 -> fc1
    w_c3 = pad_rows(w_fc2[:, fc:].T, sa)           # a4 -> fc2
    w_ih1 = params["rnn1"]["w_ih"].astype(cdt)
    w_hh1 = params["rnn1"]["w_hh"].astype(cdt)
    w_ih2x = w_ih2[:rd].astype(cdt)
    w_hh2 = params["rnn2"]["w_hh"].astype(cdt)
    w_fc1x = w_fc1[:, :rd].T.astype(cdt)
    w_fc2x = w_fc2[:, :fc].T.astype(cdt)
    w_fc3 = jnp.zeros((fc, 128), cdt).at[:, :n_classes].set(
        params["fc3"]["w"].T.astype(cdt))
    b3 = jnp.full((1, 128), -1e30, jnp.float32).at[0, :n_classes].set(
        params["fc3"]["b"])
    bI = params["I"]["b"][None, :].astype(jnp.float32)
    b1 = (params["rnn1"]["b_ih"])[None, :].astype(jnp.float32)
    bh1 = (params["rnn1"]["b_hh"])[None, :].astype(jnp.float32)
    bih2 = (params["rnn2"]["b_ih"])[None, :].astype(jnp.float32)
    bh2 = (params["rnn2"]["b_hh"])[None, :].astype(jnp.float32)
    bf1 = (params["fc1"]["b"])[None, :].astype(jnp.float32)
    bf2 = (params["fc2"]["b"])[None, :].astype(jnp.float32)
    w_x2 = w_x[None, :].astype(jnp.float32)

    kern = functools.partial(_kernel, T=T, Bp=Bp, rd=rd, fc=fc, s0=s0,
                             sa=sa, n_classes=n_classes, nr_mix=nr_mix,
                             raw_mode=raw_mode, cdt=cdt)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((T, Bp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + [vmem] * 20,
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM((2, Bp, D), cdt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(step_in, w_x2, w_c0, w_c1, w_c2, w_c3,
      w_ih1, w_hh1, w_ih2x, w_hh2, w_fc1x, w_fc2x, w_fc3,
      bI, b1, bh1, bih2, bh2, bf1, bf2, b3)
    return jnp.swapaxes(out, 0, 1)[:B]                     # (B, T)
