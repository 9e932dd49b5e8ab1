"""WaveRNN autoregressive vocoder, TPU-native.

Functional JAX re-design of ``autovc/wavernn/model.py:16-494``:

* **Conditioning upsampler** (model.py:16-92): MelResNet (valid k5 conv + BN
  + 10 1x1 residual blocks) whose output is nearest-neighbour stretched by
  the total scale, plus a chain of [stretch, (1, 2s+1) smoothing conv] pairs
  on the mel image.  All convs lower to XLA ``conv_general_dilated``.
* **Sampling network**: linear I -> GRU1 -> +res -> GRU2 -> +res -> fc1 ->
  fc2 -> fc3 with aux-feature concatenations (model.py:175-211).
* **Generation** (model.py:214-329): the 12k+-step per-sample Python loop of
  the reference becomes a single ``lax.scan`` that lives entirely on device:
  - the fold trick (model.py:358-399) turns sequence length into batch
    parallelism — each ~0.55 s fold is a batch row, so the per-step matmuls
    are (num_folds, 512) x (512, 1536) MXU work;
  - every input projection that does not depend on the generated sample
    (the mel/aux contributions to I, GRU2, fc1, fc2) is hoisted out of the
    scan into large time-parallel matmuls;
  - MOL/RAW sampling runs inside the scan with an on-device threefry key
    carry (no host round-trips anywhere in the loop);
  - the equal-power crossfade unfold (model.py:401-456) merges folds.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.config import WaveRNNConfig
from autovc_tpu.ops import conv as C
from autovc_tpu.ops import gru_train_pallas as GP
from autovc_tpu.ops import mol as MOL
from autovc_tpu.ops import precision as PREC
from autovc_tpu.ops import rnn as R

Params = Dict[str, Any]

_dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init(key, cfg: WaveRNNConfig = WaveRNNConfig()) -> Params:
    keys = iter(jax.random.split(key, 32))
    cd, rd, ad = cfg.compute_dims, cfg.rnn_dims, cfg.aux_dims

    def conv_nobias(k, i, o, ks):
        p = C.init_conv1d(k, i, o, ks, bias=False)
        return p

    resnet = {
        "conv_in": conv_nobias(next(keys), cfg.feat_dims, cd, cfg.pad * 2 + 1),
        "bn_in": C.init_batchnorm(cd),
        "blocks": [
            {"conv1": conv_nobias(next(keys), cd, cd, 1),
             "bn1": C.init_batchnorm(cd),
             "conv2": conv_nobias(next(keys), cd, cd, 1),
             "bn2": C.init_batchnorm(cd)}
            for _ in range(cfg.res_blocks)],
        "conv_out": C.init_conv1d(next(keys), cd, cfg.res_out_dims, 1),
    }
    # Smoothing convs: (1, 1, 1, 2s+1) kernels initialised to a box filter
    # 1/(2s+1) (model.py:80-81).
    up_convs = [jnp.full((1, 1, 1, 2 * s + 1), 1.0 / (2 * s + 1), jnp.float32)
                for s in cfg.upsample_factors]

    return {
        "upsample": {"resnet": resnet, "up_convs": up_convs},
        "I": C.init_linear(next(keys), cfg.feat_dims + ad + 1, rd),
        "rnn1": R.init_gru_layer(next(keys), rd, rd),
        "rnn2": R.init_gru_layer(next(keys), rd + ad, rd),
        "fc1": C.init_linear(next(keys), rd + ad, cfg.fc_dims),
        "fc2": C.init_linear(next(keys), cfg.fc_dims + ad, cfg.fc_dims),
        "fc3": C.init_linear(next(keys), cfg.fc_dims, cfg.n_classes),
    }


# ---------------------------------------------------------------------------
# Upsampler
# ---------------------------------------------------------------------------


def _mel_resnet(params: Params, m: jnp.ndarray, pad: int,
                train: bool = False):
    """(B, feat, F) -> (B, res_out, F - 2*pad); valid conv then 1x1 residual
    blocks (model.py:34-51)."""
    x = C.conv1d(params["conv_in"], m, padding=0)
    x, bn_in = C.batchnorm1d(params["bn_in"], x, train=train)
    x = jax.nn.relu(x)
    new_blocks = []
    for blk in params["blocks"]:
        h = C.conv1d(blk["conv1"], x, padding=0)
        h, bn1 = C.batchnorm1d(blk["bn1"], h, train=train)
        h = jax.nn.relu(h)
        h = C.conv1d(blk["conv2"], h, padding=0)
        h, bn2 = C.batchnorm1d(blk["bn2"], h, train=train)
        x = x + h
        new_blocks.append(dict(blk, bn1=bn1, bn2=bn2))
    x = C.conv1d(params["conv_out"], x, padding=0)
    new_params = dict(params, bn_in=bn_in, blocks=new_blocks)
    return x, new_params


def _stretch_time(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Nearest-neighbour stretch along the last (time) axis."""
    return jnp.repeat(x, scale, axis=-1)


def _composite_upsample_kernel(up_convs, factors):
    """Collapse the [stretch x s, (1, 2s+1) conv] chain into one banded
    frame->samples kernel.

    The chain is linear and equivariant to one-frame shifts (all strides are
    commensurate with the total scale S = prod(factors)), so it IS a single
    linear map  out[q*S + p] = sum_j K[j, p] * mel[q - j + J].  K is the
    chain's impulse response, extracted by pushing a one-frame impulse
    through the (tiny) original chain — exact, differentiable in the conv
    weights, and turns the full-length smoothing convs (the reference's
    UpsampleNetwork, wavernn/model.py:67-92, of which the last conv runs
    over the 165k-sample axis) into one small MXU contraction per frame.

    Returns (K, J): K has shape (2J+1, S); J is the one-sided frame reach.
    """
    S = int(np.prod(factors))
    reach, rem = 0, S
    for w, s in zip(up_convs, factors):
        rem //= s
        reach += ((w.shape[-1] - 1) // 2) * rem
    J = -(-reach // S)                                  # ceil(reach / S)
    margin = J
    x = jnp.zeros((1, 1, 1, 2 * margin + 1), up_convs[0].dtype)
    x = x.at[..., margin].set(1.0)
    for w, s in zip(up_convs, factors):
        x = jnp.repeat(x, s, axis=-1)
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (s, s)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=C.CONV_PRECISION)
    r = x[0, 0, 0]                                      # ((2J+1)*S,)
    K = jnp.stack([r[(margin + j) * S:(margin + j + 1) * S]
                   for j in range(-J, J + 1)])
    return K, J


def upsample(params: Params, m: jnp.ndarray, cfg: WaveRNNConfig,
             train: bool = False):
    """Conditioning upsampler (model.py:67-92).

    Args:
      m: (B, feat_dims, F) mel (already pad-extended by the caller when
         generating).
    Returns: (mels (B, T, feat), aux (B, T, res_out), new_params) with
    T = (F - 2*pad) * prod(upsample_factors).
    """
    aux, resnet_new = _mel_resnet(params["resnet"], m, cfg.pad, train=train)
    aux = _stretch_time(aux, cfg.total_scale)

    K, J = _composite_upsample_kernel(params["up_convs"],
                                      cfg.upsample_factors)
    if cfg.pad >= J:
        # Banded-kernel path: one small contraction per frame instead of
        # sample-rate convs (the k=23 conv over the 165k axis alone costs
        # ~400 ms on TPU; this path is ~100x cheaper and exact).
        B, Cc, F = m.shape
        Fp = F - 2 * cfg.pad
        wins = jnp.stack([m[:, :, cfg.pad - j:cfg.pad - j + Fp]
                          for j in range(-J, J + 1)])   # (2J+1, B, C, Fp)
        out = jnp.einsum("jp,jbcf->bfpc", K, wins,
                         precision=C.CONV_PRECISION)
        mels = out.reshape(B, Fp * cfg.total_scale, Cc)
        return mels, jnp.swapaxes(aux, 1, 2), dict(params,
                                                   resnet=resnet_new)

    x = m[:, None]                                     # (B, 1, feat, F) NCHW
    for w, s in zip(params["up_convs"], cfg.upsample_factors):
        x = jnp.repeat(x, s, axis=-1)
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(1, 1), padding=[(0, 0), (s, s)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=C.CONV_PRECISION)
    indent = cfg.pad * cfg.total_scale
    mels = x[:, 0, :, indent:-indent]                  # (B, feat, T)
    return (jnp.swapaxes(mels, 1, 2), jnp.swapaxes(aux, 1, 2),
            dict(params, resnet=resnet_new))


# ---------------------------------------------------------------------------
# Teacher-forced forward (training)
# ---------------------------------------------------------------------------


def forward(params: Params, x: jnp.ndarray, mels: jnp.ndarray,
            cfg: WaveRNNConfig, train: bool = False,
            fast_kernels: bool | None = None):
    """Teacher-forced pass (model.py:175-211).

    Args:
      x: (B, T) previous samples; mels: (B, feat, F) with
         T = (F - 2*pad) * total_scale.
      fast_kernels: force the fused Pallas GRU-pair on/off (None = auto:
        on for single-device TPU at supported geometry; GSPMD-sharded
        callers must pass False — Pallas carries no sharding rule).
    Returns: (logits (B, T, n_classes), new_params).
    """
    cond, aux, up_new = upsample(params["upsample"], mels, cfg, train=train)
    d = cfg.aux_dims
    a1, a2, a3, a4 = (aux[..., i * d:(i + 1) * d] for i in range(4))

    inp = jnp.concatenate([x[..., None], cond, a1], axis=-1)
    use_pair = (GP.pair_supported(cfg.rnn_dims) if fast_kernels is None
                else fast_kernels)
    if use_pair:
        # fused Pallas GRU-pair path (training-capable custom VJP): both
        # recurrences chained per round with VMEM-resident weights — the
        # XLA scans re-stream the weight blocks per round and were the
        # whole vocoder train step's cost (13.4% MFU, VERDICT r4 #3).
        # Layer 2's projection splits into the hoisted xI/a2 part (base2)
        # and the in-kernel h1 part; x1 = xI + h1 by the residual chain.
        # The WHOLE sample-rate chain runs TIME-MAJOR: only the small
        # pre-projection input (I channels) and the final logits are
        # transposed — transposing the (T, B, 3H) kernel streams instead
        # measured ~3 ms/step of pure relayout.
        rd = cfg.rnn_dims
        w2 = params["rnn2"]["w_ih"]
        xI = C.linear(params["I"], jnp.swapaxes(inp, 0, 1))     # (T, B, rd)
        a2t, a3t, a4t = (jnp.swapaxes(a, 0, 1) for a in (a2, a3, a4))
        xp1 = R.gru_project_inputs(params["rnn1"], xI)
        base2 = (PREC.dot(xI, w2[:rd]) + PREC.dot(a2t, w2[rd:])
                 + params["rnn2"]["b_ih"])
        h, h2 = GP.gru_pair(xp1, base2, w2[:rd],
                            params["rnn1"]["w_hh"], params["rnn1"]["b_hh"],
                            params["rnn2"]["w_hh"], params["rnn2"]["b_hh"])
        x1 = h + xI
        x2 = h2 + x1
        # split matmuls instead of concat([big, aux]) @ W: the concat
        # copies a ~95 MB sample-rate tensor per fc layer per step
        wf1, wf2 = params["fc1"]["w"], params["fc2"]["w"]
        fcd = cfg.fc_dims
        x3 = jax.nn.relu(PREC.dot(x2, wf1[:, :rd].T)
                         + PREC.dot(a3t, wf1[:, rd:].T)
                         + params["fc1"]["b"])
        x4 = jax.nn.relu(PREC.dot(x3, wf2[:, :fcd].T)
                         + PREC.dot(a4t, wf2[:, fcd:].T)
                         + params["fc2"]["b"])
        logits = jnp.swapaxes(C.linear(params["fc3"], x4), 0, 1)
        return logits, dict(params, upsample=up_new)
    xI = C.linear(params["I"], inp)
    res = xI
    h, _ = R.gru_layer(params["rnn1"], xI)
    x1 = h + res
    res = x1
    h2, _ = R.gru_layer(params["rnn2"],
                        jnp.concatenate([x1, a2], axis=-1))
    x2 = h2 + res
    x3 = jax.nn.relu(C.linear(params["fc1"],
                              jnp.concatenate([x2, a3], axis=-1)))
    x4 = jax.nn.relu(C.linear(params["fc2"],
                              jnp.concatenate([x3, a4], axis=-1)))
    logits = C.linear(params["fc3"], x4)
    return logits, dict(params, upsample=up_new)


def encode_mu_law(x: jnp.ndarray, mu: int) -> jnp.ndarray:
    """mu-law companding of a [-1, 1] signal (the encode side of the
    contract whose decode is :func:`decode_mu_law` / the ``_finish`` expand;
    upstream-WaveRNN semantics behind the reference's ``mu_law`` flag,
    hparams.py:113, wavernn/model.py:315-317)."""
    mu = mu - 1
    return jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)


def loss(params: Params, x_in: jnp.ndarray, y_target: jnp.ndarray,
         mels: jnp.ndarray, cfg: WaveRNNConfig, train: bool = True,
         fast_kernels: bool | None = None):
    """Vocoder training loss: MOL NLL (mode 'MOL') or cross-entropy over
    quantised classes (mode 'RAW').  The reference ships no vocoder training
    loop (SURVEY.md §2a #6) — this is the standard WaveRNN objective.

    RAW mode with ``cfg.generate.mu_law`` trains in the COMPANDED domain:
    both the teacher-forced input and the quantised target are mu-law
    encoded, matching generation (the sampled class feeds back as a
    companded value and ``_finish`` expands the final stream)."""
    if cfg.mode == "RAW" and cfg.generate.mu_law:
        x_in = encode_mu_law(x_in, cfg.n_classes)
        y_target = encode_mu_law(y_target, cfg.n_classes)
    logits, new_params = forward(params, x_in, mels, cfg, train=train,
                                 fast_kernels=fast_kernels)
    if cfg.mode == "MOL":
        l = MOL.discretized_mix_logistic_loss(logits, y_target[..., None])
    else:
        classes = jnp.clip(
            ((y_target + 1.0) * (cfg.n_classes - 1) / 2.0 + 0.5).astype(
                jnp.int32), 0, cfg.n_classes - 1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        l = -jnp.mean(jnp.take_along_axis(logp, classes[..., None],
                                          axis=-1))
    return l, new_params


# ---------------------------------------------------------------------------
# Generation
# ---------------------------------------------------------------------------


def pad_mel(mel: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Zero-pad the mel time axis on both sides (model.py:346-356)."""
    return jnp.pad(mel, ((0, 0), (0, 0), (pad, pad)))


# Fold-length ladder for auto geometry: a small discrete set (bounded
# compile-cache variants), geometric steps, all near-multiples of the
# reference's 550-sample crossfade overlap (hparams.py:110-112).  Capped at
# 22000: measured on TPU v5e, per-step cost grows with fold length beyond
# that (a 44000-fold pass runs ~2x slower than the same audio at 11000-
# 22000), so longer folds stop paying for their fewer crossfade seams.
_TARGET_LADDER = (1_375, 2_750, 5_500, 11_000, 22_000)

# Measured per-step kernel time (us) vs fold-row count, TPU v5e, r4 sweep
# (scripts/exp_sampling_rows.py).  NOT flat beyond 32 as the r3 model
# assumed: throughput keeps rising to 64 rows (85% bf16 MFU), with a local
# anomaly at 40 rows (2.58 us — slower than 48's 2.54, so the row bucket
# ladder skips 40 entirely).
_ROWS_US = ((8, 1.77), (16, 1.84), (24, 1.89), (32, 2.00), (48, 2.54),
            (64, 2.85), (80, 3.79), (96, 4.44), (128, 5.74))
_ROW_BUCKETS = (8, 16, 24, 32, 48, 64)
_MAX_SLAB_ROWS = 64


def _row_bucket(rows: int) -> int:
    """Smallest efficient kernel row count >= rows (skips the measured
    40-row anomaly); beyond 64, 8-multiples — the pallas caller runs one
    pass up to its VMEM row cap (``_pallas_max_rows``) and tiles into
    cap-row passes past that, the XLA scan caller tiles at
    ``_MAX_SLAB_ROWS``."""
    for b in _ROW_BUCKETS:
        if rows <= b:
            return b
    return -(-rows // 8) * 8


def _us_per_step(rows: int) -> float:
    """Piecewise-linear interpolation of the measured per-step time."""
    if rows <= _ROWS_US[0][0]:
        return _ROWS_US[0][1]
    for (r0, u0), (r1, u1) in zip(_ROWS_US, _ROWS_US[1:]):
        if rows <= r1:
            return u0 + (u1 - u0) * (rows - r0) / (r1 - r0)
    r1, u1 = _ROWS_US[-1]
    r0, u0 = _ROWS_US[-2]
    return u1 + (u1 - u0) / (r1 - r0) * (rows - r1)


def _fold_count(total_len: int, target: int, overlap: int) -> int:
    num_folds = max(0, (total_len - overlap) // (target + overlap))
    if total_len - (num_folds * (overlap + target) + overlap) != 0:
        num_folds += 1
    return max(num_folds, 1)


def _sampling_wall_model(total_len: int, target: int, overlap: int,
                         cfg=None, cap: int | None = None) -> float:
    """Predicted kernel wall time (us) of the geometry the caller ACTUALLY
    runs.  Single-generate (``_generate_program``, pallas branch): one pass
    while the fold count fits the VMEM-derived row cap (``_pallas_max_rows``
    via ``cfg``; ~180 rows at the default config), tiled into cap-row passes
    beyond.  The union-slab path (``_generate_many_program``) tiles at
    ``_MAX_SLAB_ROWS`` — its callers pass ``cap=_MAX_SLAB_ROWS``.  Per-pass
    cost interpolates/extrapolates the chip-measured ``_ROWS_US`` table.
    (The r4 model tiled everything at 64 rows — a geometry single-generate
    never executes: a measured 80-fold single pass costs 3.79 us/step vs
    the modeled 64+16 tiling's 4.69.)  Without ``cfg``/``cap`` the cap
    falls back to the table edge (128 rows)."""
    seq = target + 2 * overlap
    folds = _fold_count(total_len, target, overlap)
    if cap is None:
        if cfg is not None and seq % cfg.total_scale == 0:
            fpf = seq // cfg.total_scale
            # single passes are capped at the largest MEASURED row count
            # (the _ROWS_US table edge) even when VMEM would fit more —
            # beyond it the per-row cost is unmeasured, and at the edge a
            # 128-row pass (5.74/128 us/row) already equals 64-row tiling
            cap = max(8, min((_pallas_max_rows(cfg, fpf) // 8) * 8,
                             _ROWS_US[-1][0]))
        else:
            cap = _ROWS_US[-1][0]
    full, rem = divmod(folds, cap)
    us = full * _us_per_step(cap)
    if rem:
        us += _us_per_step(_row_bucket(rem))
    return seq * us


def auto_fold_target(total_len: int, overlap: int = 550, cfg=None,
                     cap: int | None = None) -> int:
    """Pick the fold length minimising the measured-cost wall model.

    The reference pins target=11000 for every input (hparams.py:110): a
    7 s clip then folds to ~15 rows x 12100 sequential steps, badly
    underfilling the MXU.  The model trades sequential steps against
    per-pass row efficiency using the chip-measured _ROWS_US table: short
    audio folds shorter (more rows, fewer steps — a 5 s clip lands 64 rows
    x 2475 steps, ~29% faster than the r3 knee-of-32 choice), long audio
    keeps long folds (fewer crossfade seams than the reference).
    ``cfg`` (a WaveRNNConfig) lets the model use the true VMEM row cap of
    the single-generate sampling pass; slab callers pass
    ``cap=_MAX_SLAB_ROWS``; with neither, the cap is the table edge.
    """
    if total_len <= 0:
        return _TARGET_LADDER[0]
    return min(_TARGET_LADDER,
               key=lambda t: _sampling_wall_model(total_len, t, overlap,
                                                  cfg, cap))


def fold_with_overlap(x: jnp.ndarray, target: int, overlap: int):
    """(1, T, C) -> (num_folds, target + 2*overlap, C) (model.py:358-399).
    Fold count comes from :func:`_fold_count` — the single implementation
    the wall model and the frame-rate fold share."""
    _, total_len, features = x.shape
    # clamp like _fold_count: for sub-overlap inputs (~<25 ms audio) the
    # unclamped base is -1 and the remainder pad under-pads the single fold
    base = max(0, (total_len - overlap) // (target + overlap))
    num_folds = _fold_count(total_len, target, overlap)
    if num_folds != base:                       # remainder fold: pad tail
        remaining = total_len - (base * (overlap + target) + overlap)
        x = jnp.pad(x, ((0, 0), (0, target + 2 * overlap - remaining),
                        (0, 0)))
    length = target + 2 * overlap
    starts = [i * (target + overlap) for i in range(num_folds)]
    return jnp.stack([
        jax.lax.dynamic_slice(x[0], (s, 0), (length, features))
        for s in starts])


@functools.partial(jax.jit, static_argnames=("overlap",))
def xfade_and_unfold_device(y: jnp.ndarray, overlap: int) -> jnp.ndarray:
    """Equal-power crossfade overlap-add on device (same math as
    :func:`xfade_and_unfold`, f32): rows overlap their successor by
    ``overlap`` samples, so the unfold is one flatten plus one shifted add —
    no scatter.  Keeping this on device means only the final waveform ever
    crosses the host boundary."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    stride = target + overlap

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = jnp.linspace(-1.0, 1.0, fade_len, dtype=y.dtype)
    fade_in = jnp.concatenate([jnp.zeros(silence_len, y.dtype),
                               jnp.sqrt(0.5 * (1.0 + t))])
    fade_out = jnp.concatenate([jnp.ones(silence_len, y.dtype),
                                jnp.sqrt(0.5 * (1.0 - t))])
    y = y.at[:, :overlap].multiply(fade_in)
    y = y.at[:, -overlap:].multiply(fade_out)

    main = y[:, :stride].reshape(num_folds * stride)
    # row i's tail lands on row i+1's first `overlap` samples
    tails = jnp.pad(y[:, stride:], ((1, 0), (0, stride - overlap)))
    out = jnp.pad(main, (0, overlap)) + tails.reshape(-1)[:main.size + overlap]
    return out


@functools.partial(jax.jit, static_argnames=("overlap", "wave_len", "hop",
                                             "batched", "mu_law",
                                             "n_classes"))
def _finish(samples: jnp.ndarray, overlap: int, wave_len: int, hop: int,
            batched: bool, mu_law: bool, n_classes: int) -> jnp.ndarray:
    """Post-sampling tail (mu-law expand -> unfold -> trim -> fade) as ONE
    compiled program: eagerly dispatched tail ops each pay a host round
    trip on tunneled devices and dominated conversion latency."""
    if mu_law:
        samples = jnp.sign(samples) / (n_classes - 1) * (
            n_classes ** jnp.abs(samples) - 1)
    out = xfade_and_unfold_device(samples, overlap) if batched \
        else samples[0]
    out = out[:wave_len]
    L = int(out.shape[0])
    # 20-hop linear fade-out (model.py:325-327); outputs shorter than the
    # fade get the whole ramp compressed into their length so the tail
    # still ends at exactly zero gain (a truncated ramp would not).
    fade_n = min(20 * hop, L)
    fade = jnp.linspace(1.0, 0.0, fade_n, dtype=out.dtype)
    return out.at[L - fade_n:].multiply(fade)


@functools.partial(jax.jit, static_argnames=("counts", "wave_lens",
                                             "overlap", "hop"))
def _finish_many(samples: jnp.ndarray, counts: tuple, wave_lens: tuple,
                 overlap: int, hop: int) -> jnp.ndarray:
    """Batch-serving tail: per-utterance unfold/trim/fade fused into one
    program returning ONE flat packed array for one host readback.

    Packed, not stacked: a (n, max_len) stack pads every utterance to the
    longest (~40% dead bytes on mixed-length batches), and the device->host
    link is the serving bottleneck — so utterances are concatenated
    back-to-back and the host slices them apart by offset."""
    outs, row = [], 0
    for n_folds, wl in zip(counts, wave_lens):
        y = jax.lax.dynamic_slice_in_dim(samples, row, n_folds, 0)
        row += n_folds
        out = xfade_and_unfold_device(y, overlap)[:wl]
        L = int(out.shape[0])
        fade_n = min(20 * hop, L)   # full ramp to zero even when L < fade
        fade = jnp.linspace(1.0, 0.0, fade_n, dtype=out.dtype)
        outs.append(out.at[L - fade_n:].multiply(fade))
    # 16-bit PCM readback: the delivered format is 16-bit anyway, and it
    # halves the (bandwidth-bound) device->host transfer
    flat = jnp.concatenate(outs)
    return jnp.clip(jnp.round(flat * 32767.0), -32767, 32767).astype(
        jnp.int16)


def xfade_and_unfold(y: np.ndarray, overlap: int) -> np.ndarray:
    """Equal-power crossfade overlap-add of folded sample rows
    (model.py:401-456).  Host-side numpy (cheap, one pass)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total_len = num_folds * (target + overlap) + overlap

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    t = np.linspace(-1, 1, fade_len, dtype=np.float64)
    fade_in = np.concatenate([np.zeros(silence_len), np.sqrt(0.5 * (1 + t))])
    fade_out = np.concatenate([np.ones(silence_len), np.sqrt(0.5 * (1 - t))])

    y = y.astype(np.float64).copy()
    y[:, :overlap] *= fade_in
    y[:, -overlap:] *= fade_out

    unfolded = np.zeros(total_len, dtype=np.float64)
    for i in range(num_folds):
        start = i * (target + overlap)
        unfolded[start:start + length] += y[i]
    return unfolded


def decode_mu_law(y: np.ndarray, mu: int) -> np.ndarray:
    """mu-law expansion (the reference leaves this NotImplemented,
    model.py:315-317; provided here for RAW-mode parity with upstream
    WaveRNN)."""
    mu = mu - 1
    return np.sign(y) / mu * ((1 + mu) ** np.abs(y) - 1)


@functools.partial(jax.jit, static_argnames=("cfg", "fast_math", "unroll"))
def _generate_scan(params: Params, mels: jnp.ndarray, aux: jnp.ndarray,
                   key, cfg: WaveRNNConfig, fast_math: bool = True,
                   unroll: int = 4):
    """The autoregressive sampling loop as one ``lax.scan``.

    Args:
      mels: (B, T, feat) upsampled conditioning (already folded);
      aux: (B, T, res_out).
      fast_math: run the recurrent matmuls in bfloat16 (halves the per-step
        HBM weight traffic, which dominates this loop: ~17 MB of GRU/fc
        weights are re-read every step).  Sampling math stays float32.
    Returns (B, T) samples in [-1, 1].
    """
    B, T, _ = mels.shape
    rd = cfg.rnn_dims
    d = cfg.aux_dims
    a1, a2, a3, a4 = (aux[..., i * d:(i + 1) * d] for i in range(4))

    cdt = jnp.bfloat16 if fast_math else jnp.float32
    prec = (jax.lax.Precision.DEFAULT if fast_math
            else jax.lax.Precision.HIGHEST)

    def dot(a, b):
        return jnp.matmul(a, b, precision=prec,
                          preferred_element_type=jnp.float32)

    # ---- hoisted time-parallel projections (big MXU matmuls) -------------
    # I layer: input is [x, m_t, a1_t]; split off the x column.
    wI = params["I"]["w"]                      # (rd, 1 + feat + aux)
    bI = params["I"]["b"]
    w_x = wI[:, 0]                             # (rd,)
    w_rest = wI[:, 1:]                         # (rd, feat + aux)
    pre_I = _dot(jnp.concatenate([mels, a1], axis=-1), w_rest.T) + bI

    # GRU1 input is the I output -> nothing hoistable beyond pre_I.
    # GRU2 input is [x1, a2]: split w_ih rows.
    w_ih2 = params["rnn2"]["w_ih"]             # (rd + aux, 3*rd)
    pre_r2 = _dot(a2, w_ih2[rd:]) + params["rnn2"]["b_ih"]

    # fc1 input is [x2, a3]; fc2 input is [x3, a4]: split columns.
    w_fc1 = params["fc1"]["w"]                 # (fc, rd + aux)
    pre_f1 = _dot(a3, w_fc1[:, rd:].T) + params["fc1"]["b"]
    w_fc2 = params["fc2"]["w"]
    pre_f2 = _dot(a4, w_fc2[:, cfg.fc_dims:].T) + params["fc2"]["b"]

    # Recurrent weights, cast once outside the scan.
    w_ih1 = params["rnn1"]["w_ih"].astype(cdt)
    b_ih1 = params["rnn1"]["b_ih"].astype(jnp.float32)
    w_hh1 = params["rnn1"]["w_hh"].astype(cdt)
    b_hh1 = params["rnn1"]["b_hh"].astype(jnp.float32)
    w_ih2x = w_ih2[:rd].astype(cdt)
    w_hh2 = params["rnn2"]["w_hh"].astype(cdt)
    b_hh2 = params["rnn2"]["b_hh"].astype(jnp.float32)
    w_fc1x = w_fc1[:, :rd].T.astype(cdt)
    w_fc2x = w_fc2[:, :cfg.fc_dims].T.astype(cdt)
    w_fc3 = params["fc3"]["w"].T.astype(cdt)
    b_fc3 = params["fc3"]["b"].astype(jnp.float32)

    n_classes = cfg.n_classes
    raw_mode = cfg.mode == "RAW"
    nr_mix = n_classes // 3

    # ---- hoisted sampling noise ------------------------------------------
    # Per-step threefry + log/log1p transcendentals are expensive inside the
    # loop; pregenerate Gumbel noise (mixture / class pick) and logistic
    # noise (inverse-CDF draw) for every step up front.
    k1, k2 = jax.random.split(key)
    pick_dim = n_classes if raw_mode else nr_mix
    u1 = jax.random.uniform(k1, (T, B, pick_dim), minval=1e-5,
                            maxval=1.0 - 1e-5)
    gumbel = -jnp.log(-jnp.log(u1))
    u2 = jax.random.uniform(k2, (T, B), minval=1e-5, maxval=1.0 - 1e-5)
    logistic = jnp.log(u2) - jnp.log(1.0 - u2)

    def gru(h, xp, w_hh, b_hh):
        """GRU step on precomputed input projection xp (f32 h carry)."""
        hp = dot(h.astype(cdt), w_hh) + b_hh
        xr, xz, xn = jnp.split(xp, 3, axis=-1)
        hr, hz, hn = jnp.split(hp, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n + z * h

    def step(carry, inputs):
        x, h1, h2 = carry
        pre_I_t, pre_r2_t, pre_f1_t, pre_f2_t, gumbel_t, logistic_t = inputs

        xI = x * w_x[None, :] + pre_I_t                       # (B, rd) f32
        h1 = gru(h1, dot(xI.astype(cdt), w_ih1) + b_ih1, w_hh1, b_hh1)
        x1 = xI + h1
        h2 = gru(h2, dot(x1.astype(cdt), w_ih2x) + pre_r2_t, w_hh2, b_hh2)
        x2 = x1 + h2
        x3 = jax.nn.relu(dot(x2.astype(cdt), w_fc1x) + pre_f1_t)
        x4 = jax.nn.relu(dot(x3.astype(cdt), w_fc2x) + pre_f2_t)
        logits = dot(x4.astype(cdt), w_fc3) + b_fc3           # (B, classes)

        if raw_mode:
            pick = jnp.argmax(logits + gumbel_t, axis=-1)
            sample = (2.0 * pick.astype(jnp.float32)
                      / (n_classes - 1.0) - 1.0)
        else:
            # Gumbel-max mixture pick + logistic inverse CDF
            # (distribution.py:87-123 semantics, noise hoisted).
            pick = jnp.argmax(logits[..., :nr_mix] + gumbel_t, axis=-1)
            onehot = jax.nn.one_hot(pick, nr_mix, dtype=logits.dtype)
            means = jnp.sum(logits[..., nr_mix:2 * nr_mix] * onehot, -1)
            log_scales = jnp.maximum(
                jnp.sum(logits[..., 2 * nr_mix:] * onehot, -1),
                MOL.LOG_SCALE_MIN)
            sample = jnp.clip(means + jnp.exp(log_scales) * logistic_t,
                              -1.0, 1.0)
        return (sample[:, None], h1, h2), sample

    init_carry = (jnp.zeros((B, 1), jnp.float32),
                  jnp.zeros((B, rd), jnp.float32),
                  jnp.zeros((B, rd), jnp.float32))
    xs = tuple(jnp.swapaxes(p, 0, 1)
               for p in (pre_I, pre_r2, pre_f1, pre_f2)) + (gumbel, logistic)
    _, samples = jax.lax.scan(step, init_carry, xs, unroll=unroll)
    return jnp.swapaxes(samples, 0, 1)                        # (B, T)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "target", "overlap", "batched"))
def _prepare_conditioning(params: Params, mel: jnp.ndarray,
                          cfg: WaveRNNConfig, target: int, overlap: int,
                          batched: bool):
    """Pad -> upsample -> fold, fused in one compiled program."""
    cond, aux, _ = upsample(params["upsample"], pad_mel(mel, cfg.pad), cfg)
    if batched:
        cond = fold_with_overlap(cond, target, overlap)
        aux = fold_with_overlap(aux, target, overlap)
    return cond, aux


def _fold_rows(x: jnp.ndarray, target_f: int, overlap_f: int, margin: int):
    """Frame-rate analogue of :func:`fold_with_overlap` with a symmetric
    ``margin`` of extra frames per row (zero-filled out of sequence range).

    (1, F, C) -> (num_folds, target_f + 2*overlap_f + 2*margin, C).  Fold
    count and remainder padding are the exact frame-unit images of the
    sample-rate fold (every sample-rate fold quantity is divisible by the
    total scale), so row r's frames are precisely the frames whose
    upsampled samples land in sample-rate fold row r."""
    _, F, C = x.shape
    base = max(0, (F - overlap_f) // (target_f + overlap_f))
    num_folds = _fold_count(F, target_f, overlap_f)
    if num_folds != base:                       # remainder fold: pad tail
        remaining = F - (base * (overlap_f + target_f) + overlap_f)
        x = jnp.pad(x, ((0, 0), (0, target_f + 2 * overlap_f - remaining),
                        (0, 0)))
    x = jnp.pad(x, ((0, 0), (margin, margin), (0, 0)))
    length = target_f + 2 * overlap_f + 2 * margin
    starts = [i * (target_f + overlap_f) for i in range(num_folds)]
    return jnp.stack([jax.lax.dynamic_slice(x[0], (s, 0), (length, C))
                      for s in starts])


def _pallas_max_rows(cfg: WaveRNNConfig, fpf: int,
                     fast_math: bool = True,
                     budget: int = 100 * 1024 * 1024) -> int:
    """Largest fold-row count one generate_rows_pallas call can hold.

    The rows kernel keeps weights + per-row frame conditioning + noise
    buffers + the output in VMEM, so its footprint scales with rows x
    frames; callers slab (or fall back to the XLA scan) beyond this."""
    from autovc_tpu.utils.roofline import _band_reach
    rd, fc, S = cfg.rnn_dims, cfg.fc_dims, cfg.total_scale
    cdt = 2 if fast_math else 4
    J = _band_reach(cfg)
    weights = (4 * rd * 3 * rd + rd * fc + fc * fc + fc * 128) * cdt
    per_row = (fpf * (4 * rd + 2 * fc) * cdt          # fblk
               + (fpf + 2 * J) * rd * 4               # mf
               + 2 * S * 128 * cdt                    # noise double-buffer
               + fpf * S * 4)                         # output
    return max(0, (budget - weights) // per_row)


def _pallas_ok(cfg: WaveRNNConfig, interpret: bool) -> bool:
    """Hardware-kernel geometry preconditions (beyond fold alignment)."""
    return interpret or (cfg.rnn_dims % 128 == 0 and cfg.fc_dims % 128 == 0)


def resolve_backend(backend: str, cfg: WaveRNNConfig, target: int,
                    overlap: int, batched: bool = True,
                    interpret: bool = False,
                    mel_frames: int | None = None,
                    fast_math: bool = True) -> str:
    """Resolve 'auto'/'pallas'/'xla' to the backend that can actually run
    this geometry — ONE gate shared by :func:`generate`,
    :func:`generate_many` and the stage-pipeline vocoder
    (parallel/pipeline.py), so every serving path picks the same winner.
    ``fast_math`` must match the value passed to generation: the unbatched
    VMEM-fit gate depends on the weight/conditioning dtype."""
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    if backend != "pallas":
        return backend
    if not _pallas_ok(cfg, interpret):
        return "xla"          # hardware kernel needs rd/fc % 128 == 0
    if batched and (target % cfg.total_scale or overlap % cfg.total_scale):
        return "xla"          # rows kernel needs frame-aligned geometry
    if (not batched and mel_frames is not None
            and _pallas_max_rows(cfg, mel_frames, fast_math) < 1):
        return "xla"          # unbatched long audio exceeds kernel VMEM
    return "pallas"


def _prepare_frame_conditioning(params: Params, mel: jnp.ndarray,
                                cfg: WaveRNNConfig, target: int,
                                overlap: int, batched: bool,
                                aux_pre: jnp.ndarray | None = None):
    """Frame-rate conditioning for the Pallas rows kernel.

    Produces (mel_rows (B, fpf+2J, feat), aux_rows (B, fpf, res_out)) with
    fpf = (target + 2*overlap) / total_scale: the kernel applies the banded
    frame->sample upsampling in VMEM, so the sample-rate conditioning tensor
    (275x larger — the r2 roofline's dominant HBM term,
    `wavernn/model.py:67-92`'s output) is never materialised.  Requires
    target % total_scale == overlap % total_scale == 0 (all public ladder
    values are)."""
    S = cfg.total_scale
    _, J = _composite_upsample_kernel(params["upsample"]["up_convs"],
                                      cfg.upsample_factors)
    if aux_pre is None:
        aux, _ = _mel_resnet(params["upsample"]["resnet"],
                             pad_mel(mel, cfg.pad), cfg.pad)
    else:
        # precomputed (1, res_out, F) features — the batch-serving path
        # runs ONE MelResNet pass over every utterance (padded to the
        # longest; valid convs make the shared pass exact per utterance)
        # instead of a latency-bound per-utterance pass each
        aux = aux_pre
    aux = jnp.swapaxes(aux, 1, 2)                      # (1, F, res_out)
    melT = jnp.swapaxes(mel, 1, 2)                     # (1, F, feat)
    if not batched:
        return jnp.pad(melT, ((0, 0), (J, J), (0, 0))), aux
    assert target % S == 0 and overlap % S == 0, \
        "pallas rows backend needs fold geometry divisible by total_scale"
    return (_fold_rows(melT, target // S, overlap // S, J),
            _fold_rows(aux, target // S, overlap // S, 0))


@functools.partial(jax.jit,
                   static_argnames=("cfg", "target", "overlap", "batched",
                                    "mu_law", "fast_math", "unroll",
                                    "backend", "interpret"))
def _generate_program(params: Params, mel: jnp.ndarray, key,
                      cfg: WaveRNNConfig, target: int, overlap: int,
                      batched: bool, mu_law: bool, fast_math: bool,
                      unroll: int, backend: str, interpret: bool):
    """The COMPLETE mel->waveform chain as one compiled program: upsample,
    fold, sampling loop, crossfade-unfold, trim, fade.  One dispatch per
    conversion instead of ~7 (each dispatch costs a host round-trip on
    tunneled devices)."""
    wave_len = (mel.shape[-1] - 1) * cfg.hop_length
    if backend == "pallas":
        mel_rows, aux_rows = _prepare_frame_conditioning(
            params, mel, cfg, target, overlap, batched)
        # Bucket rows to the efficient-ladder entry with zero rows (bounds
        # jit variants, aligns the MXU operand, skips the measured 40-row
        # anomaly); dropped after sampling.
        n_folds = mel_rows.shape[0]
        bucket = _row_bucket(n_folds)
        if bucket != n_folds:
            pad_rows = ((0, bucket - n_folds), (0, 0), (0, 0))
            mel_rows = jnp.pad(mel_rows, pad_rows)
            aux_rows = jnp.pad(aux_rows, pad_rows)
        from autovc_tpu.ops import wavernn_pallas
        fpf = aux_rows.shape[1]
        # single-pass cap: VMEM fit AND the largest measured row count —
        # the same cap _sampling_wall_model scores, so the geometry the
        # fold-target picker models is the geometry that executes
        max_rows = max(8, min(
            (_pallas_max_rows(cfg, fpf, fast_math) // 8) * 8,
            _ROWS_US[-1][0]))
        if bucket <= max_rows:
            samples = wavernn_pallas.generate_rows_pallas(
                params, mel_rows, aux_rows, key, cfg, fast_math,
                interpret=interpret)
        else:
            # long audio: the kernel's VMEM footprint scales with rows x
            # frames, so tile the fold rows across several kernel passes
            # (per-pass keys; each pass is still one fused program)
            if bucket % max_rows:
                extra = -(-bucket // max_rows) * max_rows - bucket
                mel_rows = jnp.pad(mel_rows,
                                   ((0, extra), (0, 0), (0, 0)))
                aux_rows = jnp.pad(aux_rows,
                                   ((0, extra), (0, 0), (0, 0)))
            outs = []
            for s in range(0, mel_rows.shape[0], max_rows):
                key, sk = jax.random.split(key)
                outs.append(wavernn_pallas.generate_rows_pallas(
                    params, mel_rows[s:s + max_rows],
                    aux_rows[s:s + max_rows], sk, cfg, fast_math,
                    interpret=interpret))
            samples = jnp.concatenate(outs, axis=0)
    else:
        cond, aux = _prepare_conditioning(params, mel, cfg, target, overlap,
                                          batched)
        n_folds = cond.shape[0]
        bucket = -(-n_folds // 8) * 8
        if bucket != n_folds:
            pad_rows = ((0, bucket - n_folds), (0, 0), (0, 0))
            cond = jnp.pad(cond, pad_rows)
            aux = jnp.pad(aux, pad_rows)
        if bucket <= _MAX_SLAB_ROWS:
            samples = _generate_scan(params, cond, aux, key, cfg, fast_math,
                                     unroll)
        else:
            # long audio: the scan hoists per-row time-parallel projections
            # (rows x steps x 1536+ f32) — unbounded rows OOM HBM (a 45 s
            # clip is ~300 rows = ~20 GB of hoisted tensors); tile the fold
            # rows into bounded slabs exactly like _generate_many_program
            outs = []
            for s in range(0, bucket, _MAX_SLAB_ROWS):
                key, sk = jax.random.split(key)
                outs.append(_generate_scan(
                    params, cond[s:s + _MAX_SLAB_ROWS],
                    aux[s:s + _MAX_SLAB_ROWS], sk, cfg, fast_math, unroll))
            samples = jnp.concatenate(outs, axis=0)
    samples = samples[:n_folds]
    return _finish(samples, overlap, wave_len, cfg.hop_length, batched,
                   mu_law, cfg.n_classes)


def generate(params: Params, mel: np.ndarray,
             cfg: WaveRNNConfig = WaveRNNConfig(),
             key=None, batched: bool | None = None,
             target: int | None = None, overlap: int | None = None,
             mu_law: bool | None = None, fast_math: bool = True,
             unroll: int = 4, backend: str = "auto",
             interpret: bool = False) -> np.ndarray:
    """Generate a waveform from a mel spectrogram (model.py:214-329).

    Args:
      mel: (1, feat, F) or (feat, F) conditioning mel.
      backend: 'pallas' (TPU kernel, VMEM-resident weights, ~100x faster
        compile than the XLA scan), 'xla' (portable `lax.scan`), or 'auto'
        (pallas on TPU, xla elsewhere).
    Returns float32 waveform of length (F - 1) * hop_length.
    """
    g = cfg.generate
    batched = g.batched if batched is None else batched
    overlap = g.overlap if overlap is None else overlap
    mu_law = (g.mu_law if mu_law is None else mu_law) and cfg.mode == "RAW"
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))

    mel = jnp.asarray(mel, jnp.float32)
    if mel.ndim == 2:
        mel = mel[None]
    if target == "auto" or (target is None and g.auto_target):
        target = auto_fold_target((mel.shape[-1] - 1) * cfg.hop_length,
                                  overlap, cfg)
    elif target is None:
        target = g.target
    backend = resolve_backend(backend, cfg, target, overlap, batched,
                              interpret, int(mel.shape[-1]), fast_math)
    output = _generate_program(params, mel, key, cfg, target, overlap,
                               batched, mu_law, fast_math, unroll, backend,
                               interpret)
    # the finished waveform is the ONLY array that crosses the host boundary
    return np.asarray(output, dtype=np.float32)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "target", "overlap", "fast_math",
                                    "unroll", "backend", "slab_rows",
                                    "interpret"))
def _generate_many_program(params: Params, mels: tuple, key,
                           cfg: WaveRNNConfig, target: int, overlap: int,
                           fast_math: bool, unroll: int, backend: str,
                           slab_rows: int | None = None,
                           interpret: bool = False):
    """Whole-serve-pass program: per-utterance conditioning, the union
    slab sampling loop, per-utterance unfold/trim/fade, one int16 stack."""
    aux_all = None
    if backend == "pallas" and len(mels) > 1:
        # ONE MelResNet pass for the whole serve batch (utterances padded
        # to the longest mel): the per-utterance passes are latency-bound
        # small convs and cost ~1 ms each (~8 ms of a 92 ms serve batch);
        # valid convs + eval-mode BN make the shared pass exact per
        # utterance (trailing zero frames cannot reach frame < F_u)
        Fmax = max(int(m.shape[-1]) for m in mels)
        stacked = jnp.concatenate(
            [jnp.pad(m, ((0, 0), (0, 0), (0, Fmax - m.shape[-1])))
             for m in mels], axis=0)
        aux_all, _ = _mel_resnet(params["upsample"]["resnet"],
                                 pad_mel(stacked, cfg.pad), cfg.pad)

    conds, auxs, counts, wave_lens = [], [], [], []
    for u, mel in enumerate(mels):
        wave_lens.append((mel.shape[-1] - 1) * cfg.hop_length)
        if backend == "pallas":
            aux_pre = (None if aux_all is None
                       else aux_all[u:u + 1, :, :mel.shape[-1]])
            cond, aux = _prepare_frame_conditioning(
                params, mel, cfg, target, overlap, True, aux_pre)
        else:
            cond, aux = _prepare_conditioning(params, mel, cfg, target,
                                              overlap, True)
        conds.append(cond)
        auxs.append(aux)
        counts.append(cond.shape[0])

    cond = jnp.concatenate(conds, axis=0)
    aux = jnp.concatenate(auxs, axis=0)
    total_folds = cond.shape[0]

    # Process in fixed-size slabs.  At scale the slab is 64 rows — the
    # r4 rows sweep measured per-row cost still FALLING to 64 rows (85%
    # bf16 MFU, vs 61% at the r3 32-row choice) — giving ONE compiled
    # program for any workload size; smaller workloads use the efficient
    # row-bucket ladder so tests and single calls don't pad up.
    slab_rows = _MAX_SLAB_ROWS if slab_rows is None else slab_rows
    if not (slab_rows > 0 and slab_rows % 8 == 0):
        raise ValueError(f"slab_rows must be a positive multiple of 8, "
                         f"got {slab_rows}")
    if backend == "pallas":
        # cap by the rows kernel's VMEM footprint (scales with fold length)
        fpf = (target + 2 * overlap) // cfg.total_scale
        slab_rows = min(slab_rows, max(
            8, (_pallas_max_rows(cfg, fpf, fast_math) // 8) * 8))
    SLAB = min(slab_rows, _row_bucket(total_folds))
    n_slabs = max(1, -(-total_folds // SLAB))
    padded = n_slabs * SLAB
    if padded != total_folds:
        pad_rows = ((0, padded - total_folds), (0, 0), (0, 0))
        cond = jnp.pad(cond, pad_rows)
        aux = jnp.pad(aux, pad_rows)

    slab_outs = []
    for s in range(n_slabs):
        key, sk = jax.random.split(key)
        c = jax.lax.dynamic_slice_in_dim(cond, s * SLAB, SLAB, 0)
        a = jax.lax.dynamic_slice_in_dim(aux, s * SLAB, SLAB, 0)
        if backend == "pallas":
            from autovc_tpu.ops import wavernn_pallas
            out = wavernn_pallas.generate_rows_pallas(params, c, a, sk, cfg,
                                                      fast_math,
                                                      interpret=interpret)
        else:
            out = _generate_scan(params, c, a, sk, cfg, fast_math, unroll)
        slab_outs.append(out)
    samples = jnp.concatenate(slab_outs, axis=0)[:total_folds]

    return _finish_many(samples, tuple(counts), tuple(wave_lens),
                        overlap, cfg.hop_length)


def generate_many(params: Params, mels, cfg: WaveRNNConfig = WaveRNNConfig(),
                  key=None, target: int | None = None,
                  overlap: int | None = None, fast_math: bool = True,
                  unroll: int = 4, backend: str = "auto",
                  block: bool = True, slab_rows: int | None = None,
                  interpret: bool = False):
    """Vocode SEVERAL utterances in one pass (production batch serving).

    Single-utterance generation underfills the MXU: ~14 folds of a 7 s clip
    give a 14-row operand against a 128-row systolic array, so per-step cost
    is dominated by pipeline latency.  Here every utterance's folds join one
    batch (all folds share seq_len = target + 2*overlap), the sampling loop
    runs once over the union, and each utterance is crossfade-unfolded from
    its own rows — near-linear throughput gain until the fold count reaches
    MXU width.  The whole pass is ONE compiled program and ONE stacked
    int16 readback (eager dispatches and per-utterance readbacks each pay a
    host round-trip on tunneled devices).

    Args:
      mels: list of (feat, F) or (1, feat, F) conditioning mels.
      block: when False, returns a zero-arg collector instead of the
        waveforms; the device->host copy is started asynchronously so the
        caller can dispatch the NEXT batch before collecting this one
        (double-buffered serving hides the readback behind compute).
      slab_rows: sampling-batch rows per kernel pass (default 64 — the r4
        sweep's best measured row count on v5e); expose for on-chip tuning.
    Returns: list of float32 waveforms (length (F_i - 1) * hop each), or a
      collector returning that list when ``block=False``.
    """
    g = cfg.generate
    overlap = g.overlap if overlap is None else overlap
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(0, 2 ** 31 - 1))

    mels = tuple(jnp.asarray(m, jnp.float32)[None]
                 if np.ndim(m) == 2 else jnp.asarray(m, jnp.float32)
                 for m in mels)
    wave_lens = [(m.shape[-1] - 1) * cfg.hop_length for m in mels]
    if target == "auto" or (target is None and g.auto_target):
        # pooled: all utterances' folds join one sampling batch, so pick
        # the fold length that lands the UNION near the throughput knee
        target = auto_fold_target(sum(wave_lens), overlap,
                                  cap=_MAX_SLAB_ROWS)
    elif target is None:
        target = g.target
    backend = resolve_backend(backend, cfg, target, overlap, True, interpret)
    flat = _generate_many_program(
        params, mels, key, cfg, target, overlap, fast_math, unroll, backend,
        slab_rows, interpret)

    def collect():
        host = np.asarray(flat).astype(np.float32) / 32767.0
        offsets = np.cumsum([0] + wave_lens)
        return [host[a:b] for a, b in zip(offsets[:-1], offsets[1:])]

    if not block:
        # Pipelined serving: start the device->host copy NOW (it overlaps
        # the NEXT batch's compute — the link, not the chip, is the serving
        # bottleneck on tunneled/PCIe hosts) and hand back a collector.
        try:
            flat.copy_to_host_async()
        except AttributeError:
            pass
        return collect
    return collect()
