"""AutoVC generator: content encoder + bottleneck + decoder + postnet.

Functional JAX re-design of the reference model
(``autovc/auto_encoder/{model,encoder,decoder,postnet,net_layers}.py``):
parameters are a pytree, the forward is a pure function (BatchNorm state is
threaded explicitly), recurrences are fused-gate ``lax.scan``s and all shapes
are static under jit.

Architecture contract (verified against the reference):
  * Encoder (encoder.py:22-97): concat(mel, speaker-emb broadcast) (B,336,T)
    -> 3 x [ConvNorm k5 'relu' -> BN -> ReLU] at 512 ch -> 2-layer BLSTM with
    hidden ``dim_neck`` per direction -> downsample: forward codes at
    t = freq-1, 2*freq-1, ... and backward codes at t = 0, freq, ...
    (the paper-consistent variant, encoder.py:94-95).
  * Upsampling (model.py:103-124): each code repeats ``freq`` frames; the
    last forward code additionally covers the tail; backward upsample is
    truncated to T.
  * Decoder (decoder.py:25-78): LSTM(2*neck+emb -> 512) -> 3 x
    [ConvNorm k5 'relu' -> BN -> ReLU] -> 2-layer LSTM(-> 1024) ->
    Linear(1024 -> 80).
  * Postnet (postnet.py:16-63): 5 x [ConvNorm k5 -> BN], tanh on the first
    four; output added residually to the decoder mel (model.py:131-132).

Tensor layout is channel-first (B, n_mels, T) end to end, matching the
reference's actual dataflow (its docstring says otherwise; the code is
channel-first).
"""
from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from autovc_tpu.config import AutoEncoderConfig
from autovc_tpu.ops import conv as C
from autovc_tpu.ops import precision as PREC
from autovc_tpu.ops import rnn as R

Params = Dict[str, Any]


def init(key, cfg: AutoEncoderConfig = AutoEncoderConfig()) -> Params:
    keys = jax.random.split(key, 16)
    n_mels = cfg.n_mels
    enc_convs = [
        C.init_conv_bn(keys[0], n_mels + cfg.dim_emb, 512, 5, "relu"),
        C.init_conv_bn(keys[1], 512, 512, 5, "relu"),
        C.init_conv_bn(keys[2], 512, 512, 5, "relu"),
    ]
    enc_blstm = R.init_bilstm_stack(keys[3], 512, cfg.dim_neck, 2)

    dec_in = 2 * cfg.dim_neck + cfg.dim_emb
    dec_lstm1 = R.init_lstm_stack(keys[4], dec_in, cfg.dim_pre, 1)
    dec_convs = [
        C.init_conv_bn(keys[5], cfg.dim_pre, cfg.dim_pre, 5, "relu"),
        C.init_conv_bn(keys[6], cfg.dim_pre, cfg.dim_pre, 5, "relu"),
        C.init_conv_bn(keys[7], cfg.dim_pre, cfg.dim_pre, 5, "relu"),
    ]
    dec_lstm2 = R.init_lstm_stack(keys[8], cfg.dim_pre, 1024, 2)
    dec_proj = C.init_linear(keys[9], 1024, n_mels)

    post_convs = [
        C.init_conv_bn(keys[10], n_mels, 512, 5, "tanh"),
        C.init_conv_bn(keys[11], 512, 512, 5, "tanh"),
        C.init_conv_bn(keys[12], 512, 512, 5, "tanh"),
        C.init_conv_bn(keys[13], 512, 512, 5, "tanh"),
        C.init_conv_bn(keys[14], 512, n_mels, 5, "linear"),
    ]
    return {
        "encoder": {"convs": enc_convs, "blstm": enc_blstm},
        "decoder": {"lstm1": dec_lstm1, "convs": dec_convs,
                    "lstm2": dec_lstm2, "proj": dec_proj},
        "postnet": {"convs": post_convs},
    }


class EncoderOut(NamedTuple):

    codes_fwd: jnp.ndarray   # (B, n_fwd, dim_neck)
    codes_bwd: jnp.ndarray   # (B, n_bwd, dim_neck)


# Single-stream inference latency: below this row count the fused Pallas
# recurrence kernels (ops/lstm_pallas.py, weights VMEM-resident, time loop
# in-kernel) replace the XLA scans — the scans pay per-round dispatch
# latency that dominated the generator at 1-4 MXU rows (r4 ablation:
# decoder LSTM2 alone was ~70-90% of forward latency).  8 = the kernel's
# padded sublane row count; larger batches fill the MXU in the scan.
_LATENCY_KERNEL_MAX_ROWS = 8


def _fast_recurrence(train: bool, axis_name, B: int) -> bool:
    return (not train and axis_name is None
            and B <= _LATENCY_KERNEL_MAX_ROWS
            and jax.default_backend() == "tpu")


def _stream_ok(H: int) -> bool:
    """Gate for the streamed slab LSTM kernel: TPU, bf16 compute policy
    (f32-exact mode keeps the scan — the kernel's resident weights would
    double to 48 MB and exactness is the point of that mode), MXU-aligned
    hidden size."""
    return (jax.default_backend() == "tpu" and H % 128 == 0
            and PREC.mode() == "bf16")


def encoder(params: Params, x: jnp.ndarray, c_org: jnp.ndarray,
            freq: int, dim_neck: int, train: bool = False,
            axis_name: str | None = None):
    """(B, n_mels, T), (B, emb) -> downsampled codes.  Returns
    (EncoderOut, new_encoder_params)."""
    T = x.shape[-1]
    h = jnp.concatenate(
        [x, jnp.broadcast_to(c_org[:, :, None],
                             (*c_org.shape, T))], axis=1)
    new_convs = []
    for p in params["convs"]:
        h, p2 = C.conv_bn(p, h, 5, train=train, activation=jax.nn.relu,
                          axis_name=axis_name)
        new_convs.append(p2)
    h = jnp.swapaxes(h, 1, 2)                       # (B, T, 512)
    # The dim_neck=32 BLSTM stays on the unrolled XLA scan at every batch
    # size: its weights are KB-scale, so the scan is loop-overhead-bound
    # and unroll=8 amortises that better than a per-round kernel does
    # (measured r4: the kernel only wins streaming-bound stacks; see
    # decoder LSTM2).
    out = R.bilstm_stack(params["blstm"], h)        # (B, T, 2*neck)
    out_f, out_b = out[..., :dim_neck], out[..., dim_neck:]
    codes_fwd = out_f[:, freq - 1::freq, :]
    codes_bwd = out_b[:, ::freq, :]
    return (EncoderOut(codes_fwd, codes_bwd),
            dict(params, convs=new_convs))


def upsample_codes(codes_fwd: jnp.ndarray, codes_bwd: jnp.ndarray,
                   freq: int, T: int) -> jnp.ndarray:
    """Paper-consistent upsampling (model.py:103-124): repeat each code over
    ``freq`` frames, extend the last forward code over the tail, truncate the
    backward expansion to T.  Returns (B, T, 2*dim_neck)."""
    up_f = jnp.repeat(codes_fwd, freq, axis=1)
    tail = T - up_f.shape[1]
    if tail > 0:
        up_f = jnp.concatenate(
            [up_f, jnp.repeat(codes_fwd[:, -1:, :], tail, axis=1)], axis=1)
    up_b = jnp.repeat(codes_bwd, freq, axis=1)[:, :T, :]
    return jnp.concatenate([up_f, up_b], axis=-1)


def decoder(params: Params, x: jnp.ndarray, train: bool = False,
            axis_name: str | None = None,
            fast_kernels: bool | None = None):
    """(B, T, 2*neck+emb) -> (B, T, n_mels).  Returns (mel, new_params)."""
    fast = (_fast_recurrence(train, axis_name, x.shape[0])
            if fast_kernels is None else fast_kernels)
    if (train and fast_kernels is None and axis_name is None
            and _stream_ok(params["lstm1"][0]["w_hh"].shape[0])):
        # training: the L=1 train kernel's backward beats the scan's
        # custom VJP (0.91 vs 1.30 ms grad at 16x400, r5 measurement)
        from autovc_tpu.ops import lstm_train_pallas as LT
        h, _ = LT.lstm_stack_train(params["lstm1"], x)
    else:
        # inference lstm1 (512): ~2 MB bf16 resident weights — not
        # streaming-bound, the unrolled scan wins (r4 measurement)
        h, _, _ = R.lstm_stack(params["lstm1"], x)
    h = jnp.swapaxes(h, 1, 2)
    new_convs = []
    for p in params["convs"]:
        h, p2 = C.conv_bn(p, h, 5, train=train, activation=jax.nn.relu,
                          axis_name=axis_name)
        new_convs.append(p2)
    h = jnp.swapaxes(h, 1, 2)
    if fast:
        from autovc_tpu.ops import lstm_pallas as LP
        h = LP.lstm_stack_pallas(params["lstm2"], h)
    elif (not train and fast_kernels is None and axis_name is None
          and _stream_ok(params["lstm2"][0]["w_hh"].shape[0])):
        # serving slabs (B > 8): the streamed Pallas kernel keeps the
        # 2x1024 stack's 24 MB (bf16) weights VMEM-resident and chains
        # both layers per round — the skewed XLA scan it replaces ran
        # 18.5 us/round vs an 8.2 us compute floor and was 56% of the
        # whole slab forward (r5 attribution, exp_slab_stages.py)
        from autovc_tpu.ops import lstm_pallas as LP
        h = LP.lstm_stack_stream(params["lstm2"], h)
    elif not train:
        # non-kernel geometries / f32-exact mode: the layer-skewed batched
        # scan halves the sequential rounds of the 2x1024 stack (measured
        # 8.65 -> 7.20 ms at 64 rows, v5e); training keeps per-layer scans
        # whose custom VJP the skewed form doesn't have
        h, _, _ = R.lstm_stack_skewed(params["lstm2"], h)
    elif (fast_kernels is None and axis_name is None
          and _stream_ok(params["lstm2"][0]["w_hh"].shape[0])):
        # training path, single-device TPU: the fused Pallas stack TRAIN
        # kernel (custom-VJP fwd+bwd, weights VMEM-resident) replaces the
        # per-layer scans for the 2x1024 stack
        from autovc_tpu.ops import lstm_train_pallas as LT
        h, _ = LT.lstm_stack_train(params["lstm2"], h)
    else:
        h, _, _ = R.lstm_stack(params["lstm2"], h)
    mel = C.linear(params["proj"], h)
    return mel, dict(params, convs=new_convs)


def postnet(params: Params, x: jnp.ndarray, train: bool = False,
            axis_name: str | None = None):
    """(B, n_mels, T) -> residual (B, n_mels, T).  tanh on all but the last
    conv (postnet.py:50-62)."""
    h = x
    new_convs = []
    n = len(params["convs"])
    for i, p in enumerate(params["convs"]):
        act = jnp.tanh if i < n - 1 else None
        h, p2 = C.conv_bn(p, h, 5, train=train, activation=act,
                          axis_name=axis_name)
        new_convs.append(p2)
    return h, dict(params, convs=new_convs)


def _flatten_codes(enc: EncoderOut) -> jnp.ndarray:
    """Content-code layout of the reference loss (model.py:99,143):
    cat(codes_fwd over time) ++ cat(codes_bwd over time) on features."""
    B = enc.codes_fwd.shape[0]
    return jnp.concatenate(
        [enc.codes_fwd.reshape(B, -1), enc.codes_bwd.reshape(B, -1)], axis=-1)


def content_codes(params: Params, x: jnp.ndarray, c_org: jnp.ndarray,
                  cfg: AutoEncoderConfig, train: bool = False,
                  axis_name: str | None = None):
    """Encoder-only pass (the reference's ``forward(..., c_trg=None)``,
    model.py:98-101).  Returns (codes, new_params)."""
    enc, enc_new = encoder(params["encoder"], x, c_org, cfg.freq,
                           cfg.dim_neck, train=train, axis_name=axis_name)
    return _flatten_codes(enc), dict(params, encoder=enc_new)


def forward(params: Params, x: jnp.ndarray, c_org: jnp.ndarray,
            c_trg: jnp.ndarray, cfg: AutoEncoderConfig,
            train: bool = False, axis_name: str | None = None,
            fast_kernels: bool | None = None):
    """Full generator pass.

    Args:
      x: (B, n_mels, T) mel batch; c_org/c_trg: (B, dim_emb) embeddings.
      fast_kernels: force the Pallas latency recurrences on/off
        (None = auto: on for small-batch TPU inference; GSPMD-sharded
        callers must pass False).
    Returns:
      (mel_decoder, mel_postnet, content_codes, new_params) with mels in
      (B, n_mels, T) — mirroring model.py:68-146.
    """
    T = x.shape[-1]
    enc, enc_new = encoder(params["encoder"], x, c_org, cfg.freq,
                           cfg.dim_neck, train=train, axis_name=axis_name)
    codes = _flatten_codes(enc)

    up = upsample_codes(enc.codes_fwd, enc.codes_bwd, cfg.freq, T)
    dec_in = jnp.concatenate(
        [up, jnp.broadcast_to(c_trg[:, None, :], (x.shape[0], T,
                                                  c_trg.shape[-1]))], axis=-1)
    mel_dec, dec_new = decoder(params["decoder"], dec_in, train=train,
                               axis_name=axis_name,
                               fast_kernels=fast_kernels)
    mel_dec = jnp.swapaxes(mel_dec, 1, 2)           # (B, n_mels, T)
    residual, post_new = postnet(params["postnet"], mel_dec, train=train,
                                 axis_name=axis_name)
    mel_post = mel_dec + residual
    new_params = {"encoder": enc_new, "decoder": dec_new,
                  "postnet": post_new}
    return mel_dec, mel_post, codes, new_params


def loss(params: Params, x: jnp.ndarray, c_org: jnp.ndarray,
         cfg: AutoEncoderConfig, mu: float = 1.0, lambd: float = 1.0,
         train: bool = True, axis_name: str | None = None):
    """Three-term AutoVC reconstruction loss (model.py:184-215):
    MSE(postnet, x) + mu * MSE(decoder, x) + lambd * L1(codes(recon), codes).

    The content codes of the reconstruction re-run the encoder on the postnet
    output, exactly as the reference does (model.py:201).  Returns
    (loss, (aux dict, new_params)).
    """
    mel_dec, mel_post, codes, p1 = forward(params, x, c_org, c_org, cfg,
                                           train=train, axis_name=axis_name)
    recon_codes, p2 = content_codes(p1, mel_post, c_org, cfg, train=train,
                                    axis_name=axis_name)
    l_post = jnp.mean((mel_post - x) ** 2)
    l_dec = jnp.mean((mel_dec - x) ** 2)
    l_content = jnp.mean(jnp.abs(recon_codes - codes))
    total = l_post + mu * l_dec + lambd * l_content
    aux = {"loss": total, "loss_recon": l_post, "loss_recon0": l_dec,
           "loss_content": l_content}
    return total, (aux, p2)


def batch_forward(params: Params, chunks: jnp.ndarray, c_org: jnp.ndarray,
                  c_trg: jnp.ndarray, cfg: AutoEncoderConfig,
                  overlap: float = 0.5,
                  precision: str = "f32",
                  fast_kernels: bool | None = None) -> jnp.ndarray:
    """Convert overlapping mel chunks as one batch and merge by mean
    overlap-add (the reference's NaN-pad + nanmean, model.py:395-437,
    expressed as a sum/count overlap-add — identical result, no NaNs).

    ``precision``: "f32" (exact, Precision.HIGHEST), "bf16" (MXU-native
    operands, ~4x faster on v5e, mel MSE ~1e-6 vs f32 — gated in bench),
    or "auto" (bf16 on TPU, f32 elsewhere).

    Args:
      chunks: (M, n_mels, N) mel slices with hop N*(1-overlap).
      c_org/c_trg: (1, dim_emb).
    Returns: (n_mels, T_total) merged converted mel.
    """
    M, n_mels, N = chunks.shape
    c_org = jnp.broadcast_to(c_org, (M, c_org.shape[-1]))
    c_trg = jnp.broadcast_to(c_trg, (M, c_trg.shape[-1]))
    with PREC.compute(PREC.resolve(precision)):
        _, mel_post, _, _ = forward(params, chunks, c_org, c_trg, cfg,
                                    train=False, fast_kernels=fast_kernels)
    step = int(N * (1 - overlap))
    total = N + (M - 1) * step
    acc = jnp.zeros((n_mels, total), mel_post.dtype)
    cnt = jnp.zeros((1, total), mel_post.dtype)
    ones = jnp.ones((1, N), mel_post.dtype)
    for i in range(M):   # M is static at trace time (one compile per M)
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, i * step), (n_mels, N))
            + mel_post[i], (0, i * step))
        cnt = jax.lax.dynamic_update_slice(
            cnt, jax.lax.dynamic_slice(cnt, (0, i * step), (1, N)) + ones,
            (0, i * step))
    return acc / cnt


# Jitted inference entry points (static cfg/overlap -> one compile per chunk
# count; outputs only, so no state pytree round-trips on the hot path).
batch_forward_jit = jax.jit(batch_forward,
                            static_argnames=("cfg", "overlap",
                                             "precision", "fast_kernels"))


@functools.partial(jax.jit,
                   static_argnames=("counts", "cfg", "overlap",
                                    "precision"))
def batch_forward_many(params: Params, chunks: jnp.ndarray,
                       c_orgs: jnp.ndarray, c_trg: jnp.ndarray,
                       counts: tuple, cfg: AutoEncoderConfig,
                       overlap: float = 0.5,
                       precision: str = "f32"):
    """Convert SEVERAL utterances' chunks in ONE forward pass.

    Per-utterance calls leave the MXU idle: one 7 s utterance is ~17 chunk
    rows against the 128-row systolic array, so the decoder LSTM's per-step
    gate matmuls run at <15% row occupancy.  Here every utterance's chunks
    join one batch (rows = sum(counts), zero-padded to a multiple of 8) and
    the overlap-add merge then slices each utterance's rows back out.

    Args:
      chunks: (sum(counts) padded to 8, n_mels, N) — all utterances' mel
        slices stacked; rows beyond ``sum(counts)`` are padding.
      c_orgs: (rows, dim_emb) source embedding per row.
      c_trg:  (1, dim_emb) shared target embedding.
      counts: static tuple of chunk counts per utterance.
    Returns: list of (n_mels, T_i) merged converted mels.
    """
    rows, n_mels, N = chunks.shape
    c_trg_b = jnp.broadcast_to(c_trg, (rows, c_trg.shape[-1]))
    with PREC.compute(PREC.resolve(precision)):
        _, mel_post, _, _ = forward(params, chunks, c_orgs, c_trg_b, cfg,
                                    train=False)
    step = int(N * (1 - overlap))
    outs, row = [], 0
    for M in counts:
        total = N + (M - 1) * step
        acc = jnp.zeros((n_mels, total), mel_post.dtype)
        cnt = jnp.zeros((1, total), mel_post.dtype)
        ones = jnp.ones((1, N), mel_post.dtype)
        for i in range(M):
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (0, i * step), (n_mels, N))
                + mel_post[row + i], (0, i * step))
            cnt = jax.lax.dynamic_update_slice(
                cnt, jax.lax.dynamic_slice(cnt, (0, i * step), (1, N))
                + ones, (0, i * step))
        outs.append(acc / cnt)
        row += M
    return outs


# ---------------------------------------------------------------------------
# Shape-stable batch serving: fixed-row slabs + dynamic-offset packed merge
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def convert_slab(params: Params, chunks: jnp.ndarray, c_orgs: jnp.ndarray,
                 c_trgs: jnp.ndarray, cfg: AutoEncoderConfig,
                 precision: str = "f32") -> jnp.ndarray:
    """One fixed-shape slab of chunk rows through the generator:
    (S, n_mels, N) -> (S, n_mels, N) postnet mels.

    The slab is the unit of compilation for batch serving: any workload is
    cut into S-row passes of ONE compiled program (the r2 design compiled a
    fresh ``batch_forward_many`` per chunk-count distribution — 82 s of
    cold serve compile for a program this size)."""
    with PREC.compute(PREC.resolve(precision)):
        _, mel_post, _, _ = forward(params, chunks, c_orgs, c_trgs, cfg,
                                    train=False)
    return mel_post


@functools.partial(jax.jit, static_argnames=("out_frames",))
def merge_rows(mel_rows: jnp.ndarray, offsets: jnp.ndarray,
               out_frames: int) -> jnp.ndarray:
    """Mean overlap-add of converted chunk rows at DYNAMIC frame offsets
    into one packed (n_mels, out_frames) timeline.

    The offsets are data, not shape: one compiled program serves every
    utterance-count / chunk-count distribution (the merge is the same
    nanmean-equivalent sum/count overlap-add as :func:`batch_forward`,
    reference auto_encoder/model.py:431-437).  Padding rows point at the
    trash window [out_frames, out_frames + N) and never reach the output.
    """
    R, n_mels, N = mel_rows.shape
    acc = jnp.zeros((n_mels, out_frames + N), mel_rows.dtype)
    cnt = jnp.zeros((1, out_frames + N), mel_rows.dtype)
    ones = jnp.ones((1, N), mel_rows.dtype)

    def body(carry, row):
        acc, cnt = carry
        mel, off = row
        acc = jax.lax.dynamic_update_slice(
            acc, jax.lax.dynamic_slice(acc, (0, off), (n_mels, N)) + mel,
            (0, off))
        cnt = jax.lax.dynamic_update_slice(
            cnt, jax.lax.dynamic_slice(cnt, (0, off), (1, N)) + ones,
            (0, off))
        return (acc, cnt), 0

    (acc, cnt), _ = jax.lax.scan(body, (acc, cnt), (mel_rows, offsets))
    merged = jnp.where(cnt > 0, acc / jnp.maximum(cnt, 1), 0.0)
    return merged[:, :out_frames]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Slab-size ladder: the smallest ladder entry >= the workload's rows runs it
# in ONE pass (the scan cost is sequential-step dominated, so bigger slabs
# keep getting cheaper per row: 283/235/197 us/row at 32/64/256 rows, v5e);
# larger workloads tile with the biggest slab.  Bounded set -> bounded
# compile-cache variants.  The small entries matter for latency: a 16-row
# workload through a 32-row slab pays ~1.5x the AE time (8.3 vs 5.4 ms
# measured on the 8-utterance sample set).
_SLAB_LADDER = (8, 16, 32, 64, 128, 256)

# Measured convert_slab wall time (ms) per slab size — TPU v5e, bf16,
# T=400 chunks, r5 sweep (streamed LSTM2 kernel active for B>8).  Per-row
# cost keeps falling to 128 rows (156 us/row — full MXU row occupancy of
# the decoder stack's 128-row systolic passes; 64 rows runs the same
# passes half-empty at 196 us/row) and is flat from 128 to 256.
_SLAB_MS = {8: 4.55, 16: 4.90, 32: 7.07, 64: 12.57, 128: 19.94, 256: 40.05}


def _pick_slab(rows: int) -> int:
    """UNIFORM slab size minimising the measured total wall cost
    ceil(rows/s) * cost(s); ties break to the larger slab (fewer
    dispatches).  (The r4 picker took the smallest ladder entry >= rows —
    a 136-row serve then ran one half-empty 256-row pass, ~13%% slower
    than the model's pick.)  The packed serving path uses the MIXED plan
    (:func:`_slab_plan`) instead, which beats any uniform size on
    off-ladder row counts."""
    return min(_SLAB_LADDER,
               key=lambda s: (-(-rows // s) * _SLAB_MS[s], -s))


@functools.lru_cache(maxsize=512)
def _slab_plan(rows: int) -> tuple:
    """Measured-cost-minimal MULTISET of slab sizes covering >= ``rows``
    (descending): coin-change DP over the ladder with the r5 cost table.
    136 rows -> (128, 8) at 24.5 ms where the best uniform choice (5 x 32)
    costs 35.4 — every slab size still maps to one cached compile."""
    if rows <= 0:
        return (_SLAB_LADDER[0],)
    # DP over 8-row quanta for the WHOLE row count (a greedy biggest-slab
    # prefix is suboptimal: 8 x 128 beats 3 x 256 + 2 x 128 for 1000 rows
    # — the 128-slab has the best measured per-row cost)
    q = -(-rows // 8)
    INF = float("inf")
    best = [0.0] + [INF] * q
    choice = [0] * (q + 1)
    for n in range(1, q + 1):
        for s in _SLAB_LADDER:
            prev = max(0, n - s // 8)
            c = best[prev] + _SLAB_MS[s]
            if c < best[n]:
                best[n], choice[n] = c, s
    plan, n = [], q
    while n > 0:
        s = choice[n]
        plan.append(s)
        n = max(0, n - s // 8)
    return tuple(sorted(plan, reverse=True))


def batch_forward_packed(params: Params, chunk_sets, c_orgs, c_trg,
                         cfg: AutoEncoderConfig, overlap: float = 0.5,
                         precision: str = "f32", slab_rows: int | None = None,
                         gap: int = 0, frame_bucket: int = 256):
    """Convert SEVERAL utterances' chunks through fixed-shape slab programs
    and merge them into ONE packed mel timeline on device.

    Compilation cost is workload-independent: the generator compiles once
    per ``slab_rows`` and the merge once per (row-bucket, frame-bucket)
    pair.  Slab passes are dispatched asynchronously, so slab i+1's upload
    overlaps slab i's compute.

    Args:
      chunk_sets: list of (M_i, n_mels, N) mel slices (hop N*(1-overlap)).
      c_orgs: list of (dim_emb,) source embeddings, one per utterance.
      c_trg: (1, dim_emb) shared target embedding.
      gap: zero frames inserted before/after each utterance in the packed
        timeline (the vocoder's packed conditioning needs ``pad`` frames of
        silence between utterances to reproduce its per-utterance zero-pad
        semantics, wavernn/model.py:346-356).
    Returns: (packed (n_mels, Fp_bucket) device array, starts, lengths) —
      utterance u occupies packed[:, starts[u] : starts[u] + lengths[u]];
      host-side starts/lengths are plain ints (Fp real = starts[-1] +
      lengths[-1] + gap).
    """
    import numpy as np

    n_mels, N = chunk_sets[0].shape[1:]
    counts = [int(ch.shape[0]) for ch in chunk_sets]
    if slab_rows is None:
        plan = _slab_plan(sum(counts))
    else:
        if not (0 < slab_rows and slab_rows % 8 == 0):
            raise ValueError(f"slab_rows must be a positive multiple of 8, "
                             f"got {slab_rows}")
        plan = (slab_rows,) * max(1, -(-sum(counts) // slab_rows))
    step = int(N * (1 - overlap))
    lengths = [N + (m - 1) * step for m in counts]
    starts, o = [], gap
    for L in lengths:
        starts.append(o)
        o += L + 2 * gap
    Fp = starts[-1] + lengths[-1] + gap
    Fp_b = _round_up(Fp, frame_bucket)

    rows = sum(counts)
    R_b = sum(plan)
    stacked = jnp.concatenate(list(chunk_sets), axis=0)
    if R_b != rows:
        stacked = jnp.pad(stacked, ((0, R_b - rows), (0, 0), (0, 0)))
    E = np.shape(c_trg)[-1]
    offsets = np.full((R_b,), Fp_b, np.int32)          # default: trash window
    r = 0
    for u, m in enumerate(counts):
        offsets[r:r + m] = starts[u] + np.arange(m) * step
        r += m
    if isinstance(c_orgs, jnp.ndarray):
        # DEVICE embeddings (speaker_encoder.embed_utterances block=False):
        # assemble the per-row source-embedding block on device so the
        # SE -> AE chain never syncs the host
        c_rows = jnp.concatenate(
            [jnp.broadcast_to(c_orgs[u][None], (m, E))
             for u, m in enumerate(counts)])
        if R_b != rows:
            c_rows = jnp.pad(c_rows, ((0, R_b - rows), (0, 0)))
    else:
        c_np = np.zeros((R_b, E), np.float32)
        r = 0
        for u, m in enumerate(counts):
            c_np[r:r + m] = np.asarray(c_orgs[u])[None]
            r += m
        c_rows = jnp.asarray(c_np)

    c_trg_row = jnp.asarray(c_trg).reshape(1, -1)
    mel_rows, s = [], 0
    for sz in plan:               # mixed-size slabs (see _slab_plan)
        mel_rows.append(convert_slab(
            params, stacked[s:s + sz], c_rows[s:s + sz],
            jnp.broadcast_to(c_trg_row, (sz, E)), cfg, precision))
        s += sz
    mel_rows = mel_rows[0] if len(mel_rows) == 1 \
        else jnp.concatenate(mel_rows, axis=0)
    packed = merge_rows(mel_rows, jnp.asarray(offsets), Fp_b)
    return packed, starts, lengths


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def infer(params: Params, x: jnp.ndarray, c_org: jnp.ndarray,
          c_trg: jnp.ndarray, cfg: AutoEncoderConfig,
          precision: str = "f32") -> jnp.ndarray:
    """Eval-mode postnet mel only."""
    with PREC.compute(PREC.resolve(precision)):
        _, mel_post, _, _ = forward(params, x, c_org, c_trg, cfg,
                                    train=False)
    return mel_post
