"""pjit-sharded training and conversion steps.

Design (SURVEY.md §2c / §5): steps are the *same* global-semantics functions
as the single-device loops — under GSPMD a jitted function over sharded
arrays computes global batch statistics and global gradients automatically,
with XLA lowering the reductions to psum/all-gather over ICI.  So:

  * **DP**: the batch axis is sharded over ``data``; loss means and Adam
    updates are global; BatchNorm batch stats are cross-replica by
    construction (sync-BN without any axis_name plumbing).
  * **TP**: parameter leaves are sharded per
    :data:`autovc_tpu.parallel.sharding.TP_RULES`; matmuls against sharded
    gate/channel dims become partial matmuls + collectives.
  * **SP (long audio)**: the overlapped chunk axis of ``batch_forward`` is
    embarrassingly parallel until the overlap-add merge — sharding it over
    ``data`` makes the merge a small cross-device reduction, which is exactly
    the reference's nanmean chunk merge (auto_encoder/model.py:395-437)
    turned into a collective.

Multi-host: call :func:`initialize_distributed` first so all hosts join one
runtime; the mesh then spans every chip and per-host input pipelines feed
their local shard via ``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from autovc_tpu.config import AutoEncoderConfig, SpeakerEncoderConfig
from autovc_tpu.parallel import sharding as shd
from autovc_tpu.train import loop as base_loop


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Join the multi-host runtime (replaces the reference's LSF jobscript
    launcher, utils/hpc.py:87-202, with jax.distributed)."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)


def make_sharded_ae_step(cfg: AutoEncoderConfig,
                         tx: optax.GradientTransformation,
                         ema_decay: float, mesh: Mesh,
                         params_example,
                         precision: str | None = None) -> Callable:
    """DP(+TP)-sharded AutoVC train step.

    Returns a jitted ``step(params, opt_state, ema, x, c_org)`` whose batch
    inputs must be sharded on ``data`` and whose states follow the TP rule
    table (replicated on a data-only mesh).  ``precision`` follows
    :func:`autovc_tpu.train.loop.make_ae_step` (bf16 compute by default,
    f32 master state).
    """
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.ops import precision as PREC

    precision = precision or cfg.learn.precision
    p_shard = shd.param_shardings(params_example, mesh)
    repl = shd.replicated(mesh)
    batch = NamedSharding(mesh, P("data"))

    def step(params, opt_state, ema, x, c_org):
        with PREC.compute(precision):
            (loss_val, (aux, params_bn)), grads = jax.value_and_grad(
                AE.loss, has_aux=True)(params, x, c_org, cfg)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        updates, opt_state = tx.update(grads, opt_state, params_bn)
        new_params = optax.apply_updates(params_bn, updates)
        ema = base_loop.ema_update(ema, new_params, ema_decay)
        return new_params, opt_state, ema, aux

    opt_shard = shd.tree_shardings_like(tx.init(params_example), repl)
    aux_shard = {"loss": repl, "loss_recon": repl, "loss_recon0": repl,
                 "loss_content": repl, "grad_norm": repl}
    return jax.jit(
        step,
        in_shardings=(p_shard, opt_shard, p_shard, batch, batch),
        out_shardings=(p_shard, opt_shard, p_shard, aux_shard))


def make_sharded_se_step(cfg: SpeakerEncoderConfig,
                         tx: optax.GradientTransformation, mesh: Mesh,
                         params_example,
                         precision: str | None = None) -> Callable:
    """GE2E step sharded over the speaker axis of the (S, U, T, M) block."""
    from autovc_tpu.models import speaker_encoder as SE
    from autovc_tpu.ops import precision as PREC

    precision = precision or cfg.learn.precision
    p_shard = shd.param_shardings(params_example, mesh)
    repl = shd.replicated(mesh)
    batch = NamedSharding(mesh, P("data"))

    def step(params, opt_state, block):
        with PREC.compute(precision):
            # fast_kernels=False: the Pallas stack kernel carries no GSPMD
            # sharding rule (same invariant as the AE/vocoder fast paths)
            loss_val, grads = jax.value_and_grad(
                lambda p, b: SE.batch_ge2e_loss(p, b, fast_kernels=False))(
                params, block)
        grads = dict(grads,
                     similarity_weight=grads["similarity_weight"] * 0.01,
                     similarity_bias=grads["similarity_bias"] * 0.01)
        aux = {"loss": loss_val, "grad_norm": optax.global_norm(grads)}
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux

    opt_shard = shd.tree_shardings_like(tx.init(params_example), repl)
    return jax.jit(step,
                   in_shardings=(p_shard, opt_shard, batch),
                   out_shardings=(p_shard, opt_shard,
                                  {"loss": repl, "grad_norm": repl}))


def make_sharded_vocoder_step(cfg, tx: optax.GradientTransformation,
                              mesh: Mesh, params_example,
                              precision: str = "bf16") -> Callable:
    """DP-sharded WaveRNN train step: batch axis over 'data'; the MelResNet
    BatchNorm statistics become global-batch (sync-BN) for free under
    GSPMD, exactly as in :func:`make_sharded_ae_step`."""
    from autovc_tpu.models import wavernn as WR
    from autovc_tpu.ops import precision as PREC

    p_shard = shd.param_shardings(params_example, mesh)
    repl = shd.replicated(mesh)
    batch = NamedSharding(mesh, P("data"))

    def step(params, opt_state, x_in, y, mels):
        def loss_fn(p):
            # fast_kernels=False: the Pallas GRU-pair kernel carries no
            # GSPMD sharding rule (same invariant as the AE's fast path)
            return WR.loss(p, x_in, y, mels, cfg, train=True,
                           fast_kernels=False)

        with PREC.compute(precision):
            (loss_val, params_bn), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        aux = {"loss": loss_val, "grad_norm": optax.global_norm(grads)}
        updates, opt_state = tx.update(grads, opt_state, params_bn)
        return optax.apply_updates(params_bn, updates), opt_state, aux

    opt_shard = shd.tree_shardings_like(tx.init(params_example), repl)
    return jax.jit(step,
                   in_shardings=(p_shard, opt_shard, batch, batch, batch),
                   out_shardings=(p_shard, opt_shard,
                                  {"loss": repl, "grad_norm": repl}))


@functools.partial(jax.jit, static_argnames=("cfg", "overlap", "precision"))
def chunk_sharded_convert(params, chunks, c_org, c_trg, valid_rows, cfg,
                          overlap: float = 0.5, precision: str = "f32"):
    """Chunk-DP (sequence-parallel) conversion with padded rows — THE
    chunk-sharded conversion path (SURVEY §2c SP: the reference's long-audio
    chunking, auto_encoder/model.py:395-437, with the chunk axis as the DP
    axis and the mean overlap-add merge lowered to a cross-device reduction).

    A module-level jit that tolerates zero-padded chunk rows: the forward
    pass runs on all rows (sharded on 'data' via the arrays' committed
    shardings), the mean overlap-add merge consumes only the first
    ``valid_rows`` (pad rows point at the merge's trash window).
    ``valid_rows`` is DATA, not shape: one compiled program serves every
    chunk count that pads to the same (M_padded, ., .) shape.  This is the
    public ``VoiceConverter.convert(..., parallel="chunks")`` backend.

    Args:
      chunks: (M_padded, n_mels, N) mel slices, rows >= valid_rows are pad.
      c_org/c_trg: (1, dim_emb); valid_rows: int scalar (traced).
    Returns: (n_mels, N + (M_padded-1)*step) merged mel on the PADDED
      timeline — slice to N + (valid_rows-1)*step frames on the caller.
    """
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.ops import precision as PREC

    M, n_mels, N = chunks.shape
    c_org_b = jnp.broadcast_to(c_org, (M, c_org.shape[-1]))
    c_trg_b = jnp.broadcast_to(c_trg, (M, c_trg.shape[-1]))
    with PREC.compute(PREC.resolve(precision)):
        # fast_kernels=False: this program is GSPMD-partitioned over the
        # mesh; the Pallas latency kernels carry no sharding rule
        _, mel_post, _, _ = AE.forward(params, chunks, c_org_b, c_trg_b,
                                       cfg, train=False, fast_kernels=False)
    step = int(N * (1 - overlap))
    total = N + (M - 1) * step
    rows = jnp.arange(M, dtype=jnp.int32)
    offsets = jnp.where(rows < valid_rows, rows * step, total)
    return AE.merge_rows(mel_post, offsets, total)


def shard_batch(batch, mesh: Mesh):
    """Place a (global) host array onto the mesh, sharded on 'data'.

    On multi-host, feed process-local shards via
    ``jax.make_array_from_process_local_data`` instead.
    """
    s = NamedSharding(mesh, P("data"))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(s, batch)
    return jax.device_put(batch, s)


def pad_batch_to(batch, size: int):
    """Pad the leading axis to ``size`` (devices must divide the batch)."""
    import numpy as np
    n = batch.shape[0]
    if n == size:
        return batch, n
    pad = [(0, size - n)] + [(0, 0)] * (batch.ndim - 1)
    return np.pad(batch, pad), n
