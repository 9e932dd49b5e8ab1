"""Training loops: jitted steps + EMA + checkpointing + metrics.

Re-designs the reference training loops (auto_encoder/model.py:218-361,
speaker_encoder/model.py:276-408) as pure jitted step functions over pytrees:

  * one compile per batch shape (datasets emit static shapes);
  * EMA runs on the params pytree (the reference EMAs a flattened copy it
    never saves, model.py:321,379-392 — here the EMA rides in the checkpoint);
  * GE2E gradient treatment matches the reference: similarity weight/bias
    grads scaled by 0.01, global-norm clip 3 (speaker_encoder/model.py:62-68);
  * checkpoints save params + EMA + optimizer state + step, and resume is
    exact (the reference saves opt state but never restores it).

The data-parallel variants of these steps live in
:mod:`autovc_tpu.parallel.steps`.
"""
from __future__ import annotations

import functools
import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from autovc_tpu.config import (AutoEncoderConfig, SpeakerEncoderConfig,
                               WaveRNNConfig)
from autovc_tpu.train import schedules
from autovc_tpu.utils import progbar, close_progbar


def ema_update(ema, params, decay: float):
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


# ---------------------------------------------------------------------------
# AutoEncoder
# ---------------------------------------------------------------------------


def make_ae_step(cfg: AutoEncoderConfig, tx: optax.GradientTransformation,
                 ema_decay: float, axis_name: str | None = None,
                 precision: str | None = None,
                 with_grads: bool = False) -> Callable:
    """AutoVC train step.  ``precision`` ("bf16" default from
    ``cfg.learn.precision``) selects the matmul/conv compute policy: bf16
    operands with f32 accumulation halve the MXU passes while master
    weights, gradients, Adam state, EMA and BatchNorm statistics all stay
    f32 (ops/precision.py).  The reference trains pure f32
    (auto_encoder/model.py:300-318) — pass precision="f32" for that.

    aux always carries ``grad_norm`` (pre-clip global norm); with
    ``with_grads`` the raw gradient tree rides along too (device refs, no
    extra compute) so the loop can histogram it — the reference's
    ``run.watch(model)`` stream (auto_encoder/model.py:276-277)."""
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.ops import precision as PREC

    precision = precision or cfg.learn.precision

    def step(params, opt_state, ema, x, c_org):
        with PREC.compute(precision):
            (loss_val, (aux, params_bn)), grads = jax.value_and_grad(
                AE.loss, has_aux=True)(params, x, c_org, cfg,
                                       axis_name=axis_name)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        aux = dict(aux, grad_norm=optax.global_norm(grads))
        if with_grads:
            aux["grads"] = grads
        updates, opt_state = tx.update(grads, opt_state, params_bn)
        # BN running stats changed inside the forward; apply the optimizer on
        # top of the stat-updated tree (their grads are zero).
        new_params = optax.apply_updates(params_bn, updates)
        ema = ema_update(ema, new_params, ema_decay)
        return new_params, opt_state, ema, aux

    return jax.jit(step) if axis_name is None else step


def train_autoencoder(params, dataset, cfg: AutoEncoderConfig,
                      n_epochs: int | None = None,
                      batch_size: int | None = None,
                      log_freq: int | None = None,
                      save_freq: int | None = None,
                      model_name: str | None = None,
                      save_dir: str | None = None,
                      ema_decay: float | None = None,
                      logger=None, verbose: bool = True,
                      on_epoch_end: Callable | None = None,
                      start_step: int = 0, resume: bool = False,
                      opt_overrides: Dict[str, Any] | None = None,
                      precision: str | None = None, mesh=None):
    """AutoVC training (auto_encoder/model.py:218-361).  Returns
    (params, ema_params, info-dict).

    ``resume=True`` restores params + EMA + optimizer state + step from the
    newest checkpoint in ``save_dir`` — exact preemption recovery, which the
    reference only approximates (it saves optimizer state but never restores
    it, auto_encoder/model.py:149-156).

    ``mesh``: a `jax.sharding.Mesh` makes the loop data-parallel — the step
    is the GSPMD-sharded variant (`parallel.steps.make_sharded_ae_step`,
    global batch stats / global gradients; batch_size must divide by the
    'data' axis size) and every batch is sharded onto the mesh."""
    lc, oc = cfg.learn, cfg.optimizer
    if opt_overrides:
        oc = oc.with_overrides(**opt_overrides)
    n_epochs = n_epochs if n_epochs is not None else lc.n_epochs
    batch_size = batch_size if batch_size is not None else lc.batch_size
    log_freq = log_freq if log_freq is not None else lc.log_freq
    save_freq = save_freq if save_freq is not None else lc.save_freq
    ema_decay = ema_decay if ema_decay is not None else lc.ema_decay
    # None -> config default; '' -> saving disabled (the `and model_name`
    # guard below). `or` would silently resurrect the default for ''.
    model_name = lc.model_name if model_name is None else model_name
    save_dir = lc.save_dir if save_dir is None else save_dir

    steps_per_epoch = dataset.epoch_steps(batch_size)
    lr_schedule = schedules.make_schedule(oc, steps_per_epoch, dim_model=80)
    tx = schedules.make_optimizer(oc, steps_per_epoch, dim_model=80)
    opt_state = tx.init(params)
    ema = jax.tree_util.tree_map(jnp.asarray, params)

    if resume:
        from autovc_tpu.utils.checkpoint import (latest_checkpoint,
                                                 load_checkpoint)
        latest = latest_checkpoint(save_dir)
        if latest is not None:
            blob = load_checkpoint(latest)
            params = blob["params"]
            ema = blob.get("ema_params", ema)
            if "opt_state" in blob:
                from autovc_tpu.utils.checkpoint import restore_like
                opt_state = restore_like(opt_state, blob["opt_state"])
            start_step = int(blob.get("step", start_step) or 0)
            if verbose:
                print(f"Resumed from '{latest}' at step {start_step}")

    if mesh is not None:
        from autovc_tpu.parallel import sharding as shd
        from autovc_tpu.parallel import steps as psteps
        assert batch_size % mesh.shape["data"] == 0, \
            f"batch_size {batch_size} must divide mesh 'data' axis " \
            f"{mesh.shape['data']}"
        step_fn0 = psteps.make_sharded_ae_step(
            cfg, tx, ema_decay, mesh, params, precision=precision)
        params = shd.shard_params(params, mesh)
        ema = shd.shard_params(jax.tree_util.tree_map(np.asarray, ema),
                               mesh)
        opt_state = jax.device_put(
            opt_state, shd.tree_shardings_like(opt_state,
                                               shd.replicated(mesh)))

        def step_fn(p, o, e, x, c):
            return step_fn0(p, o, e, psteps.shard_batch(x, mesh),
                            psteps.shard_batch(c, mesh))
    else:
        # materialise the grad tree in aux only when some logger will
        # histogram it (the scalar grad_norm series is always present)
        want_grads = (logger is not None
                      and hasattr(logger, "log_tree_histograms"))
        step_fn = make_ae_step(cfg, tx, ema_decay, precision=precision,
                               with_grads=want_grads)

    n_total = n_epochs * steps_per_epoch
    step = start_step
    loss_hist, t_start = [], time.time()
    x = c = None   # last batch, kept for the reconstruction figure
    for epoch in range(1, n_epochs + 1):
        for x, c in dataset.batches(batch_size, shuffle=True, seed=epoch):
            params, opt_state, ema, aux = step_fn(params, opt_state, ema,
                                                  x, c)
            step += 1
            # keep the loss as a DEVICE scalar: a float() here is a host
            # sync EVERY step, serialising batch upload with device
            # compute (and paying a round-trip per step on tunneled
            # devices); the pull happens once per log_freq steps below
            loss_hist.append(aux["loss"])
            if len(loss_hist) > max(log_freq, 1):
                loss_hist.pop(0)        # bounded when no logger consumes
            if verbose:
                progbar(step - start_step, n_total, {
                    "sec/step": round((time.time() - t_start)
                                      / (step - start_step), 2)})
            if logger is not None and (step % log_freq == 0
                                       or step - start_step == n_total):
                mean_loss = float(np.mean([float(l) for l in loss_hist]))
                logger.log({"loss": mean_loss,
                            "loss_recon": float(aux["loss_recon"]),
                            "loss_content": float(aux["loss_content"]),
                            "grad_norm": float(aux["grad_norm"]),
                            "learning_rate": float(lr_schedule(step)),
                            "epoch": epoch, "step": step}, step=step)
                loss_hist = []
        if (epoch % save_freq == 0 or epoch == n_epochs) and model_name:
            from autovc_tpu.utils.checkpoint import save_checkpoint
            # async: the write happens off-thread, the loop keeps stepping
            save_checkpoint(f"{save_dir.rstrip('/')}/{model_name}",
                            {"step": step, "params": params,
                             "ema_params": ema, "opt_state": opt_state},
                            block=False)
        if logger is not None and x is not None and (
                epoch % save_freq == 0 or epoch == n_epochs):
            # parameter + gradient histograms, the reference's run.watch()
            # stream (auto_encoder/model.py:276-277); optional so duck-typed
            # loggers that only implement .log() still work
            hist = getattr(logger, "log_tree_histograms", None)
            if hist is not None:
                hist("params", params, step=step)
                hist("grads", aux.get("grads", {}), step=step)
            # original-vs-reconstruction mel figure, as the reference logs
            # each save epoch (auto_encoder/model.py:371-374,439-450)
            try:
                from autovc_tpu.models import autoencoder as AE
                from autovc_tpu.utils import visual
                _, post, _, _ = AE.forward(params, x[:1], c[:1], c[:1],
                                           cfg, train=False)
                fig = visual.plot_conversion(np.asarray(x[0]),
                                             np.asarray(post)[0])
                logger.log_figure("mel_reconstruction", fig, step=step)
            except Exception as e:   # matplotlib is an optional extra
                if verbose:
                    print(f"[metrics] figure skipped: {e}")
        if on_epoch_end is not None:
            on_epoch_end(epoch, params)
    from autovc_tpu.utils.checkpoint import wait_for_saves
    wait_for_saves()
    if verbose:
        close_progbar()
    return params, ema, {"step": step, "opt_state": opt_state}


# ---------------------------------------------------------------------------
# Speaker encoder (GE2E)
# ---------------------------------------------------------------------------


def make_se_step(cfg: SpeakerEncoderConfig,
                 tx: optax.GradientTransformation,
                 axis_name: str | None = None,
                 precision: str | None = None) -> Callable:
    from autovc_tpu.models import speaker_encoder as SE
    from autovc_tpu.ops import precision as PREC

    precision = precision or cfg.learn.precision

    def step(params, opt_state, batch):
        with PREC.compute(precision):
            loss_val, grads = jax.value_and_grad(SE.batch_ge2e_loss)(
                params, batch)
        # similarity weight/bias gradient scaling (model.py:62-65).
        grads = dict(grads,
                     similarity_weight=grads["similarity_weight"] * 0.01,
                     similarity_bias=grads["similarity_bias"] * 0.01)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss_val = jax.lax.pmean(loss_val, axis_name)
        aux = {"loss": loss_val, "grad_norm": optax.global_norm(grads)}
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, aux

    return jax.jit(step) if axis_name is None else step


def train_speaker_encoder(params, dataset, cfg: SpeakerEncoderConfig,
                          n_epochs: int | None = None,
                          utterances_per_speaker: int = 8,
                          steps_per_epoch: int = 8,
                          log_freq: int | None = None,
                          save_freq: int | None = None,
                          model_name: str | None = None,
                          save_dir: str | None = None,
                          logger=None, verbose: bool = True,
                          speakers: Dict[str, np.ndarray] | None = None,
                          start_step: int = 0, resume: bool = False,
                          opt_overrides: Dict[str, Any] | None = None,
                          mesh=None):
    """GE2E training (speaker_encoder/model.py:276-408).

    ``resume=True`` restores params + optimizer state + step + the speaker
    registry from the newest checkpoint in ``save_dir`` — the same exact
    preemption recovery as :func:`train_autoencoder`.

    ``mesh``: data-parallel loop over the speaker axis of the (S, U, T, M)
    block (`parallel.steps.make_sharded_se_step`)."""
    lc, oc = cfg.learn, cfg.optimizer
    if opt_overrides:
        oc = oc.with_overrides(**opt_overrides)
    n_epochs = n_epochs if n_epochs is not None else lc.n_epochs
    log_freq = log_freq if log_freq is not None else lc.log_freq
    save_freq = save_freq if save_freq is not None else lc.save_freq
    model_name = lc.model_name if model_name is None else model_name
    save_dir = lc.save_dir if save_dir is None else save_dir

    tx = schedules.make_optimizer(oc, steps_per_epoch,
                                  dim_model=cfg.embedding_size)
    opt_state = tx.init(params)

    if resume:
        from autovc_tpu.utils.checkpoint import (latest_checkpoint,
                                                 load_checkpoint)
        latest = latest_checkpoint(save_dir)
        if latest is not None:
            blob = load_checkpoint(latest)
            params = blob["params"]
            if "opt_state" in blob:
                from autovc_tpu.utils.checkpoint import restore_like
                opt_state = restore_like(opt_state, blob["opt_state"])
            start_step = int(blob.get("step", start_step) or 0)
            if speakers is not None:
                speakers.update(blob.get("speakers", {}))
            if verbose:
                print(f"Resumed from '{latest}' at step {start_step}")

    if mesh is not None:
        from autovc_tpu.parallel import sharding as shd
        from autovc_tpu.parallel import steps as psteps
        step_fn0 = psteps.make_sharded_se_step(cfg, tx, mesh, params)
        params = shd.shard_params(params, mesh)
        opt_state = jax.device_put(
            opt_state, shd.tree_shardings_like(opt_state,
                                               shd.replicated(mesh)))

        def step_fn(p, o, block):
            return step_fn0(p, o, psteps.shard_batch(block, mesh))
    else:
        step_fn = make_se_step(cfg, tx)

    n_total = n_epochs * steps_per_epoch
    step = start_step
    t_start = time.time()
    for epoch in range(1, n_epochs + 1):
        for batch in dataset.batches(utterances_per_speaker,
                                     n_batches=steps_per_epoch, seed=epoch):
            params, opt_state, aux = step_fn(params, opt_state, batch)
            step += 1
            # loss stays a device scalar between log points (a float()
            # per step is a host sync that serialises the dispatch chain)
            if verbose and step % max(log_freq, 1) == 0:
                progbar(step - start_step, n_total,
                        {"loss": round(float(aux["loss"]), 4)})
            elif verbose:
                progbar(step - start_step, n_total, {})
            if logger is not None and step % log_freq == 0:
                logger.log({"loss": float(aux["loss"]),
                            "grad_norm": float(aux["grad_norm"]),
                            "epoch": epoch, "step": step}, step=step)
        if logger is not None and (epoch % save_freq == 0
                                   or epoch == n_epochs):
            # EER on the last batch's similarity matrix — the quality metric
            # the reference left commented out (model.py:254-262)
            from autovc_tpu.models import speaker_encoder as SE
            b = np.asarray(batch)
            S, U = b.shape[:2]
            emb = SE.forward(params, b.reshape(S * U, *b.shape[2:]))
            sim = SE.similarity_matrix(params, emb.reshape(S, U, -1))
            logger.log({"eer": SE.equal_error_rate(np.asarray(sim)),
                        "epoch": epoch, "step": step}, step=step)
            hist = getattr(logger, "log_tree_histograms", None)
            if hist is not None:
                hist("params", params, step=step)
        if (epoch % save_freq == 0 or epoch == n_epochs) and model_name:
            from autovc_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(f"{save_dir.rstrip('/')}/{model_name}",
                            {"step": step, "params": params,
                             "speakers": speakers or {},
                             "opt_state": opt_state}, block=False)
        if logger is not None and (epoch % save_freq == 0
                                   or epoch == n_epochs):
            # TSNE embedding scatter, as the reference logs each save epoch
            # (speaker_encoder/model.py:417-419,426-444)
            try:
                from autovc_tpu.models import speaker_encoder as SE
                from autovc_tpu.utils import visual
                b = np.asarray(batch)
                S, U = b.shape[:2]
                emb = np.asarray(SE.forward(
                    params, b.reshape(S * U, *b.shape[2:])))
                fig = visual.visualise_embedding(emb.reshape(S, U, -1))
                logger.log_figure("embedding_tsne", fig, step=step)
            except Exception as e:  # matplotlib/sklearn optional extras
                if verbose:
                    print(f"[metrics] figure skipped: {e}")
    from autovc_tpu.utils.checkpoint import wait_for_saves
    wait_for_saves()
    if verbose:
        close_progbar()
    return params, {"step": step, "opt_state": opt_state}


# ---------------------------------------------------------------------------
# Vocoder (WaveRNN) — capability the reference lacks
# ---------------------------------------------------------------------------


def make_vocoder_step(cfg: WaveRNNConfig, tx: optax.GradientTransformation,
                      axis_name: str | None = None,
                      precision: str = "bf16") -> Callable:
    from autovc_tpu.models import wavernn as WR
    from autovc_tpu.ops import precision as PREC

    def step(params, opt_state, x_in, y, mels):
        def loss_fn(p):
            l, new_p = WR.loss(p, x_in, y, mels, cfg, train=True)
            return l, new_p

        with PREC.compute(precision):
            (loss_val, params_bn), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            loss_val = jax.lax.pmean(loss_val, axis_name)
        aux = {"loss": loss_val, "grad_norm": optax.global_norm(grads)}
        updates, opt_state = tx.update(grads, opt_state, params_bn)
        return optax.apply_updates(params_bn, updates), opt_state, aux

    return jax.jit(step) if axis_name is None else step


def train_vocoder(params, dataset, cfg: WaveRNNConfig,
                  n_epochs: int = 1, batch_size: int = 8,
                  steps_per_epoch: int = 50, seq_frames: int = 9,
                  lr: float = 1e-4, log_freq: int = 10,
                  model_name: str | None = None,
                  save_dir: str | None = None, logger=None,
                  verbose: bool = True, start_step: int = 0,
                  resume: bool = False, mesh=None):
    from autovc_tpu.config import OptimizerConfig
    oc = OptimizerConfig(lr=lr, lr_scheduler="constant", grad_clip_norm=4.0)
    tx = schedules.make_optimizer(oc, steps_per_epoch)
    opt_state = tx.init(params)

    if resume:
        from autovc_tpu.utils.checkpoint import (latest_checkpoint,
                                                 load_checkpoint)
        latest = latest_checkpoint(save_dir or cfg.model_dir)
        if latest is not None:
            blob = load_checkpoint(latest)
            params = blob["params"]
            if "opt_state" in blob:
                from autovc_tpu.utils.checkpoint import restore_like
                opt_state = restore_like(opt_state, blob["opt_state"])
            start_step = int(blob.get("step", start_step) or 0)
            if verbose:
                print(f"Resumed from '{latest}' at step {start_step}")

    if mesh is not None:
        from autovc_tpu.parallel import sharding as shd
        from autovc_tpu.parallel import steps as psteps
        step_fn0 = psteps.make_sharded_vocoder_step(cfg, tx, mesh, params)
        params = shd.shard_params(params, mesh)
        opt_state = jax.device_put(
            opt_state, shd.tree_shardings_like(opt_state,
                                               shd.replicated(mesh)))

        def step_fn(p, o, x_in, y, mels):
            return step_fn0(p, o, psteps.shard_batch(x_in, mesh),
                            psteps.shard_batch(y, mesh),
                            psteps.shard_batch(mels, mesh))
    else:
        step_fn = make_vocoder_step(cfg, tx)
    step = start_step
    n_total = n_epochs * steps_per_epoch
    for epoch in range(1, n_epochs + 1):
        for x_in, y, mels in dataset.batches(batch_size, seq_frames,
                                             n_batches=steps_per_epoch,
                                             seed=epoch):
            params, opt_state, aux = step_fn(params, opt_state, x_in,
                                             y, mels)
            step += 1
            # loss stays a device scalar between log points (a float()
            # per step is a host sync that serialises the dispatch chain)
            if verbose and step % max(log_freq, 1) == 0:
                progbar(step - start_step, n_total,
                        {"loss": round(float(aux["loss"]), 4)})
            elif verbose:
                progbar(step - start_step, n_total, {})
            if logger is not None and step % log_freq == 0:
                logger.log({"loss": float(aux["loss"]),
                            "grad_norm": float(aux["grad_norm"]),
                            "epoch": epoch, "step": step}, step=step)
        if model_name:
            from autovc_tpu.utils.checkpoint import save_checkpoint
            save_checkpoint(f"{(save_dir or cfg.model_dir).rstrip('/')}/"
                            f"{model_name}",
                            {"step": step, "params": params,
                             "opt_state": opt_state}, block=False)
    from autovc_tpu.utils.checkpoint import wait_for_saves
    wait_for_saves()
    if verbose:
        close_progbar()
    return params, {"step": step, "opt_state": opt_state}
