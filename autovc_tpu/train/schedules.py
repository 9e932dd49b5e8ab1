"""Learning-rate schedules.

The reference defines a Noam scheduler whose update is dead code
(utils/lr_scheduler.py:35-37) and actually trains with
``ExponentialLR(gamma=0.95)`` stepped per epoch
(auto_encoder/model.py:293,359).  Both are provided here as working optax
schedules; 'exponential' reproduces the observed reference behaviour.
"""
from __future__ import annotations

import optax

from autovc_tpu.config import OptimizerConfig


def noam_schedule(base_lr: float, dim_model: int, n_warmup_steps: int):
    """lr(step) = base_lr * dim^-0.5 * min(step^-0.5, step * warmup^-1.5)
    (utils/lr_scheduler.py:27, with the update actually applied)."""

    import jax.numpy as jnp

    def schedule(step):
        s = step + 1.0
        return (base_lr * dim_model ** -0.5
                * jnp.minimum(s ** -0.5, s * n_warmup_steps ** -1.5))

    return schedule


def exponential_per_epoch(base_lr: float, gamma: float,
                          steps_per_epoch: int):
    """ExponentialLR stepped once per epoch (the reference AE behaviour)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * gamma ** epoch

    return schedule


def make_schedule(cfg: OptimizerConfig, steps_per_epoch: int,
                  dim_model: int = 80):
    if cfg.lr_scheduler in ("exponential", "ExponentialLR"):
        return exponential_per_epoch(cfg.lr, cfg.gamma, steps_per_epoch)
    if cfg.lr_scheduler in ("noam", "NoamScheduler"):
        return noam_schedule(cfg.lr, dim_model, cfg.n_warmup_steps)
    if cfg.lr_scheduler in (None, "none", "constant"):
        return lambda step: cfg.lr
    raise ValueError(f"unknown lr_scheduler {cfg.lr_scheduler!r}")


def make_optimizer(cfg: OptimizerConfig, steps_per_epoch: int,
                   dim_model: int = 80) -> optax.GradientTransformation:
    """Adam + global-norm clip + schedule, mirroring the reference setup
    (auto_encoder/model.py:279-318): clip(max_norm) -> Adam(betas, eps)."""
    schedule = make_schedule(cfg, steps_per_epoch, dim_model)
    chain = []
    if cfg.grad_clip_norm:
        chain.append(optax.clip_by_global_norm(cfg.grad_clip_norm))
    chain.append(optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1],
                                     eps=cfg.eps))
    if cfg.weight_decay:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*chain)
