"""Discretized mixture-of-logistics (MOL) loss and sampler.

JAX re-implementation of the WaveRNN output distribution
(``autovc/wavernn/distribution.py:6-123``): 30 logits = 10 mixtures x
(logit weight, mean, log scale); sampling picks a mixture by Gumbel-max over
the logit weights and draws from the chosen logistic by inverse CDF, clamped
to [-1, 1].  RNG is explicit (``jax.random`` keys) so the sampler is pure and
scan-friendly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LOG_SCALE_MIN = float(np.log(1e-14))


def discretized_mix_logistic_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                                  num_classes: int = 65536,
                                  log_scale_min: float = LOG_SCALE_MIN
                                  ) -> jnp.ndarray:
    """Negative log-likelihood of targets under a discretized MOL.

    Args:
      y_hat: (B, T, 3*nr_mix) raw network outputs.
      y: (B, T, 1) targets in [-1, 1].
    Mirrors distribution.py:16-85 (probability mass of the quantisation bin,
    with edge cases at +-1 and a pdf fallback for tiny bins).
    """
    nr_mix = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:], log_scale_min)

    centered = y - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered + half_bin)
    min_in = inv_stdv * (centered - half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)      # log CDF at -1 edge
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)       # at +1 edge
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner_inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - np.log((num_classes - 1) / 2))
    inner = jnp.where(y > 0.999, log_one_minus_cdf_min, inner_inner)
    log_probs = jnp.where(y < -0.999, log_cdf_plus, inner)

    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def sample_from_discretized_mix_logistic(key, y: jnp.ndarray,
                                         log_scale_min: float = LOG_SCALE_MIN
                                         ) -> jnp.ndarray:
    """Draw samples from a MOL (distribution.py:87-123).

    Args:
      key: jax PRNG key.
      y: (..., 3*nr_mix) raw network outputs (any leading shape).
    Returns samples in [-1, 1] with shape y.shape[:-1].
    """
    nr_mix = y.shape[-1] // 3
    logit_probs = y[..., :nr_mix]
    k1, k2 = jax.random.split(key)

    # Gumbel-max mixture pick (uniform clamped to (1e-5, 1-1e-5) as in the
    # reference to avoid log(0)).
    u = jax.random.uniform(k1, logit_probs.shape, minval=1e-5,
                           maxval=1.0 - 1e-5)
    argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
    onehot = jax.nn.one_hot(argmax, nr_mix, dtype=y.dtype)

    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * onehot, axis=-1)
    log_scales = jnp.maximum(
        jnp.sum(y[..., 2 * nr_mix:] * onehot, axis=-1), log_scale_min)

    # Logistic inverse-CDF sample.
    u2 = jax.random.uniform(k2, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u2) - jnp.log(1.0 - u2))
    return jnp.clip(x, -1.0, 1.0)
