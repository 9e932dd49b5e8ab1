"""Matmul/conv precision policy — the mixed-precision switch.

The reference trains everything in f32 (torch default; auto_encoder/
model.py:300-318).  On TPU the MXU's native multiply is bfloat16: an f32
``Precision.HIGHEST`` matmul costs 6 MXU passes, while bf16 operands with an
f32 accumulator cost one.  This module is the single switch every matmul /
conv in the package routes through:

  * mode "f32" (default): ``Precision.HIGHEST`` f32 — bit-for-bit parity
    with the PyTorch reference (the parity-test contract, rtol 1e-4).
  * mode "bf16": operands cast to bfloat16, products accumulated in f32
    (``preferred_element_type``) — the standard bf16-compute / f32-master-
    weights recipe.  Parameters, optimizer state, EMA and BatchNorm
    statistics all stay f32; only the matmul/conv *operands* are rounded.

The mode is trace-time state set with the ``compute(...)`` context manager
(training loops wrap their step body in it), so one model definition serves
both policies with zero plumbing through the call stack.  Casting operands
explicitly (rather than relying on ``Precision.DEFAULT``) makes the policy
portable: CPU tests exercise the same bf16 rounding the MXU applies, so the
bf16-vs-f32 loss-trajectory test is meaningful off-TPU.
"""
from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp

_MODE = ["f32"]          # stack; innermost context wins

VALID_MODES = ("f32", "bf16")


def mode() -> str:
    return _MODE[-1]


def resolve(m: str) -> str:
    """Resolve "auto" to the platform winner: bf16 on TPU (the MXU's native
    multiply; measured ~4x faster than f32/HIGHEST on the AE inference
    shapes with mel MSE ~1e-6), exact f32 elsewhere."""
    if m == "auto":
        return "bf16" if jax.default_backend() == "tpu" else "f32"
    if m not in VALID_MODES:
        raise ValueError(f"precision {m!r} not in {VALID_MODES + ('auto',)}")
    return m


@contextlib.contextmanager
def compute(m: str):
    """Trace-time precision scope: ``with compute("bf16"): loss(...)``."""
    if m not in VALID_MODES:
        raise ValueError(f"precision mode {m!r} not in {VALID_MODES}")
    _MODE.append(m)
    try:
        yield
    finally:
        _MODE.pop()


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Policy-routed matmul: f32/HIGHEST or bf16-operand/f32-accumulate."""
    if mode() == "bf16":
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


# Recurrent-step matmuls are on the scan's sequential dependency chain, so
# their cost is LATENCY, not throughput — and the bf16 operand casts sit on
# that chain.  Measured on TPU v5e (decoder LSTM2, H=1024; encoder BLSTM,
# H=32):
#   * H >= 256 and rows >= 2: bf16 wins big (rows=3: 1.9 ms vs 11.5 ms f32 —
#     f32/HIGHEST pays 6 MXU passes over a 16 MB weight working set).
#   * rows == 1: XLA lowers f32 to a fast matvec; bf16 unpack overhead loses
#     (2.31 ms f32 vs 2.72 ms bf16).
#   * H < 256 (tiny gate widths): f32 wins at every row count measured — the
#     matmul never fills an MXU pass, casts only add chain latency.
# The bf16 policy therefore keeps the recurrent dot in f32/HIGHEST in the
# latter two regimes — strictly MORE accurate than the bf16 contract, so
# policy guarantees hold.  Time-parallel (hoisted) projections and convs are
# unaffected; they always follow the policy.
#
# INTENTIONAL DEVIATION — ops/lstm_pallas (the fused small-batch stack
# kernel): its compute-dtype gate is `fast_math and H >= REC_BF16_MIN_HIDDEN`
# WITHOUT the rows >= 2 clause, so at B=1 (its primary use: streaming-bound
# latency inference) it runs the recurrence in bf16 where this scan policy
# would run f32.  That is deliberate: inside the kernel the per-round cost
# is VMEM *weight streaming* (CLAUDE.md negative results — a 2x round unroll
# bought ~3%), which bf16 halves; the measured rows==1-favors-f32 fact above
# is about XLA's HBM matvec dispatch path and does not transfer.  The
# numeric deviation is bounded by tests/test_lstm_pallas.py's bf16-gate
# parity test (kernel-bf16 vs scan-f32).
REC_BF16_MIN_HIDDEN = 256
REC_BF16_MIN_ROWS = 2


def _rec_use_bf16(rows: int, hidden: int) -> bool:
    return (mode() == "bf16" and hidden >= REC_BF16_MIN_HIDDEN
            and rows >= REC_BF16_MIN_ROWS)


def rec_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Recurrent-step matmul (B, H) x (H, G): policy-routed with the
    small-shape f32 override (see REC_BF16_MIN_HIDDEN/ROWS)."""
    if _rec_use_bf16(a.shape[0], a.shape[1]):
        return jnp.matmul(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def rec_bdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Recurrent-step batched matmul (G, B, H) x (G, H, K) with the
    small-shape f32 override.

    Gating uses the PER-ENTRY row count ``B = a.shape[1]`` (not G*B): the
    measured rows==1-favors-f32 regime is about each constituent matmul's
    MXU row occupancy, so a batched step routes exactly as G independent
    :func:`rec_dot` calls would — making batched recurrences (direction-
    batched BLSTM, skewed stacks) bit-identical to their unbatched forms
    under every policy."""
    if _rec_use_bf16(a.shape[1], a.shape[2]):
        return jnp.einsum("gbh,ghk->gbk", a.astype(jnp.bfloat16),
                          b.astype(jnp.bfloat16),
                          preferred_element_type=jnp.float32)
    return jnp.einsum("gbh,ghk->gbk", a, b,
                      precision=jax.lax.Precision.HIGHEST)


def conv_operands(x: jnp.ndarray, w: jnp.ndarray):
    """Cast conv operands per policy; pair with :func:`conv_kwargs` and
    :func:`conv_output`."""
    if mode() == "bf16":
        return x.astype(jnp.bfloat16), w.astype(jnp.bfloat16)
    return x, w


def conv_kwargs() -> dict:
    # bf16 convs keep a bf16 *output* dtype (internal accumulation is still
    # f32 on the MXU): the transpose rule of conv_general_dilated requires
    # the cotangent dtype to match the operands, so the f32 upcast happens
    # outside the conv (conv_output) where its VJP is a plain downcast.
    if mode() == "bf16":
        return {}
    return {"precision": jax.lax.Precision.HIGHEST}


def conv_output(out: jnp.ndarray) -> jnp.ndarray:
    """Upcast a policy-cast conv's output back to f32."""
    if out.dtype == jnp.bfloat16:
        return out.astype(jnp.float32)
    return out
