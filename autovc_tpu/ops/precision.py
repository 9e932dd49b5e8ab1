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
