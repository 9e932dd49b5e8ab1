"""Parity of the fused Pallas LSTM-stack inference kernels
(ops/lstm_pallas.py) vs the XLA scan reference (ops/rnn.py), interpret
mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autovc_tpu.ops import lstm_pallas as LP
from autovc_tpu.ops import rnn as R


@pytest.mark.parametrize("L,B,T,I,H", [(1, 1, 13, 6, 8),
                                       (2, 3, 17, 10, 8),
                                       (3, 2, 9, 4, 16)])
def test_lstm_stack_pallas_matches_scan(L, B, T, I, H):
    rng = np.random.default_rng(L * 100 + B)
    params = R.init_lstm_stack(jax.random.PRNGKey(L), I, H, L)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    ref, _, _ = R.lstm_stack(params, x)
    out = LP.lstm_stack_pallas(params, x, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_decoder_geometry_parity():
    """The exact decoder LSTM2 geometry (2 x 1024) the kernel exists for,
    at a reduced T so interpret mode stays fast."""
    rng = np.random.default_rng(0)
    params = R.init_lstm_stack(jax.random.PRNGKey(0), 512, 64, 2)
    x = jnp.asarray(rng.standard_normal((1, 25, 512)).astype(np.float32))
    ref, _, _ = R.lstm_stack(params, x)
    out = LP.lstm_stack_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("L,B,T,I,H", [(2, 12, 21, 10, 8),
                                       (1, 5, 40, 6, 16),
                                       (3, 9, 13, 4, 8)])
def test_lstm_stack_stream_matches_scan(L, B, T, I, H):
    """The streamed serving-slab kernel (double-buffered HBM step blocks,
    all layers chained per round) must match the scan at any geometry,
    incl. row/step padding far from the 8/block alignments."""
    rng = np.random.default_rng(L * 31 + B)
    params = R.init_lstm_stack(jax.random.PRNGKey(L + 5), I, H, L)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    ref, _, _ = R.lstm_stack(params, x)
    out = LP.lstm_stack_stream(params, x, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_bf16_gate_deviation_bounded():
    """The kernel's intentional precision deviation (precision.py policy
    comment): at B=1, H>=256 under the bf16 policy the kernel runs its
    recurrence in bf16 where rec_dot's scan would run f32 (the kernel's
    cost is VMEM weight streaming, which bf16 halves).  Bound the numeric
    gap kernel(bf16) vs scan(f32) at a deviation-regime geometry.  H=256
    (not 1024) keeps interpret mode CI-fast; the gate routes identically
    for every H >= REC_BF16_MIN_HIDDEN, and the TPU-hardware run of the
    same parity suite covers the full 2x1024 shape."""
    from autovc_tpu.ops import precision as PREC
    rng = np.random.default_rng(3)
    H = PREC.REC_BF16_MIN_HIDDEN
    params = R.init_lstm_stack(jax.random.PRNGKey(3), 128, H, 2)
    x = jnp.asarray(0.5 * rng.standard_normal((1, 20, 128))
                    .astype(np.float32))
    ref, _, _ = R.lstm_stack(params, x)          # f32 policy -> exact scan
    with PREC.compute("bf16"):
        # rows==1: the scan would STILL be f32 (rec_dot override);
        # the kernel goes bf16 — this is the deviation being bounded
        out = LP.lstm_stack_pallas(params, x, interpret=True)
    err = float(jnp.max(jnp.abs(out - ref)))
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    # bf16 operand rounding (8-bit mantissa) through 2 layers x 20 steps
    # of f32-accumulated matmuls: relative error stays ~1e-2
    assert err / scale < 2e-2, (err, scale)
