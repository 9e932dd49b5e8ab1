"""Pallas LSTM-scan kernel (ops/lstm_pallas.py) vs the f32 lax.scan path,
in interpreter mode on CPU (the kernel's bf16 matmuls are emulated)."""
import jax
import numpy as np
import pytest

from autovc_tpu.ops import lstm_pallas as LP
from autovc_tpu.ops import rnn as R


def _x(rng, B, T, I):
    return rng.standard_normal((B, T, I)).astype(np.float32)


@pytest.mark.parametrize("reverse", [False, True])
def test_lstm_layer_pallas_matches_scan(rng, reverse):
    B, T, I, H = 3, 17, 24, 128
    params = R.init_lstm_layer(jax.random.PRNGKey(0), I, H)
    x = _x(rng, B, T, I)

    ref_ys, (ref_h, _) = R.lstm_layer(params, x, reverse=reverse)
    ys, (h, _) = LP.lstm_layer_pallas(params, x, reverse=reverse,
                                      interpret=True)

    assert ys.shape == ref_ys.shape
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref_ys),
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h), atol=2e-2)


def test_bilstm_stack_pallas_matches_scan(rng):
    B, T, I, H = 2, 12, 16, 128
    params = R.init_bilstm_stack(jax.random.PRNGKey(1), I, H, 2)
    x = _x(rng, B, T, I)

    ref = R.bilstm_stack(params, x)
    out = LP.bilstm_stack_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)


def test_lstm_stack_pallas_matches_scan(rng):
    B, T, I, H = 2, 9, 16, 128
    params = R.init_lstm_stack(jax.random.PRNGKey(2), I, H, 2)
    x = _x(rng, B, T, I)

    ref, _, _ = R.lstm_stack(params, x)
    out, _, _ = LP.lstm_stack_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-2)


def test_narrow_layer_falls_back_to_scan(rng):
    """H not a lane multiple (the encoder's dim_neck=32 BLSTM) must take the
    scan path and stay exact."""
    params = R.init_lstm_layer(jax.random.PRNGKey(3), 8, 32)
    x = _x(rng, 2, 11, 8)
    ref_ys, _ = R.lstm_layer(params, x)
    ys, _ = LP.lstm_layer_pallas(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref_ys),
                               rtol=1e-6, atol=1e-7)
