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
