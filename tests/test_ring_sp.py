"""Sequence-parallel ring recurrence (parallel/ring.py) vs the single-device
scans — exactness of the SP design promised in SURVEY.md §2c/§5, on the
8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autovc_tpu.ops import rnn as R
from autovc_tpu.parallel import ring, sharding as shd


@pytest.fixture(scope="module")
def mesh():
    return shd.make_mesh()


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


def test_ring_lstm_matches_single_device(rng, mesh):
    B, T, I, H = 2, 64, 16, 8
    params = R.init_lstm_layer(jax.random.PRNGKey(0), I, H)
    x = _rand(rng, B, T, I)

    ref_ys, (ref_h, ref_c) = R.lstm_layer(params, x)
    ys, (h, c) = ring.ring_lstm_layer(params, x, mesh)

    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref_ys),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(ref_c),
                               rtol=1e-5, atol=1e-6)


def test_ring_lstm_reverse(rng, mesh):
    B, T, I, H = 1, 32, 8, 8
    params = R.init_lstm_layer(jax.random.PRNGKey(1), I, H)
    x = _rand(rng, B, T, I)

    ref_ys, (ref_h, ref_c) = R.lstm_layer(params, x, reverse=True)
    ys, (h, c) = ring.ring_lstm_layer(params, x, mesh, reverse=True)

    np.testing.assert_allclose(np.asarray(ys), np.asarray(ref_ys),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                               rtol=1e-5, atol=1e-6)


def test_ring_bilstm_stack_matches_single_device(rng, mesh):
    """Two-layer BLSTM at the AE-encoder geometry (scaled down), concurrent
    fwd/bwd wavefronts."""
    B, T, I, H = 2, 40, 12, 8
    params = R.init_bilstm_stack(jax.random.PRNGKey(2), I, H, 2)
    x = _rand(rng, B, T, I)

    ref = R.bilstm_stack(params, x)
    out = ring.ring_bilstm_stack(params, x, mesh)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)


def test_ring_lstm_output_is_time_sharded(rng, mesh):
    """Outputs stay sharded on the time axis — no gather of the full
    sequence onto one device."""
    params = R.init_lstm_layer(jax.random.PRNGKey(3), 8, 8)
    x = _rand(rng, 1, 64, 8)
    ys, _ = ring.ring_lstm_layer(params, x, mesh)
    assert not ys.sharding.is_fully_replicated
