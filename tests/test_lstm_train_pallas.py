"""Parity of the fused LSTM-stack TRAINING kernels
(ops/lstm_train_pallas.py) vs the scan reference (ops/rnn.lstm_stack with
its custom VJP), interpret mode on CPU: forward outputs, final states, AND
full gradients (input, every layer's weights and biases)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autovc_tpu.ops import lstm_train_pallas as LT
from autovc_tpu.ops import rnn as R


def _setup(L, B, T, I, H, seed=0):
    params = R.init_lstm_stack(jax.random.PRNGKey(seed), I, H, L)
    rng = np.random.default_rng(seed + 1)
    x = jnp.asarray(0.5 * rng.standard_normal((B, T, I)), jnp.float32)
    return params, x


@pytest.mark.parametrize("L,B,T,I,H", [(1, 2, 11, 6, 8),
                                       (2, 3, 24, 10, 8),
                                       (3, 5, 17, 4, 16)])
def test_stack_train_forward_matches_scan(L, B, T, I, H):
    params, x = _setup(L, B, T, I, H, seed=L)
    ys_ref, (h_ref, c_ref), _ = R.lstm_stack(params, x)
    ys, (h, c) = LT.lstm_stack_train(params, x, interpret=True)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ys_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("L,B,T,I,H", [(2, 3, 13, 6, 8), (3, 2, 20, 5, 8)])
def test_stack_train_grads_match_scan(L, B, T, I, H):
    """Cotangents through BOTH the per-step outputs and the final hidden
    state (the SE loss uses only h_fin; the AE decoder uses ys)."""
    params, x = _setup(L, B, T, I, H, seed=10 + L)

    def loss_kernel(p, xx):
        ys, (h, _) = LT.lstm_stack_train(p, xx, interpret=True)
        return jnp.sum(jnp.sin(ys)) + 2.0 * jnp.sum(h * h)

    def loss_ref(p, xx):
        ys, (h, _), _ = R.lstm_stack(p, xx)
        return jnp.sum(jnp.sin(ys)) + 2.0 * jnp.sum(h * h)

    gk = jax.grad(loss_kernel, argnums=(0, 1))(params, x)
    gr = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_stack_train_final_state_with_padded_tail():
    """T far from the block alignment: frozen padded-tail steps must leave
    the final state and its gradient exactly at step T-1's values."""
    params, x = _setup(3, 4, 9, 5, 8, seed=33)

    def loss_kernel(p, xx):
        _, (h, c) = LT.lstm_stack_train(p, xx, interpret=True)
        return jnp.sum(h * h) + jnp.sum(jnp.abs(c))

    def loss_ref(p, xx):
        _, (h, c), _ = R.lstm_stack(p, xx)
        return jnp.sum(h * h) + jnp.sum(jnp.abs(c))

    np.testing.assert_allclose(float(loss_kernel(params, x)),
                               float(loss_ref(params, x)), rtol=1e-5)
    gk = jax.grad(loss_kernel)(params, x)
    gr = jax.grad(loss_ref)(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)
