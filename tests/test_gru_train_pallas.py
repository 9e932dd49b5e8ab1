"""Parity of the fused GRU-pair TRAINING kernels (ops/gru_train_pallas.py)
vs the XLA scan reference (ops/rnn.gru_layer with its custom VJP), interpret
mode on CPU: forward values AND full gradients (input cotangents, recurrent
weight grads, bias grads) — the kernel's rematerializing backward must match
the save-activations scan backward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autovc_tpu.ops import gru_train_pallas as GP
from autovc_tpu.ops import rnn as R


def _ref_pair(xp1, base2, wih2x, whh1, bhh1, whh2, bhh2):
    """Scan-path reference with the same (hoisted, TIME-MAJOR)
    input-projection contract as gru_pair."""
    B = xp1.shape[1]
    h1s, _ = R._gru_core(xp1, whh1, bhh1,
                         jnp.zeros((B, whh1.shape[0]), xp1.dtype))
    xp2 = base2 + jnp.matmul(h1s, wih2x,
                             precision=jax.lax.Precision.HIGHEST)
    h2s, _ = R._gru_core(xp2, whh2, bhh2,
                         jnp.zeros((B, whh2.shape[0]), xp1.dtype))
    return h1s, h2s


def _setup(B, T, H, seed=0):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(0.4 * rng.standard_normal(s), jnp.float32)
    return (f(T, B, 3 * H), f(T, B, 3 * H), f(H, 3 * H), f(H, 3 * H),
            f(3 * H), f(H, 3 * H), f(3 * H))


@pytest.mark.parametrize("B,T,H", [(1, 9, 8), (3, 24, 16), (2, 40, 8)])
def test_gru_pair_forward_matches_scan(B, T, H):
    args = _setup(B, T, H, seed=B)
    h1_ref, h2_ref = _ref_pair(*args)
    h1, h2 = GP.gru_pair(*args, interpret=True)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h1_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h2_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("B,T,H", [(2, 17, 8), (1, 40, 16)])
def test_gru_pair_grads_match_scan(B, T, H):
    args = _setup(B, T, H, seed=10 + B)

    def loss_kernel(*a):
        h1, h2 = GP.gru_pair(*a, interpret=True)
        return jnp.sum(jnp.sin(h2)) + 0.5 * jnp.sum(jnp.cos(h1))

    def loss_ref(*a):
        h1, h2 = _ref_pair(*a)
        return jnp.sum(jnp.sin(h2)) + 0.5 * jnp.sum(jnp.cos(h1))

    gk = jax.grad(loss_kernel, argnums=tuple(range(7)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    names = ["dxp1", "dbase2", "dwih2x", "dwhh1", "dbhh1", "dwhh2", "dbhh2"]
    for n, a, b in zip(names, gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=n)


def test_wavernn_forward_kernel_branch_matches_scan(monkeypatch):
    """The whole kernel-branch forward in models.wavernn (time-major
    projections, base2 split, residual chain, split fc matmuls) must match
    the scan branch — values AND loss gradients."""
    import functools

    from autovc_tpu.config import WaveRNNConfig
    from autovc_tpu.models import wavernn as WR
    from autovc_tpu.ops import gru_train_pallas as GP

    cfg = WaveRNNConfig().with_overrides(
        res_blocks=2, rnn_dims=16, fc_dims=16, compute_dims=8,
        res_out_dims=16)
    params = WR.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(2)
    B, F = 2, 8
    T = (F - 2 * cfg.pad) * cfg.total_scale
    mels = jnp.asarray(rng.random((B, 80, F)), jnp.float32)
    x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    y = jnp.roll(x, -1, 1)

    monkeypatch.setattr(GP, "gru_pair",
                        functools.partial(GP.gru_pair, interpret=True))
    l_scan, _ = WR.loss(params, x, y, mels, cfg, train=False,
                        fast_kernels=False)
    l_kern, _ = WR.loss(params, x, y, mels, cfg, train=False,
                        fast_kernels=True)
    np.testing.assert_allclose(float(l_kern), float(l_scan), rtol=1e-5)

    g_scan = jax.grad(lambda p: WR.loss(p, x, y, mels, cfg, train=False,
                                        fast_kernels=False)[0])(params)
    g_kern = jax.grad(lambda p: WR.loss(p, x, y, mels, cfg, train=False,
                                        fast_kernels=True)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_kern),
                    jax.tree_util.tree_leaves(g_scan)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-4, atol=3e-4)


def test_gru_pair_pad_rows_and_steps():
    """B and T far from the kernel's 8/block alignments: padded rows and
    padded tail steps must not leak into values or grads."""
    args = _setup(5, 13, 8, seed=99)

    def loss_kernel(*a):
        h1, h2 = GP.gru_pair(*a, interpret=True)
        return jnp.sum(h2 * h2) + jnp.sum(jnp.abs(h1))

    def loss_ref(*a):
        h1, h2 = _ref_pair(*a)
        return jnp.sum(h2 * h2) + jnp.sum(jnp.abs(h1))

    np.testing.assert_allclose(float(loss_kernel(*args)),
                               float(loss_ref(*args)), rtol=1e-5)
    gk = jax.grad(loss_kernel, argnums=(0, 3))(*args)
    gr = jax.grad(loss_ref, argnums=(0, 3))(*args)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
