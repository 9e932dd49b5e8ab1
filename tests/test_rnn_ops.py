"""Parity tests: fused-gate scan RNNs and conv blocks vs PyTorch.

PyTorch (CPU) is the independent implementation here — weights are converted
via utils/torch_compat and forwards must agree to rtol 1e-4.
"""
import numpy as np
import pytest
import torch

from autovc_tpu.ops import conv as conv_ops
from autovc_tpu.ops import rnn as rnn_ops
from autovc_tpu.utils import torch_compat as tc

torch.manual_seed(0)


def test_lstm_layer_matches_torch():
    B, T, I, H = 3, 17, 20, 32
    m = torch.nn.LSTM(I, H, 1, batch_first=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, (h_ref, c_ref) = m(x)
    params = tc.lstm_layer_from_torch(m.state_dict(), "", 0)
    # state_dict keys are 'weight_ih_l0' etc with empty prefix -> fix lookup
    out, (h, c) = rnn_ops.lstm_layer(
        {k: v for k, v in params.items()}, np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref[0].numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), c_ref[0].numpy(), rtol=1e-4,
                               atol=1e-5)


def test_lstm_stack_matches_torch():
    B, T, I, H, L = 2, 11, 40, 256, 3  # speaker-encoder geometry
    m = torch.nn.LSTM(I, H, L, batch_first=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, (h_ref, _) = m(x)
    params = tc.lstm_stack_from_torch(m.state_dict(), "", L)
    out, (h, c), finals = rnn_ops.lstm_stack(params, np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    # last layer final hidden == torch h_n[-1]
    np.testing.assert_allclose(np.asarray(h), h_ref[-1].numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(finals), h_ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_bilstm_stack_matches_torch():
    B, T, I, H, L = 2, 33, 512, 32, 2  # AutoVC encoder geometry
    m = torch.nn.LSTM(I, H, L, batch_first=True, bidirectional=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, _ = m(x)
    params = tc.bilstm_stack_from_torch(m.state_dict(), "", L)
    out = rnn_ops.bilstm_stack(params, np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_gru_layer_matches_torch():
    B, T, I, H = 2, 13, 512, 512  # WaveRNN rnn1 geometry (reduced T)
    m = torch.nn.GRU(I, H, batch_first=True)
    x = torch.randn(B, T, I)
    with torch.no_grad():
        ref, h_ref = m(x)
    params = tc.gru_layer_from_torch(m.state_dict(), "", 0)
    out, h = rnn_ops.gru_layer(params, np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_ref[0].numpy(), rtol=1e-4,
                               atol=1e-5)


def test_gru_cell_matches_torch_grucell():
    # The sampling loop uses gru_cell directly (wavernn/model.py:338-344).
    B, I, H = 4, 144, 96
    m = torch.nn.GRUCell(I, H)
    x = torch.randn(B, I)
    h0 = torch.randn(B, H)
    with torch.no_grad():
        ref = m(x, h0)
    sd = {f"{k}_l0": v for k, v in m.state_dict().items()}
    params = tc.gru_layer_from_torch(sd, "", 0)
    xp = rnn_ops.gru_project_inputs(params, np.asarray(x))
    h = rnn_ops.gru_cell(params, xp, np.asarray(h0))
    np.testing.assert_allclose(np.asarray(h), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_conv1d_matches_torch():
    B, C, T = 2, 80, 50
    m = torch.nn.Conv1d(C, 512, kernel_size=5, padding=2)
    x = torch.randn(B, C, T)
    with torch.no_grad():
        ref = m(x)
    params = tc.conv1d_from_torch(m.state_dict(), "")
    # state_dict keys are 'weight'/'bias' with empty prefix
    params = {"w": m.weight.detach().numpy(), "b": m.bias.detach().numpy()}
    out = conv_ops.conv1d(params, np.asarray(x), padding=2)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_batchnorm_eval_matches_torch():
    B, C, T = 3, 512, 40
    m = torch.nn.BatchNorm1d(C)
    # give it non-trivial running stats
    with torch.no_grad():
        m.running_mean.uniform_(-1, 1)
        m.running_var.uniform_(0.5, 2.0)
        m.weight.uniform_(0.5, 1.5)
        m.bias.uniform_(-0.5, 0.5)
    m.eval()
    x = torch.randn(B, C, T)
    with torch.no_grad():
        ref = m(x)
    params = {"scale": m.weight.detach().numpy(),
              "bias": m.bias.detach().numpy(),
              "mean": m.running_mean.numpy(), "var": m.running_var.numpy()}
    out, _ = conv_ops.batchnorm1d(params, np.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_batchnorm_train_matches_torch():
    B, C, T = 4, 16, 10
    m = torch.nn.BatchNorm1d(C)
    x = torch.randn(B, C, T)
    ref = m(x)  # training mode forward mutates running stats
    params = conv_ops.init_batchnorm(C)
    out, new_params = conv_ops.batchnorm1d(params, np.asarray(x), train=True)
    np.testing.assert_allclose(np.asarray(out), ref.detach().numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["mean"]),
                               m.running_mean.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_params["var"]),
                               m.running_var.numpy(), rtol=1e-4, atol=1e-5)


def test_linear_matches_torch():
    m = torch.nn.Linear(1024, 80)
    x = torch.randn(5, 7, 1024)
    with torch.no_grad():
        ref = m(x)
    params = {"w": m.weight.detach().numpy(), "b": m.bias.detach().numpy()}
    out = conv_ops.linear(params, np.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-4,
                               atol=1e-5)


def test_lstm_grad_flows():
    import jax
    import jax.numpy as jnp
    params = rnn_ops.init_lstm_layer(jax.random.PRNGKey(0), 8, 16)
    x = jnp.ones((2, 5, 8))

    def loss(p):
        out, _ = rnn_ops.lstm_layer(p, x)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())
    assert float(np.abs(np.asarray(g["w_ih"])).sum()) > 0


def test_lstm_stack_skewed_matches_sequential():
    """The pipelined multi-layer scan is numerically the sequential stack
    (same matmuls batched; masking freezes state outside each layer's live
    range)."""
    import jax
    import jax.numpy as jnp
    for L, H, I, B, T in ((3, 32, 12, 4, 21), (2, 16, 16, 1, 5)):
        params = rnn_ops.init_lstm_stack(jax.random.PRNGKey(L), I, H, L)
        x = jax.random.normal(jax.random.PRNGKey(7), (B, T, I))
        o1, (h1, c1), f1 = rnn_ops.lstm_stack(params, x)
        o2, (h2, c2), f2 = rnn_ops.lstm_stack_skewed(params, x)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(h1), np.asarray(h2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(c1), np.asarray(c2),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                                   rtol=1e-5, atol=1e-6)


def test_lstm_stack_skewed_grad_flows():
    import jax
    import jax.numpy as jnp
    params = rnn_ops.init_lstm_stack(jax.random.PRNGKey(0), 8, 16, 3)
    x = jnp.ones((2, 5, 8))

    def loss(p):
        out, _, _ = rnn_ops.lstm_stack_skewed(p, x)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)
    assert float(np.abs(np.asarray(g[0]["w_ih"])).sum()) > 0


def _naive_lstm_layer(params, x, reverse=False):
    """Plain autodiff reference for the custom-VJP core: same math, scan
    differentiated by XLA."""
    import jax
    import jax.numpy as jnp
    B, T, _ = x.shape
    H = params["w_hh"].shape[0]
    xp = (jnp.matmul(x, params["w_ih"],
                     precision=jax.lax.Precision.HIGHEST)
          + params["b_ih"] + params["b_hh"])
    h = jnp.zeros((B, H), x.dtype)
    c = jnp.zeros((B, H), x.dtype)

    def step(carry, xp_t):
        h, c = carry
        gates = xp_t + jnp.matmul(h, params["w_hh"],
                                  precision=jax.lax.Precision.HIGHEST)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    (h, c), ys = jax.lax.scan(step, (h, c), jnp.swapaxes(xp, 0, 1),
                              reverse=reverse)
    return jnp.swapaxes(ys, 0, 1)


def test_lstm_custom_vjp_grad_parity():
    """The hand-derived LSTM backward (rnn._lstm_core_bwd) must match
    XLA autodiff of the same scan to float precision."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(0)
    B, T, I, H = 3, 7, 5, 4
    params = rnn_ops.init_lstm_layer(jax.random.PRNGKey(0), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))
    tgt = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))

    def loss_custom(p):
        ys, _ = rnn_ops.lstm_layer(p, x)
        return jnp.sum((ys - tgt) ** 2) + jnp.mean(ys)

    def loss_naive(p):
        ys = _naive_lstm_layer(p, x)
        return jnp.sum((ys - tgt) ** 2) + jnp.mean(ys)

    g1 = jax.grad(loss_custom)(params)
    g2 = jax.grad(loss_naive)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def test_lstm_custom_vjp_grad_parity_reverse():
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    B, T, I, H = 2, 5, 4, 3
    params = rnn_ops.init_lstm_layer(jax.random.PRNGKey(1), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))

    def loss_custom(p):
        ys, _ = rnn_ops.lstm_layer(p, x, reverse=True)
        return jnp.sum(ys ** 2)

    def loss_naive(p):
        return jnp.sum(_naive_lstm_layer(p, x, reverse=True) ** 2)

    g1 = jax.grad(loss_custom)(params)
    g2 = jax.grad(loss_naive)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)


def test_bilstm_custom_vjp_grad_parity():
    """Direction-batched BLSTM grads == per-direction naive autodiff."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    B, T, I, H = 2, 6, 5, 4
    stack = rnn_ops.init_bilstm_stack(jax.random.PRNGKey(2), I, H, 1)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))

    def loss_custom(p):
        return jnp.sum(rnn_ops.bilstm_stack(p, x) ** 2)

    def loss_naive(p):
        lp = p[0]
        f = _naive_lstm_layer(lp["fwd"], x)
        b = jnp.flip(_naive_lstm_layer(
            lp["bwd"], jnp.flip(x, axis=1)), axis=1)
        return jnp.sum(jnp.concatenate([f, b], axis=-1) ** 2)

    g1 = jax.grad(loss_custom)(stack)
    g2 = jax.grad(loss_naive)(stack)
    flat1 = jax.tree_util.tree_leaves(g1)
    flat2 = jax.tree_util.tree_leaves(g2)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_gru_custom_vjp_grad_parity():
    """Hand-derived GRU backward (rnn._gru_core_bwd) vs XLA autodiff."""
    import jax
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    B, T, I, H = 3, 6, 4, 5
    params = rnn_ops.init_gru_layer(jax.random.PRNGKey(3), I, H)
    x = jnp.asarray(rng.standard_normal((B, T, I)).astype(np.float32))

    def naive_gru(p, x):
        B, T, _ = x.shape
        H = p["w_hh"].shape[0]
        xp = jnp.matmul(x, p["w_ih"],
                        precision=jax.lax.Precision.HIGHEST) + p["b_ih"]
        h = jnp.zeros((B, H), x.dtype)

        def step(h, xp_t):
            hp = jnp.matmul(h, p["w_hh"],
                            precision=jax.lax.Precision.HIGHEST) + p["b_hh"]
            xr, xz, xn = jnp.split(xp_t, 3, axis=-1)
            hr, hz, hn = jnp.split(hp, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h = (1.0 - z) * n + z * h
            return h, h

        _, ys = jax.lax.scan(step, h, jnp.swapaxes(xp, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    def loss_custom(p):
        ys, _ = rnn_ops.gru_layer(p, x)
        return jnp.sum(ys ** 2) + jnp.mean(jnp.abs(ys))

    def loss_naive(p):
        ys = naive_gru(p, x)
        return jnp.sum(ys ** 2) + jnp.mean(jnp.abs(ys))

    g1 = jax.grad(loss_custom)(params)
    g2 = jax.grad(loss_naive)(params)
    for k in g1:
        np.testing.assert_allclose(np.asarray(g1[k]), np.asarray(g2[k]),
                                   rtol=2e-5, atol=2e-5, err_msg=k)
