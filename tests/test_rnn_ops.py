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
