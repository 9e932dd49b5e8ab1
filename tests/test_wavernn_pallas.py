"""Pallas WaveRNN sampling kernel vs the XLA lax.scan reference
(interpret mode on CPU; the real-chip path is exercised by bench.py)."""
import jax
import numpy as np
import pytest

from autovc_tpu.config import WaveRNNConfig
from autovc_tpu.models import wavernn as WR
from autovc_tpu.ops import wavernn_pallas as WRP

SMALL = WaveRNNConfig().with_overrides(
    rnn_dims=64, fc_dims=64, compute_dims=16, res_out_dims=16,
    res_blocks=2)


@pytest.fixture(scope="module")
def setup():
    cfg = SMALL
    params = WR.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    B, T = 3, 40
    mels = rng.random((B, T, cfg.feat_dims), dtype=np.float32)
    aux = rng.random((B, T, cfg.res_out_dims), dtype=np.float32)
    return cfg, params, mels, aux


def test_pallas_matches_xla_scan_f32(setup):
    cfg, params, mels, aux = setup
    key = jax.random.PRNGKey(42)
    ref = np.asarray(WR._generate_scan(params, mels, aux, key, cfg,
                                       fast_math=False, unroll=1))
    out = np.asarray(WRP.generate_scan_pallas(params, mels, aux, key, cfg,
                                              fast_math=False,
                                              interpret=True))
    assert out.shape == ref.shape
    # identical noise + f32 math -> near-exact agreement
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_matches_xla_scan_raw_mode(setup):
    cfg, params, mels, aux = setup
    cfg = cfg.with_overrides(mode="RAW", bits=4)  # 16 classes
    params = WR.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)
    ref = np.asarray(WR._generate_scan(params, mels, aux, key, cfg,
                                       fast_math=False, unroll=1))
    out = np.asarray(WRP.generate_scan_pallas(params, mels, aux, key, cfg,
                                              fast_math=False,
                                              interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_bf16_statistics(setup):
    # bf16 fast-math path: samples agree in distribution with f32.
    cfg, params, mels, aux = setup
    key = jax.random.PRNGKey(3)
    f32 = np.asarray(WRP.generate_scan_pallas(params, mels, aux, key, cfg,
                                              fast_math=False,
                                              interpret=True))
    bf16 = np.asarray(WRP.generate_scan_pallas(params, mels, aux, key, cfg,
                                               fast_math=True,
                                               interpret=True))
    assert np.all(np.isfinite(bf16))
    assert np.all(np.abs(bf16) <= 1.0)
    assert abs(f32.mean() - bf16.mean()) < 0.1
    assert abs(f32.std() - bf16.std()) < 0.15


def test_generate_with_pallas_backend(setup):
    cfg, params, _, _ = setup
    mel = np.random.default_rng(5).random((1, cfg.feat_dims, 12),
                                          dtype=np.float32)
    wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(0),
                      batched=True, target=550, overlap=275,
                      backend="pallas", interpret=True)
    assert wav.shape == (11 * cfg.hop_length,)
    assert np.all(np.isfinite(wav))
