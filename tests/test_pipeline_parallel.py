"""Stage-pipeline parallelism (parallel/pipeline.py): parity with the
sequential path and correct device placement, on the 8-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autovc_tpu.parallel import pipeline as pp


def test_split_devices_disjoint_and_complete():
    groups = pp.split_devices(n_stages=3)
    ids = [d.id for g in groups for d in g]
    assert sorted(ids) == [d.id for d in jax.devices()]
    assert len(groups) == 3 and all(groups)


def test_stage_pipeline_matches_sequential(rng):
    w1 = jnp.asarray(rng.standard_normal((8, 16)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    def f1(w, x):
        return jnp.tanh(x @ w)

    def f2(w, x):
        return x @ w

    groups = pp.split_devices(n_stages=2)
    pipe = pp.StagePipeline([(f1, w1), (f2, w2)], groups)

    xs = [jnp.asarray(rng.standard_normal((3, 8)).astype(np.float32))
          for _ in range(5)]
    outs = pipe.run(xs)
    for x, out in zip(xs, outs):
        np.testing.assert_allclose(out, np.asarray(f2(w2, f1(w1, x))),
                                   rtol=1e-6)


def test_stage_params_live_on_their_own_devices(rng):
    w = jnp.ones((4, 4))
    groups = pp.split_devices(n_stages=2)
    pipe = pp.StagePipeline([(lambda p, x: x @ p, w),
                             (lambda p, x: x + p[0, 0], w)], groups)
    devs0 = {d.id for d in pipe.stages[0].params.sharding.device_set}
    devs1 = {d.id for d in pipe.stages[1].params.sharding.device_set}
    assert devs0 and devs1 and not (devs0 & devs1)


def test_conversion_pipeline_end_to_end(rng):
    """Tiny-geometry SE->AE->WaveRNN chain through the two-stage pipeline;
    parity vs running the stages sequentially on the default device."""
    from autovc_tpu.config import AutoEncoderConfig, WaveRNNConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.models import wavernn as WR

    ae_cfg = AutoEncoderConfig()
    wr_cfg = WaveRNNConfig(
        rnn_dims=32, fc_dims=32, compute_dims=32, res_out_dims=16,
        res_blocks=1)
    key = jax.random.PRNGKey(0)
    ae_params = AE.init(key, ae_cfg)
    wr_params = WR.init(key, wr_cfg)

    M, n_mels, N = 2, 80, 64
    chunks = jnp.asarray(
        rng.random((M, n_mels, N)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((1, 256)).astype(np.float32))
    c = c / jnp.linalg.norm(c)

    pipe = pp.conversion_pipeline(ae_params, wr_params, ae_cfg, wr_cfg)
    gkey = jax.random.PRNGKey(7)
    outs = pipe.run([(chunks, c, c, gkey)])

    # sequential reference: the pipeline's vocoder stage IS the public
    # generate() program (shared code path — auto geometry + on-device
    # finish), so the finished waveforms must agree
    mel = AE.batch_forward(ae_params, chunks, c, c, ae_cfg,
                           precision="auto")
    ref = WR.generate(wr_params, np.asarray(mel), wr_cfg, key=gkey)
    assert outs[0].shape == ref.shape
    np.testing.assert_allclose(outs[0], ref, rtol=2e-4, atol=2e-5)


def test_run_bounded_inflight(rng):
    """run() keeps at most max_inflight items in flight and preserves
    order regardless of the bound."""
    w = jnp.eye(4)
    groups = pp.split_devices(n_stages=2)
    pipe = pp.StagePipeline([(lambda p, x: x @ p, w),
                             (lambda p, x: x * 2.0, w)], groups)
    xs = [jnp.full((2, 4), float(i)) for i in range(7)]
    outs = pipe.run(xs, max_inflight=2)
    for i, o in enumerate(outs):
        np.testing.assert_allclose(o, np.full((2, 4), 2.0 * i))
    with pytest.raises(AssertionError):
        pipe.run(xs, max_inflight=1)
