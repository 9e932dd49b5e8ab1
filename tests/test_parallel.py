"""Distributed tests on the 8-device CPU mesh (SURVEY.md §4 tier 5):
DP-sharded steps must equal the single-device step bit-for-bit (same global
semantics), TP sharding must compile and agree, and the chunk-sharded convert
must match the local merge."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from autovc_tpu.config import AutoEncoderConfig, SpeakerEncoderConfig
from autovc_tpu.models import autoencoder as AE
from autovc_tpu.models import speaker_encoder as SE
from autovc_tpu.parallel import sharding as shd
from autovc_tpu.parallel import steps as psteps
from autovc_tpu.train import loop as base_loop
from autovc_tpu.train import schedules

CFG = AutoEncoderConfig().with_overrides(
    spectrogram={"partial_utterance_n_frames": 64})


def test_mesh_construction():
    mesh = shd.make_mesh()
    assert mesh.shape["data"] == 8
    mesh2 = shd.make_mesh((4, 2), ("data", "model"))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_param_shardings_tp_rules():
    mesh = shd.make_mesh((4, 2), ("data", "model"))
    params = AE.init(jax.random.PRNGKey(0), CFG)
    shardings = shd.param_shardings(params, mesh)
    # decoder lstm2 gate matrix (1024*4 outputs) must be model-sharded
    s = shardings["decoder"]["lstm2"][0]["w_ih"]
    assert s.spec == P(None, "model")
    # BN scale vectors stay replicated
    s_bn = shardings["encoder"]["convs"][0]["bn"]["scale"]
    assert s_bn.spec == P()


def _make_inputs(B=8, T=64, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.random((B, 80, T), dtype=np.float32)
    c = rng.standard_normal((B, 256)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    return x, c


@pytest.mark.slow  # two full AE grad-program compiles per param set on the
#                    8-device CPU mesh (~4 min each on 2 CPUs); the fast tier
#                    covers the same machinery via the SE step and the
#                    chunk-sharded convert below
@pytest.mark.parametrize("mesh_shape,axes", [
    ((8,), ("data",)),
    ((4, 2), ("data", "model")),
])
def test_sharded_ae_step_matches_single_device(mesh_shape, axes):
    mesh = shd.make_mesh(mesh_shape, axes)
    params = AE.init(jax.random.PRNGKey(0), CFG)
    oc = CFG.optimizer
    tx = schedules.make_optimizer(oc, steps_per_epoch=10)
    x, c = _make_inputs()

    # single device
    step1 = base_loop.make_ae_step(CFG, tx, ema_decay=0.999)
    p1, o1, e1, aux1 = step1(params, tx.init(params),
                             jax.tree_util.tree_map(jnp.asarray, params),
                             x, c)

    # sharded
    stepN = psteps.make_sharded_ae_step(CFG, tx, 0.999, mesh, params)
    with jax.set_mesh(mesh):
        p_sharded = shd.shard_params(params, mesh)
        ema0 = shd.shard_params(params, mesh)
        xs = psteps.shard_batch(x, mesh)
        cs = psteps.shard_batch(c, mesh)
        opt0 = jax.device_put(tx.init(params),
                              shd.tree_shardings_like(tx.init(params),
                                                      shd.replicated(mesh)))
        pN, oN, eN, auxN = stepN(p_sharded, opt0, ema0, xs, cs)

    # rel 1e-4: fusion differences between the two compiled programs (the
    # sharded one carries GSPMD reshards; both carry the global_norm
    # reduction) reorder f32 sums at the ~5e-5 level
    assert float(aux1["loss"]) == pytest.approx(float(auxN["loss"]),
                                                rel=1e-4)
    # Post-Adam params: at step 1 Adam normalises each grad to ~±lr, so
    # near-zero grads can flip sign under reduction reordering; bound the
    # drift by 3*lr rather than expecting bitwise equality.
    lr = CFG.optimizer.lr
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * lr)

    # Gradients themselves must agree tightly (same global semantics).
    def loss_only(p, xx, cc):
        return AE.loss(p, xx, cc, CFG)[0]

    g1 = jax.grad(loss_only)(params, x, c)
    with jax.set_mesh(mesh):
        gN = jax.jit(jax.grad(loss_only))(p_sharded, xs, cs)
    # atol floor: conv biases feeding BatchNorm have mathematically-zero
    # gradients (BN subtracts the mean), so those leaves are pure reduction
    # noise in both computations.
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(gN)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-3)


def test_sharded_se_step_matches_single_device():
    mesh = shd.make_mesh()
    cfg = SpeakerEncoderConfig()
    params = SE.init(jax.random.PRNGKey(1), cfg)
    tx = schedules.make_optimizer(cfg.optimizer, steps_per_epoch=10,
                                  dim_model=256)
    rng = np.random.default_rng(0)
    block = rng.random((8, 4, 40, 40), dtype=np.float32)

    step1 = base_loop.make_se_step(cfg, tx)
    p1, _, aux1 = step1(params, tx.init(params), block)

    stepN = psteps.make_sharded_se_step(cfg, tx, mesh, params)
    p_sh = shd.shard_params(params, mesh)
    opt0 = jax.device_put(tx.init(params),
                          shd.tree_shardings_like(tx.init(params),
                                                  shd.replicated(mesh)))
    pN, _, auxN = stepN(p_sh, opt0, psteps.shard_batch(block, mesh))
    assert float(aux1["loss"]) == pytest.approx(float(auxN["loss"]),
                                                rel=1e-5)
    # Adam at step 1 normalises grads to ~±lr (see AE test comment).
    lr = cfg.optimizer.lr
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * lr)


def test_chunk_sharded_convert_matches_local():
    mesh = shd.make_mesh()
    params = AE.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.default_rng(2)
    chunks = rng.random((8, 80, 64), dtype=np.float32)
    c = rng.standard_normal((1, 256)).astype(np.float32)

    local = np.asarray(AE.batch_forward(params, chunks, c, c, CFG, 0.5))

    p_sh = shd.shard_params(params, mesh)
    out = np.asarray(psteps.chunk_sharded_convert(
        p_sh, psteps.shard_batch(chunks, mesh),
        jax.device_put(c, shd.replicated(mesh)),
        jax.device_put(c, shd.replicated(mesh)),
        jnp.int32(chunks.shape[0]), CFG, 0.5))
    np.testing.assert_allclose(out, local, rtol=1e-4, atol=1e-5)


def test_pad_batch_to():
    x = np.ones((5, 3))
    padded, n = psteps.pad_batch_to(x, 8)
    assert padded.shape == (8, 3)
    assert n == 5
    assert padded[5:].sum() == 0


def test_sharded_vocoder_step_matches_single_device():
    from autovc_tpu.config import WaveRNNConfig
    from autovc_tpu.models import wavernn as WR

    mesh = shd.make_mesh()
    cfg = WaveRNNConfig().with_overrides(res_blocks=2, rnn_dims=32,
                                         fc_dims=32, compute_dims=16,
                                         res_out_dims=16,
                                         upsample_factors=(2, 2))
    params = WR.init(jax.random.PRNGKey(2), cfg)
    tx = schedules.make_optimizer(
        SpeakerEncoderConfig().optimizer, steps_per_epoch=10)
    rng = np.random.default_rng(0)
    B, F = 8, 2 + 2 * cfg.pad
    T = 2 * cfg.total_scale
    mels = rng.random((B, 80, F), dtype=np.float32)
    x_in = rng.uniform(-1, 1, (B, T)).astype(np.float32)
    y = np.roll(x_in, -1, axis=1)

    step1 = base_loop.make_vocoder_step(cfg, tx, precision="f32")
    p1, _, aux1 = step1(params, tx.init(params), x_in, y, mels)

    stepN = psteps.make_sharded_vocoder_step(cfg, tx, mesh, params,
                                             precision="f32")
    p_sh = shd.shard_params(params, mesh)
    opt0 = jax.device_put(tx.init(params),
                          shd.tree_shardings_like(tx.init(params),
                                                  shd.replicated(mesh)))
    pN, _, auxN = stepN(p_sh, opt0,
                        psteps.shard_batch(x_in, mesh),
                        psteps.shard_batch(y, mesh),
                        psteps.shard_batch(mels, mesh))
    assert float(aux1["loss"]) == pytest.approx(float(auxN["loss"]),
                                                rel=2e-5)
    lr = SpeakerEncoderConfig().optimizer.lr
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(pN)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3 * lr)
