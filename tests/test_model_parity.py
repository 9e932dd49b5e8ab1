"""Forward-parity tests: autovc_tpu models vs torch mirror models after
checkpoint conversion (the SURVEY.md §4 'model-parity' tier)."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from autovc_tpu.config import (AutoEncoderConfig, SpeakerEncoderConfig,
                               WaveRNNConfig)
from autovc_tpu.models import autoencoder as AE
from autovc_tpu.models import speaker_encoder as SE
from autovc_tpu.models import wavernn as WR
from autovc_tpu.utils import torch_compat as tc

from torch_mirrors import (MirrorAutoVC, MirrorSpeakerEncoder, MirrorWaveRNN)

torch.manual_seed(42)


def _randomize_bn(module):
    """Give BatchNorm layers non-trivial running stats so eval-mode parity
    actually exercises the converted stats."""
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)


@pytest.fixture(scope="module")
def ae_pair():
    m = MirrorAutoVC()
    _randomize_bn(m)
    m.eval()
    params = tc.autoencoder_from_torch(m.state_dict())
    return m, params


def test_autoencoder_forward_parity(ae_pair):
    m, params = ae_pair
    cfg = AutoEncoderConfig()
    B, T = 2, 128  # divisible by freq
    x = torch.rand(B, 80, T)
    c_org = torch.randn(B, 256)
    c_trg = torch.randn(B, 256)
    with torch.no_grad():
        mel_ref, post_ref, codes_ref = m(x, c_org, c_trg)
    mel, post, codes, _ = AE.forward(params, np.asarray(x), np.asarray(c_org),
                                     np.asarray(c_trg), cfg)
    np.testing.assert_allclose(np.asarray(mel), mel_ref.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(post), post_ref.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(codes), codes_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_autoencoder_ragged_time_parity(ae_pair):
    # T = 100 exercises the tail-expansion upsampling (model.py:115-119):
    # forward codes at 31, 63, 95 (x3 + tail 4), backward at 0..96 (truncate).
    m, params = ae_pair
    cfg = AutoEncoderConfig()
    x = torch.rand(1, 80, 100)
    c = torch.randn(1, 256)
    with torch.no_grad():
        mel_ref, post_ref, codes_ref = m(x, c, c)
    mel, post, codes, _ = AE.forward(params, np.asarray(x), np.asarray(c),
                                     np.asarray(c), cfg)
    assert codes.shape == codes_ref.shape
    np.testing.assert_allclose(np.asarray(post), post_ref.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_autoencoder_content_codes_parity(ae_pair):
    m, params = ae_pair
    cfg = AutoEncoderConfig()
    x = torch.rand(2, 80, 96)
    c = torch.randn(2, 256)
    with torch.no_grad():
        codes_ref = m(x, c, None)
    codes, _ = AE.content_codes(params, np.asarray(x), np.asarray(c), cfg)
    np.testing.assert_allclose(np.asarray(codes), codes_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_autoencoder_batch_forward_merge(ae_pair):
    # The chunk-merge must equal the reference nanmean overlap-add: verify
    # against a direct numpy nan-padding implementation of the same merge.
    _, params = ae_pair
    cfg = AutoEncoderConfig()
    M, N = 3, 64
    rng = np.random.default_rng(0)
    chunks = rng.random((M, 80, N), dtype=np.float32)
    c = rng.standard_normal((1, 256), dtype=np.float32)
    merged = np.asarray(AE.batch_forward(params, chunks, c, c, cfg,
                                         overlap=0.5))
    # independent merge of the same per-chunk outputs
    _, post, _, _ = AE.forward(params, chunks, np.repeat(c, M, 0),
                               np.repeat(c, M, 0), cfg)
    post = np.asarray(post)
    step = N // 2
    total = N + (M - 1) * step
    stack = np.full((M, 80, total), np.nan)
    for i in range(M):
        stack[i, :, i * step: i * step + N] = post[i]
    expected = np.nanmean(stack, axis=0)
    np.testing.assert_allclose(merged, expected, rtol=1e-5, atol=1e-6)


def test_batch_forward_many_matches_per_utterance(ae_pair):
    """The fused multi-utterance serving pass must equal per-utterance
    batch_forward exactly (eval-mode BN -> batch composition independent)."""
    _, params = ae_pair
    cfg = AutoEncoderConfig()
    rng = np.random.default_rng(5)
    counts = (3, 2)
    N = 64
    sets = [rng.random((m, 80, N), dtype=np.float32) for m in counts]
    cs = [rng.standard_normal((1, 256)).astype(np.float32) for _ in counts]
    c_trg = rng.standard_normal((1, 256)).astype(np.float32)

    rows = sum(counts)
    pad = -(-rows // 8) * 8 - rows
    stacked = np.concatenate(sets + [np.zeros((pad, 80, N), np.float32)])
    c_rows = np.concatenate(
        [np.broadcast_to(c, (m, 256)) for c, m in zip(cs, counts)]
        + [np.zeros((pad, 256), np.float32)])
    outs = AE.batch_forward_many(params, stacked, c_rows, c_trg, counts,
                                 cfg, 0.5)
    for out, chunks, c_org in zip(outs, sets, cs):
        ref = AE.batch_forward(params, chunks, c_org, c_trg, cfg, 0.5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_batch_forward_packed_matches_per_utterance(ae_pair):
    """The shape-stable slab + dynamic-offset packed merge must reproduce
    per-utterance batch_forward exactly, including with inter-utterance
    gap frames and slab padding."""
    _, params = ae_pair
    cfg = AutoEncoderConfig()
    rng = np.random.default_rng(6)
    counts = (3, 1, 2)
    N = 64
    sets = [rng.random((m, 80, N), dtype=np.float32) for m in counts]
    cs = [rng.standard_normal((1, 256)).astype(np.float32) for _ in counts]
    c_trg = rng.standard_normal((1, 256)).astype(np.float32)

    for gap in (0, 2):
        packed, starts, lengths = AE.batch_forward_packed(
            params, sets, [c[0] for c in cs], c_trg, cfg, overlap=0.5,
            precision="f32", slab_rows=8, gap=gap)
        packed = np.asarray(packed)
        for u, (chunks, c_org) in enumerate(zip(sets, cs)):
            ref = np.asarray(AE.batch_forward(params, chunks, c_org, c_trg,
                                              cfg, 0.5))
            got = packed[:, starts[u]:starts[u] + lengths[u]]
            assert ref.shape == got.shape
            np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
            if gap:  # the gap zones stay silent
                assert np.all(packed[:, starts[u] - gap:starts[u]] == 0)


def test_speaker_encoder_forward_parity():
    m = MirrorSpeakerEncoder()
    m.eval()
    params = tc.speaker_encoder_from_torch(m.state_dict())
    x = torch.randn(4, 160, 40)
    with torch.no_grad():
        ref = m(x)
    out = np.asarray(SE.forward(params, np.asarray(x)))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-5)
    # embeddings are L2-normalised
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_ge2e_loss_reference_semantics():
    # Hand-check the similarity matrix on a tiny example against a direct
    # loop implementation of GE2E section 2.1.
    key_params = {"similarity_weight": np.float32(10.0),
                  "similarity_bias": np.float32(-5.0)}
    rng = np.random.default_rng(1)
    S, U, E = 3, 4, 8
    embeds = rng.standard_normal((S, U, E)).astype(np.float32)
    embeds /= np.linalg.norm(embeds, axis=-1, keepdims=True)
    sim = np.asarray(SE.similarity_matrix(key_params, embeds))

    cent_incl = embeds.mean(1)
    cent_incl /= np.linalg.norm(cent_incl, axis=-1, keepdims=True)
    for j in range(S):
        for u in range(U):
            for k in range(S):
                if k == j:
                    excl = (embeds[j].sum(0) - embeds[j, u]) / (U - 1)
                    excl /= np.linalg.norm(excl)
                    expected = embeds[j, u] @ excl
                else:
                    expected = embeds[j, u] @ cent_incl[k]
                expected = expected * 10.0 - 5.0
                assert sim[j, u, k] == pytest.approx(expected, rel=1e-4), \
                    (j, u, k)

    # Loss equals manual cross-entropy.
    loss = float(SE.ge2e_loss(key_params, embeds))
    flat = sim.reshape(S * U, S)
    tgt = np.repeat(np.arange(S), U)
    logp = flat - np.log(np.exp(flat).sum(-1, keepdims=True))
    np.testing.assert_allclose(loss, -logp[np.arange(S * U), tgt].mean(),
                               rtol=1e-5)


@pytest.fixture(scope="module")
def wavernn_pair():
    m = MirrorWaveRNN()
    _randomize_bn(m)
    m.eval()
    params = tc.wavernn_from_torch(m.state_dict())
    return m, params


def test_wavernn_upsample_parity(wavernn_pair):
    m, params = wavernn_pair
    cfg = WaveRNNConfig()
    mel = torch.rand(1, 80, 20)
    with torch.no_grad():
        cond_ref, aux_ref = m.upsample(mel)
    cond, aux, _ = WR.upsample(params["upsample"], np.asarray(mel), cfg)
    assert cond.shape == tuple(cond_ref.shape)
    np.testing.assert_allclose(np.asarray(cond), cond_ref.numpy(), rtol=1e-3,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(aux), aux_ref.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_wavernn_forward_parity(wavernn_pair):
    m, params = wavernn_pair
    cfg = WaveRNNConfig()
    F_frames = 12
    T = (F_frames - 2 * cfg.pad) * cfg.total_scale
    mel = torch.rand(2, 80, F_frames)
    x = torch.rand(2, T) * 2 - 1
    with torch.no_grad():
        ref = m(x, mel)
    logits, _ = WR.forward(params, np.asarray(x), np.asarray(mel), cfg)
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), rtol=2e-3,
                               atol=2e-4)


def test_fold_with_overlap_geometry():
    # target=2, overlap=1, T=10 -> reference docstring example
    # (wavernn/model.py:370-375).
    x = np.arange(10, dtype=np.float32).reshape(1, 10, 1)
    folded = np.asarray(WR.fold_with_overlap(x, 2, 1))
    assert folded.shape == (3, 4, 1)
    np.testing.assert_array_equal(folded[:, :, 0],
                                  [[0, 1, 2, 3], [3, 4, 5, 6], [6, 7, 8, 9]])


def test_xfade_and_unfold_reconstructs_constant():
    # Crossfading folds of a constant signal must reproduce the constant
    # (equal-power fades sum to 1 in power; with silence+linear head the
    # interior is exactly 1 by construction).
    target, overlap = 64, 16
    folds = WR.fold_with_overlap(
        np.ones((1, 200, 1), np.float32), target, overlap)
    y = np.asarray(folds)[:, :, 0].astype(np.float64)
    out = WR.xfade_and_unfold(y, overlap)
    # skip the fade-in head and padded tail
    interior = out[overlap: 200 - (target + 2 * overlap)]
    np.testing.assert_allclose(interior, 1.0, atol=0.5)
    assert np.all(out[: overlap // 2] == 0)  # silence head


def test_mol_loss_matches_torch_reference():
    # Cross-check the MOL NLL against an independent torch implementation
    # built from the same published formula.
    from autovc_tpu.ops import mol as MOLops
    rng = np.random.default_rng(2)
    B, T, nr_mix = 2, 50, 10
    y_hat = rng.standard_normal((B, T, 3 * nr_mix)).astype(np.float32)
    y = (rng.random((B, T, 1)).astype(np.float32) * 2 - 1)

    ours = float(MOLops.discretized_mix_logistic_loss(y_hat, y))

    yh = torch.tensor(y_hat)
    yt = torch.tensor(y)
    logit, mean, logs = yh.split(nr_mix, dim=-1)
    logs = logs.clamp(min=float(np.log(1e-14)))
    c = yt - mean
    inv = torch.exp(-logs)
    half = 1.0 / 65535
    cdf_p = torch.sigmoid(inv * (c + half))
    cdf_m = torch.sigmoid(inv * (c - half))
    lp_edge_lo = inv * (c + half) - torch.nn.functional.softplus(inv * (c + half))
    lp_edge_hi = -torch.nn.functional.softplus(inv * (c - half))
    delta = cdf_p - cdf_m
    mid = inv * c
    lp_mid = mid - logs - 2 * torch.nn.functional.softplus(mid)
    inner = torch.where(delta > 1e-5,
                        torch.log(torch.clamp(delta, min=1e-12)),
                        lp_mid - np.log(65535 / 2))
    inner = torch.where(yt > 0.999, lp_edge_hi, inner)
    lp = torch.where(yt < -0.999, lp_edge_lo, inner)
    lp = lp + torch.log_softmax(logit, dim=-1)
    ref = -torch.logsumexp(lp, dim=-1).mean()
    assert ours == pytest.approx(float(ref), rel=1e-4)


def test_mol_sampler_statistics():
    # Sampling from a single sharp logistic must concentrate on its mean.
    import jax
    from autovc_tpu.ops import mol as MOLops
    nr_mix = 10
    y = np.full((4096, 3 * nr_mix), -1e9, np.float32)
    y[:, 0] = 0.0            # only mixture 0 active
    y[:, nr_mix] = 0.3       # mean
    y[:, 2 * nr_mix] = -4.0  # log scale -> std ~ pi/sqrt(3)*e^-4 ~ 0.033
    s = np.asarray(MOLops.sample_from_discretized_mix_logistic(
        jax.random.PRNGKey(0), y))
    assert abs(s.mean() - 0.3) < 0.01
    assert 0.01 < s.std() < 0.06
    assert np.all(s >= -1) and np.all(s <= 1)


def test_generate_produces_audio(wavernn_pair):
    import jax
    _, params = wavernn_pair
    cfg = WaveRNNConfig()
    F_frames = 24
    mel = np.random.default_rng(3).random((1, 80, F_frames),
                                          dtype=np.float32)
    wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(0),
                      batched=True, target=2200, overlap=550)
    assert wav.shape == ((F_frames - 1) * cfg.hop_length,)
    assert wav.dtype == np.float32
    assert np.all(np.isfinite(wav))
    assert np.abs(wav).max() <= 1.0
    # the final fade-out must end at ~0
    assert abs(wav[-1]) < 1e-3


def test_auto_fold_target_geometry():
    """Wall-model selection: short audio -> short folds (fewer sequential
    steps, more kernel rows — per-row cost falls per the measured _ROWS_US
    table), long audio -> longer folds than the reference's fixed 11000
    (fewer crossfade seams).  The model follows each caller's ACTUAL
    tiling geometry (r4 advisor fix): the union-slab path
    (generate_many) tiles at _MAX_SLAB_ROWS, the single-generate pallas
    path runs one pass up to its VMEM row cap."""
    from autovc_tpu.config import WaveRNNConfig
    cfg = WaveRNNConfig()
    slab = WR._MAX_SLAB_ROWS
    # slab tiling (generate_many): 7 s picks 2750 -> ~47 folds x 3850
    # steps; the reference's fixed target would give ~15 folds x 12100.
    assert WR.auto_fold_target(7 * 22050, cap=slab) == 2750
    assert WR.auto_fold_target(22050, cap=slab) == 1375     # 1 s clip
    assert WR.auto_fold_target(60 * 22050, cap=slab) == 22000
    # 10 min: 1146 folds either way — the model picks the step-count
    # minimum among full-64-row tilings (11000 edges out 22000 by ~2%)
    assert WR.auto_fold_target(600 * 22050, cap=slab) == 11000
    # single-generate (VMEM cap ~180 rows at the default config): one big
    # pass is measured cheaper than tiling, so 7 s folds even shorter —
    # 1375 -> ~80 rows x 2475 steps (80-row pass: 3.79 us/step measured)
    assert WR.auto_fold_target(7 * 22050, 550, cfg) == 1375
    assert WR.auto_fold_target(1) == 1375              # degenerate input
    # every ladder value keeps the compile-variant count bounded
    for secs in (0.5, 1, 3, 7, 20, 60, 300):
        assert WR.auto_fold_target(int(secs * 22050)) in WR._TARGET_LADDER
        assert WR.auto_fold_target(int(secs * 22050), 550,
                                   cfg) in WR._TARGET_LADDER


def test_row_bucket_ladder():
    """Row bucketing skips the measured 40-row anomaly and tiles beyond
    64 in 8-multiples (handled as <=64-row passes by the callers)."""
    assert [WR._row_bucket(n) for n in (1, 8, 9, 24, 33, 40, 49, 64)] \
        == [8, 8, 16, 24, 48, 48, 64, 64]
    assert WR._row_bucket(65) == 72
    # the wall model is monotone-sane: more audio never predicts less work
    w = [WR._sampling_wall_model(n, 5500, 550)
         for n in (10_000, 100_000, 1_000_000)]
    assert w[0] <= w[1] <= w[2]


def test_generate_auto_target_produces_audio(wavernn_pair):
    """target=None + auto_target=True (the production default) must route
    through the ladder and still produce a correctly-sized waveform."""
    import jax
    _, params = wavernn_pair
    cfg = WaveRNNConfig()
    F_frames = 24
    mel = np.random.default_rng(5).random((1, 80, F_frames),
                                          dtype=np.float32)
    assert cfg.generate.auto_target
    wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(2))
    assert wav.shape == ((F_frames - 1) * cfg.hop_length,)
    assert np.all(np.isfinite(wav))
    # explicit target still wins over auto
    wav2 = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(2),
                       target=2200)
    assert wav2.shape == wav.shape


def test_generate_many_packed_and_async(wavernn_pair):
    """generate_many returns correctly-sized per-utterance waveforms from
    the packed flat readback, and block=False's collector matches
    block=True exactly (same key => same program => same samples)."""
    import jax
    _, params = wavernn_pair
    cfg = WaveRNNConfig()
    rng = np.random.default_rng(6)
    mels = [rng.random((80, F), dtype=np.float32) for F in (10, 24, 17)]
    key = jax.random.PRNGKey(9)
    wavs = WR.generate_many(params, mels, cfg, key=key, target=2200)
    assert [w.shape[0] for w in wavs] == \
        [(F - 1) * cfg.hop_length for F in (10, 24, 17)]
    assert all(np.all(np.isfinite(w)) for w in wavs)
    collect = WR.generate_many(params, mels, cfg, key=key, target=2200,
                               block=False)
    wavs2 = collect()
    for a, b in zip(wavs, wavs2):
        np.testing.assert_array_equal(a, b)


def test_generate_unbatched_matches_length(wavernn_pair):
    import jax
    _, params = wavernn_pair
    cfg = WaveRNNConfig()
    mel = np.random.default_rng(4).random((1, 80, 8), dtype=np.float32)
    wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(1),
                      batched=False)
    assert wav.shape == (7 * cfg.hop_length,)
    assert np.all(np.isfinite(wav))


def test_xfade_and_unfold_device_matches_host(rng):
    """Device-side unfold (jit) == host numpy version (the only difference
    is f32 vs f64 accumulation of two-term sums)."""
    for num_folds, target, overlap in ((3, 64, 16), (1, 64, 16), (7, 110, 22)):
        y = rng.standard_normal(
            (num_folds, target + 2 * overlap)).astype(np.float32)
        host = WR.xfade_and_unfold(y.astype(np.float64), overlap)
        dev = np.asarray(WR.xfade_and_unfold_device(jnp.asarray(y), overlap))
        assert dev.shape == host.shape
        np.testing.assert_allclose(dev, host.astype(np.float32),
                                   rtol=1e-5, atol=1e-6)


def test_short_output_fades_to_zero(wavernn_pair):
    """Sub-fade-length outputs compress the whole 20-hop ramp into their
    length: the tail must still end at exactly zero gain (VERDICT r2 #9
    edge case; reference wavernn/model.py:325-327)."""
    import jax
    _, params = wavernn_pair
    cfg = WaveRNNConfig()
    # 8 frames -> 7*275 = 1925 samples < 20*275 fade length
    mel = np.random.default_rng(8).random((1, 80, 8), dtype=np.float32)
    for batched in (True, False):
        wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(1),
                          batched=batched, target=1100, overlap=275)
        assert wav.shape == (7 * cfg.hop_length,)
        assert wav[-1] == 0.0


def test_resolve_backend_gating():
    """One shared gate decides pallas-vs-xla for every serving path."""
    cfg = WaveRNNConfig()
    # unaligned fold geometry -> xla even when pallas is requested
    assert WR.resolve_backend("pallas", cfg, target=1000, overlap=550) \
        == "xla"
    assert WR.resolve_backend("pallas", cfg, target=2750, overlap=550) \
        == "pallas"
    # non-128-multiple dims -> xla
    small = cfg.with_overrides(rnn_dims=96)
    assert WR.resolve_backend("pallas", small, 2750, 550) == "xla"
    # interpret mode bypasses the hardware-geometry gate
    assert WR.resolve_backend("pallas", small, 2750, 550,
                              interpret=True) == "pallas"
    assert WR.resolve_backend("xla", cfg, 2750, 550) == "xla"


def test_generate_long_audio_xla_slab_tiling():
    """Fold counts beyond _MAX_SLAB_ROWS tile the XLA scan into bounded
    row slabs (unbounded rows hoist rows x steps x 1536 projections and
    OOM HBM on ~45 s clips — r4 regression)."""
    import jax
    cfg = WaveRNNConfig().with_overrides(
        res_blocks=1, rnn_dims=16, fc_dims=16, compute_dims=16,
        res_out_dims=16, generate={"auto_target": False})
    params = WR.init(jax.random.PRNGKey(0), cfg)
    target, overlap = 550, 275
    # enough frames that folds > _MAX_SLAB_ROWS (=64): ~80 folds
    F = 244
    mel = np.random.default_rng(0).random((1, 80, F)).astype(np.float32)
    n_folds = WR._fold_count((F - 1) * cfg.hop_length, target, overlap)
    assert n_folds > WR._MAX_SLAB_ROWS
    out = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(1),
                      target=target, overlap=overlap, backend="xla")
    assert out.shape == ((F - 1) * cfg.hop_length,)
    assert np.isfinite(out).all()


def test_embed_utterances_device_matches_host():
    """The device-mel embed path (r5: power mel + partial-window gather on
    device, 1 s wav buckets) must agree with the host C++/numpy mel path —
    same d-vectors within the dev-vs-host mel tolerance."""
    import jax

    from autovc_tpu.config import SpeakerEncoderConfig
    from autovc_tpu.models import speaker_encoder as SE
    cfg = SpeakerEncoderConfig()
    params = SE.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(5)
    wavs = [rng.uniform(-0.4, 0.4, n).astype(np.float32)
            for n in (32000, 49531, 70000)]
    host = SE.embed_utterances(params, wavs, cfg, device=False)
    dev = SE.embed_utterances(params, wavs, cfg, device=True)
    assert len(host) == len(dev) == 3
    for h, d in zip(host, dev):
        assert np.linalg.norm(h) == pytest.approx(1.0, abs=1e-4)
        cos = float(np.dot(h, d))
        assert cos > 0.9995, cos


def test_embed_utterances_nonblocking_device_matches_blocking():
    """block=False (device path) returns a DEVICE (n, E) array whose rows
    equal the blocking per-utterance results."""
    import jax

    from autovc_tpu.config import SpeakerEncoderConfig
    from autovc_tpu.models import speaker_encoder as SE
    cfg = SpeakerEncoderConfig()
    params = SE.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(6)
    wavs = [rng.uniform(-0.4, 0.4, n).astype(np.float32)
            for n in (32000, 49531)]
    blocking = SE.embed_utterances(params, wavs, cfg, device=True)
    nonblock = np.asarray(SE.embed_utterances(params, wavs, cfg,
                                              device=True, block=False))
    assert nonblock.shape == (2, 256)
    for b, nb in zip(blocking, nonblock):
        np.testing.assert_allclose(nb, b, rtol=1e-5, atol=1e-6)


def test_pick_slab_cost_model():
    """Cost-based slab selection (r5): picks by measured total wall cost
    ceil(rows/s)*cost(s), not the smallest ladder entry >= rows."""
    from autovc_tpu.models.autoencoder import _SLAB_LADDER, _SLAB_MS, \
        _pick_slab
    for rows in (1, 7, 8, 17, 48, 136, 250, 1000):
        best = min(_SLAB_LADDER,
                   key=lambda s: (-(-rows // s) * _SLAB_MS[s], -s))
        assert _pick_slab(rows) == best
    # the r4 regression case: 136 rows must NOT run one half-empty
    # 256-row pass
    assert _pick_slab(136) != 256


def test_mel_sliced_pcm16_parity():
    """PCM16 upload path: chunks match the f32 path within the int16
    quantisation bound."""
    from autovc_tpu.ops import melspec as dev_mel
    rng = np.random.default_rng(7)
    wav = rng.uniform(-0.8, 0.8, 44100).astype(np.float32)
    a, _ = dev_mel.mel_spec_auto_encoder_sliced(wav)
    b, _ = dev_mel.mel_spec_auto_encoder_sliced(wav, pcm16=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=2e-3)


def test_stream_block_divisor_preference():
    """Stream blocks prefer divisors of T (a non-dividing block pads —
    and jnp.pad copies the whole 100+ MB stream)."""
    from autovc_tpu.ops.gru_train_pallas import _pick_tb as gru_tb
    from autovc_tpu.ops.lstm_train_pallas import _pick_tb as lstm_tb
    assert gru_tb(1024, 1375) == 25          # 1375 = 5^3 * 11
    assert gru_tb(1024, 1376) == 32
    assert gru_tb(1024, 160) == 32
    assert lstm_tb(1024, 0, 0, 1375) == 25
    assert lstm_tb(1024, 0, 0, 400) == 25    # 400 % 25 == 0


def test_slab_plan_mixed_beats_uniform():
    """The packed path's mixed-size slab plan must cover the rows and never
    cost more than the best uniform tiling (the r5 regression case: 136
    rows -> (128, 8) at 24.5 ms vs 5 x 32 at 35.4)."""
    from autovc_tpu.models.autoencoder import (_SLAB_LADDER, _SLAB_MS,
                                               _pick_slab, _slab_plan)
    for rows in (1, 8, 17, 48, 136, 200, 250, 300, 1000, 4096):
        plan = _slab_plan(rows)
        assert sum(plan) >= rows
        assert all(s in _SLAB_LADDER for s in plan)
        cost = sum(_SLAB_MS[s] for s in plan)
        uni = _pick_slab(rows)
        uni_cost = -(-rows // uni) * _SLAB_MS[uni]
        assert cost <= uni_cost + 1e-9, (rows, plan, cost, uni_cost)
    assert _slab_plan(136) == (128, 8)
