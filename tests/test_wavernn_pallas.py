"""Pallas WaveRNN rows-sampling kernel vs the XLA lax.scan reference
(interpret mode on CPU; the real-chip path is exercised by bench.py).

The kernel consumes FRAME-rate conditioning (raw mel rows + MelResNet aux
rows) and applies the banded frame->sample upsampling in VMEM, so the
reference for an equivalence test is: expand the same rows to sample rate
with the composite banded kernel (exactly what the full-sequence upsampler
does per fold row) and run the XLA scan on the expansion.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autovc_tpu.config import WaveRNNConfig
from autovc_tpu.models import wavernn as WR
from autovc_tpu.ops import wavernn_pallas as WRP

# upsample_factors (2, 2): total_scale 4 keeps interpret-mode step counts
# small; composite reach 6 -> J = 2 <= pad, same banded structure as the
# production (5, 5, 11) geometry.
SMALL = WaveRNNConfig().with_overrides(
    rnn_dims=64, fc_dims=64, compute_dims=16, res_out_dims=16,
    res_blocks=2, upsample_factors=(2, 2), hop_length=4)


def _rows_to_sample_rate(params, cfg, mel_rows, aux_rows):
    """Expand frame-rate rows to the sample-rate (cond, aux) the XLA scan
    consumes, using the same composite banded kernel the Pallas kernel
    applies in VMEM."""
    K, J = WR._composite_upsample_kernel(params["upsample"]["up_convs"],
                                         cfg.upsample_factors)
    W = 2 * J + 1
    S = cfg.total_scale
    fpf = mel_rows.shape[1] - 2 * J
    wins = jnp.stack([mel_rows[:, w:w + fpf] for w in range(W)])
    cond = jnp.einsum("wp,wbfc->bfpc", K[::-1], wins,
                      precision=jax.lax.Precision.HIGHEST)
    cond = cond.reshape(mel_rows.shape[0], fpf * S, -1)
    aux = jnp.repeat(aux_rows, S, axis=1)
    return cond, aux


@pytest.fixture(scope="module")
def setup():
    cfg = SMALL
    params = WR.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    _, J = WR._composite_upsample_kernel(params["upsample"]["up_convs"],
                                         cfg.upsample_factors)
    B, fpf = 3, 10
    mel_rows = rng.random((B, fpf + 2 * J, cfg.feat_dims), dtype=np.float32)
    aux_rows = rng.random((B, fpf, cfg.res_out_dims), dtype=np.float32)
    return cfg, params, jnp.asarray(mel_rows), jnp.asarray(aux_rows)


def test_pallas_matches_xla_scan_f32(setup):
    cfg, params, mel_rows, aux_rows = setup
    key = jax.random.PRNGKey(42)
    cond, aux = _rows_to_sample_rate(params, cfg, mel_rows, aux_rows)
    ref = np.asarray(WR._generate_scan(params, cond, aux, key, cfg,
                                       fast_math=False, unroll=1))
    out = np.asarray(WRP.generate_rows_pallas(params, mel_rows, aux_rows,
                                              key, cfg, fast_math=False,
                                              interpret=True))
    assert out.shape == ref.shape
    # identical noise + f32 math -> near-exact agreement (residual diff is
    # the project-then-upsample vs upsample-then-project rounding order)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_matches_xla_scan_raw_mode(setup):
    cfg, params, mel_rows, aux_rows = setup
    cfg = cfg.with_overrides(mode="RAW", bits=4)  # 16 classes
    params = WR.init(jax.random.PRNGKey(0), cfg)
    key = jax.random.PRNGKey(7)
    cond, aux = _rows_to_sample_rate(params, cfg, mel_rows, aux_rows)
    ref = np.asarray(WR._generate_scan(params, cond, aux, key, cfg,
                                       fast_math=False, unroll=1))
    out = np.asarray(WRP.generate_rows_pallas(params, mel_rows, aux_rows,
                                              key, cfg, fast_math=False,
                                              interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_bf16_statistics(setup):
    # bf16 fast-math path: samples agree in distribution with f32.
    cfg, params, mel_rows, aux_rows = setup
    key = jax.random.PRNGKey(3)
    f32 = np.asarray(WRP.generate_rows_pallas(params, mel_rows, aux_rows,
                                              key, cfg, fast_math=False,
                                              interpret=True))
    bf16 = np.asarray(WRP.generate_rows_pallas(params, mel_rows, aux_rows,
                                               key, cfg, fast_math=True,
                                               interpret=True))
    assert np.all(np.isfinite(bf16))
    assert np.all(np.abs(bf16) <= 1.0)
    assert abs(f32.mean() - bf16.mean()) < 0.1
    assert abs(f32.std() - bf16.std()) < 0.15


def test_generate_program_backend_equivalence(setup):
    """End-to-end: the pallas backend's frame-rate fold + in-kernel
    upsample reproduces the xla backend's pad->upsample->fold->scan chain
    through the public generate() (same key, f32)."""
    cfg, params, _, _ = setup
    mel = np.random.default_rng(5).random((1, cfg.feat_dims, 23),
                                          dtype=np.float32)
    kw = dict(cfg=cfg, key=jax.random.PRNGKey(0), batched=True,
              target=16, overlap=8, fast_math=False)
    ref = WR.generate(params, mel, backend="xla", unroll=1, **kw)
    out = WR.generate(params, mel, backend="pallas", interpret=True, **kw)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_generate_with_pallas_backend(setup):
    cfg, params, _, _ = setup
    mel = np.random.default_rng(5).random((1, cfg.feat_dims, 12),
                                          dtype=np.float32)
    wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(0),
                      batched=True, target=16, overlap=8,
                      backend="pallas", interpret=True)
    assert wav.shape == (11 * cfg.hop_length,)
    assert np.all(np.isfinite(wav))


def test_pallas_backend_falls_back_on_unaligned_geometry(setup):
    """target/overlap not divisible by total_scale -> xla path, still
    correct output shape."""
    cfg, params, _, _ = setup
    mel = np.random.default_rng(6).random((1, cfg.feat_dims, 12),
                                          dtype=np.float32)
    wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(0),
                      batched=True, target=15, overlap=7,
                      backend="pallas", interpret=True)
    assert wav.shape == (11 * cfg.hop_length,)
    assert np.all(np.isfinite(wav))


def test_fold_rows_is_frame_image_of_sample_fold():
    """_fold_rows must be the exact frame-unit image of fold_with_overlap:
    same fold count, and row r's frames upsample to exactly row r's
    samples (margin frames included)."""
    import jax.numpy as jnp

    S = 4
    t_f, o_f, J = 4, 2, 2
    F = 23
    rng = np.random.default_rng(0)
    frames = rng.random((1, F, 3), dtype=np.float32)
    # sample-rate signal whose value encodes its source frame
    samples = jnp.repeat(jnp.asarray(frames), S, axis=1)     # (1, F*S, 3)

    rows_f = np.asarray(WR._fold_rows(jnp.asarray(frames), t_f, o_f, 0))
    rows_s = np.asarray(WR.fold_with_overlap(samples, t_f * S, o_f * S))
    assert rows_f.shape[0] == rows_s.shape[0]
    np.testing.assert_array_equal(np.repeat(rows_f, S, axis=1), rows_s)

    # margin rows: interior margins carry the neighbouring REAL frames
    rows_m = np.asarray(WR._fold_rows(jnp.asarray(frames), t_f, o_f, J))
    assert rows_m.shape[1] == t_f + 2 * o_f + 2 * J
    np.testing.assert_array_equal(rows_m[:, J:-J], rows_f)
    np.testing.assert_array_equal(rows_m[1, :J], rows_f[0, t_f:t_f + J])
    # leading margin of row 0 is zero-filled (out of sequence range)
    assert np.all(rows_m[0, :J] == 0)


def test_generate_many_backend_equivalence(setup):
    """Batch serving: the pallas slab path (frame-rate rows, in-kernel
    upsample) reproduces the xla slab path through generate_many (same
    key + slab geometry -> identical per-slab noise, f32)."""
    cfg, params, _, _ = setup
    rng = np.random.default_rng(9)
    mels = [rng.random((cfg.feat_dims, F), dtype=np.float32)
            for F in (14, 23)]
    kw = dict(cfg=cfg, key=jax.random.PRNGKey(4), target=16, overlap=8,
              fast_math=False, slab_rows=8)
    ref = WR.generate_many(params, mels, unroll=1, backend="xla", **kw)
    out = WR.generate_many(params, mels, backend="pallas", interpret=True,
                           **kw)
    assert [len(o) for o in out] == [len(r) for r in ref]
    for o, r in zip(out, ref):
        np.testing.assert_allclose(o, r, rtol=1e-3, atol=2e-4)


def test_long_audio_slabs_kernel_passes(setup, monkeypatch):
    """When the fold count exceeds the kernel's VMEM row budget, the
    single-utterance program tiles the rows over several kernel passes
    (regression: r3's first rows kernel made ALL conditioning VMEM-resident
    with no tiling, so long audio failed to compile)."""
    cfg, params, _, _ = setup
    monkeypatch.setattr(WR, "_pallas_max_rows", lambda *a, **k: 8)
    mel = np.random.default_rng(11).random((1, cfg.feat_dims, 120),
                                           dtype=np.float32)
    # target 8, overlap 4 -> ~39 fold rows > the forced 8-row budget
    wav = WR.generate(params, mel, cfg, key=jax.random.PRNGKey(1),
                      batched=True, target=8, overlap=4,
                      backend="pallas", interpret=True)
    assert wav.shape == (119 * cfg.hop_length,)
    assert np.all(np.isfinite(wav))
    assert np.sqrt(np.mean(wav ** 2)) > 1e-4


def test_unaligned_dims_fall_back_to_xla():
    """rd/fc not multiples of 128 -> hardware pallas backend silently
    falls back to the XLA scan instead of asserting mid-conversion."""
    cfg = SMALL  # rd=64 — unsupported by the hardware kernel
    assert not WR._pallas_ok(cfg, interpret=False)
    assert WR._pallas_ok(cfg, interpret=True)
    assert WR._pallas_ok(WaveRNNConfig(), interpret=False)
