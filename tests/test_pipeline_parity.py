"""Whole-pipeline parity gate (SURVEY §4 / BASELINE "allclose vs the
PyTorch reference").

The per-component parity tests (test_model_parity.py) check each link;
this gate runs the ENTIRE conversion chain through BOTH stacks from one
random-init torch-mirror checkpoint and asserts the end products agree:

  wav -> SE-mel partials -> speaker embedding      (both stacks)
      -> AE-mel -> AutoVC forward (converted mel)  (both stacks)
      -> teacher-forced WaveRNN logits             (both stacks)

Each stack feeds its OWN intermediate outputs forward, so error compounds
exactly as it would in production — a single red/green signal that the
chain, not just each link, matches.  The reference's pretrained blobs are
absent (/root/reference/.MISSING_LARGE_BLOBS), so the weights are a
randomly initialised mirror checkpoint; scripts/eval_reference_parity.py
(folded in below via test_reference_parity_harness) accepts any
reference-format .pt, including a real one.
"""
import os
import sys

import numpy as np
import pytest
import torch

from autovc_tpu.audio import dsp, io
from autovc_tpu.config import (AutoEncoderConfig, SpeakerEncoderConfig,
                               WaveRNNConfig)
from autovc_tpu.models import autoencoder as AE
from autovc_tpu.models import speaker_encoder as SE
from autovc_tpu.models import wavernn as WR
from autovc_tpu.utils import torch_compat as tc

from torch_mirrors import (MirrorAutoVC, MirrorSpeakerEncoder,
                           MirrorWaveRNN)

SAMPLES = "/root/reference/data/samples"

torch.manual_seed(7)


def _randomize_bn(module):
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 2.0)


@pytest.fixture(scope="module")
def stacks():
    ae_m = MirrorAutoVC()
    _randomize_bn(ae_m)
    ae_m.eval()
    se_m = MirrorSpeakerEncoder()
    se_m.eval()
    wr_m = MirrorWaveRNN()
    _randomize_bn(wr_m)
    wr_m.eval()
    return {
        "torch": (ae_m, se_m, wr_m),
        "jax": (tc.autoencoder_from_torch(ae_m.state_dict()),
                tc.speaker_encoder_from_torch(se_m.state_dict()),
                tc.wavernn_from_torch(wr_m.state_dict())),
    }


@pytest.fixture(scope="module")
def sample_wav():
    paths = sorted(p for p in os.listdir(SAMPLES) if p.endswith(".wav"))
    if not paths:
        pytest.skip(f"no sample wavs under {SAMPLES}")
    wav, _ = io.load_wav(os.path.join(SAMPLES, paths[0]),
                         sr=AutoEncoderConfig().spectrogram.sr)
    return wav[: int(2.0 * AutoEncoderConfig().spectrogram.sr)]


def test_whole_pipeline_parity(stacks, sample_wav):
    ae_m, se_m, wr_m = stacks["torch"]
    ae_p, se_p, wr_p = stacks["jax"]
    ae_cfg, se_cfg, wr_cfg = (AutoEncoderConfig(), SpeakerEncoderConfig(),
                              WaveRNNConfig())

    # ---- stage 1: speaker embedding from the wav (both stacks) ----------
    # shared DSP front end (its own parity is covered by test_dsp.py
    # goldens) isolates MODEL-chain parity from resample noise.
    se_wav = sample_wav
    partials, _, _ = dsp.mel_spec_speaker_encoder_sliced(
        se_wav, se_cfg.spectrogram)
    with torch.no_grad():
        pe_ref = se_m(torch.tensor(np.asarray(partials))).numpy()
    emb_ref = pe_ref.mean(0)
    emb_ref /= np.linalg.norm(emb_ref)
    emb = SE.embed_utterance(se_p, se_wav, se_cfg)
    assert float(np.mean((emb - emb_ref) ** 2)) < 1e-8

    # ---- stage 2: AE conversion mel, each stack with ITS OWN embedding --
    mel = dsp.mel_spec_auto_encoder(sample_wav, ae_cfg.spectrogram)
    T = (mel.shape[-1] // ae_cfg.freq) * ae_cfg.freq
    mel = mel[:, :T].astype(np.float32)
    with torch.no_grad():
        _, post_ref, _ = ae_m(torch.tensor(mel[None]),
                              torch.tensor(emb_ref[None]),
                              torch.tensor(emb_ref[None]))
    post_ref = post_ref.numpy()[0]
    _, post, _, _ = AE.forward(ae_p, mel[None], emb[None], emb[None],
                               ae_cfg)
    post = np.asarray(post)[0]
    assert float(np.mean((post - post_ref) ** 2)) < 1e-6

    # ---- stage 3: teacher-forced vocoder logits on each stack's mel -----
    F = 12
    t_samples = (F - 2 * wr_cfg.pad) * wr_cfg.total_scale
    x_prev = np.random.default_rng(3).uniform(
        -1, 1, (1, t_samples)).astype(np.float32)
    with torch.no_grad():
        logits_ref = wr_m(torch.tensor(x_prev),
                          torch.tensor(post_ref[None, :, :F])).numpy()
    logits, _ = WR.forward(wr_p, x_prev, post[None, :, :F], wr_cfg)
    logits = np.asarray(logits)
    assert logits.shape == logits_ref.shape
    assert float(np.mean((logits - logits_ref) ** 2)) < 1e-4


def test_reference_parity_harness(stacks, tmp_path):
    """scripts/eval_reference_parity.py folded in: save the mirror as a
    reference-format checkpoint, run the standing harness end-to-end
    (load_model conversion + DSP + AE forward over sample wavs), assert
    the global allclose verdict."""
    ae_m, _, _ = stacks["torch"]
    ckpt = tmp_path / "AutoVC_mirror.pt"
    torch.save({"model_state": ae_m.state_dict()}, ckpt)

    scripts = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts")
    sys.path.insert(0, scripts)
    try:
        from eval_reference_parity import evaluate
    finally:
        sys.path.pop(0)

    report = evaluate(str(ckpt), samples=SAMPLES, max_files=2,
                      max_seconds=1.5)
    assert report["allclose_rtol1e3"], report
    assert report["mel_mse"] < 1e-6
