"""Fused Pallas mel kernel vs the XLA and host mel front-ends (interpret
mode on CPU; real-chip numerics are covered by the same librosa budget)."""
import numpy as np

from autovc_tpu.audio import dsp
from autovc_tpu.config import MelConfig, SpeakerMelConfig
from autovc_tpu.ops import melspec as M
from autovc_tpu.ops import melspec_pallas as MP


def test_ae_mel_pallas_matches_host(sample_wav):
    cfg = MelConfig()
    ref = dsp.mel_spec_auto_encoder(sample_wav, cfg)
    out = np.asarray(MP.mel_spec_auto_encoder_pallas(sample_wav, cfg,
                                                     interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_se_mel_pallas_matches_host(sample_wav_16k):
    cfg = SpeakerMelConfig()
    ref = dsp.mel_spec_speaker_encoder(sample_wav_16k, cfg)
    out = np.asarray(MP.mel_spec_speaker_encoder_pallas(
        sample_wav_16k, cfg, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_device_sliced_mel_matches_host(sample_wav):
    """ops.melspec.mel_spec_auto_encoder_sliced (device mel + device chunk
    slicing) must equal the host dsp path exactly (same index math, same
    padded wav)."""
    cfg = MelConfig()
    host_chunks, host_slices = dsp.mel_spec_auto_encoder_sliced(
        sample_wav, cfg)
    dev_chunks, dev_slices = M.mel_spec_auto_encoder_sliced(sample_wav, cfg)
    assert [(s.start, s.stop) for s in host_slices] == \
        [(s.start, s.stop) for s in dev_slices]
    np.testing.assert_allclose(np.asarray(dev_chunks), host_chunks,
                               rtol=1e-3, atol=1e-4)


def test_ae_mel_pallas_matches_xla_path(sample_wav):
    cfg = MelConfig()
    ref = np.asarray(M.mel_spec_auto_encoder(sample_wav, cfg))
    out = np.asarray(MP.mel_spec_auto_encoder_pallas(sample_wav, cfg,
                                                     interpret=True))
    # the kernel's 3-pass hi/lo-bf16 dots carry ~5e-4 absolute error vs the
    # XLA path's full-f32 passes — hold it to the librosa parity budget
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
