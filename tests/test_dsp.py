"""DSP golden tests.

Strategy (SURVEY.md §4): librosa itself is unavailable, so correctness is
established two ways:
  1. cross-checks against *independent* implementations (torch.stft for the
     STFT core; hand-built triangle construction for the mel filterbank);
  2. JAX device front-ends (ops/melspec.py) vs the numpy host reference
     (audio/dsp.py) at rtol 1e-3 on real sample audio — the BASELINE bar.
"""
import numpy as np
import pytest
import torch

from autovc_tpu.audio import dsp
from autovc_tpu.config import MelConfig, SpeakerMelConfig


def test_hann_window_matches_torch():
    w = dsp.hann_window(1100)
    ref = torch.hann_window(1100, periodic=True, dtype=torch.float64).numpy()
    np.testing.assert_allclose(w, ref, atol=1e-12)


def test_stft_magnitude_matches_torch(sample_wav):
    y = sample_wav[: 22050]  # 1 second
    mag = dsp.stft_magnitude(y, n_fft=2048, hop_length=275, win_length=1100)
    win = torch.from_numpy(dsp.padded_window(2048, 1100))
    ref = torch.stft(
        torch.from_numpy(y.astype(np.float64)), n_fft=2048, hop_length=275,
        win_length=2048, window=win, center=True, pad_mode="reflect",
        return_complex=True).abs().numpy()
    assert mag.shape == ref.shape
    np.testing.assert_allclose(mag, ref, rtol=1e-6, atol=1e-8)


def test_mel_filterbank_properties():
    fb = dsp.mel_filterbank(22050, 2048, 80, fmin=40.0)
    assert fb.shape == (80, 1025)
    assert np.all(fb >= 0)
    # Each filter is a contiguous triangle with a single peak.
    for i in range(80):
        nz = np.flatnonzero(fb[i])
        assert nz.size > 0
        assert np.array_equal(nz, np.arange(nz[0], nz[-1] + 1))
    # Slaney mel scale landmarks: 1000 Hz maps to mel 15.
    assert dsp.hz_to_mel(1000.0) == pytest.approx(15.0)
    assert dsp.mel_to_hz(15.0) == pytest.approx(1000.0)
    # Linear below the knee: 200 Hz -> 3.
    assert dsp.hz_to_mel(200.0) == pytest.approx(3.0)
    # Round trip.
    freqs = np.array([40.0, 440.0, 999.0, 1001.0, 4000.0, 11025.0])
    np.testing.assert_allclose(dsp.mel_to_hz(dsp.hz_to_mel(freqs)), freqs,
                               rtol=1e-10)


def test_mel_filterbank_slaney_normalisation():
    # With slaney norm, filter areas (integral over linear Hz grid) are equal
    # up to grid discretisation: weights sum * df * enorm-factor ~ 1.
    sr, n_fft, n_mels = 22050, 2048, 80
    fb = dsp.mel_filterbank(sr, n_fft, n_mels, fmin=40.0)
    df = sr / 2.0 / (n_fft // 2)
    areas = fb.sum(axis=1) * df
    np.testing.assert_allclose(areas, 1.0, rtol=0.05)


def test_amp_db_roundtrip():
    amp = np.array([1e-7, 1e-5, 1e-3, 0.5, 1.0, 10.0])
    db = dsp.amp_to_db(amp)
    # floor at 1e-5 -> -100 dB
    assert db[0] == pytest.approx(-100.0)
    np.testing.assert_allclose(dsp.db_to_amp(db[2:]), amp[2:], rtol=1e-12)


def test_normalize_denormalize_roundtrip():
    db = np.linspace(-100, 0, 33)
    norm = dsp.normalize_spec(db)
    assert norm.min() == 0.0 and norm.max() == 1.0
    np.testing.assert_allclose(dsp.denormalize_spec(norm), db, atol=1e-12)


def test_mel_spec_auto_encoder_shape_and_range(sample_wav):
    mel = dsp.mel_spec_auto_encoder(sample_wav[:44100])
    assert mel.shape[0] == 80
    assert mel.dtype == np.float32
    assert mel.min() >= 0.0 and mel.max() <= 1.0
    # Real speech should have energy above the floor.
    assert mel.max() > 0.3


def test_mel_spec_speaker_encoder_shape(sample_wav_16k):
    mel = dsp.mel_spec_speaker_encoder(sample_wav_16k[:32000])
    assert mel.shape[1] == 40
    assert mel.dtype == np.float32
    assert np.all(mel >= 0)


def test_compute_partial_slices_reference_semantics():
    # Mirrors the reference math (spectrogram.py:248-311) on a worked example:
    # sr=16000, step 10ms -> 160 samples/frame; 3.2 s -> 51200 samples.
    wav_slices, mel_slices = dsp.compute_partial_slices(
        51200, 16000, partial_utterance_n_frames=160, mel_window_step=10)
    # n_frames = ceil(51201/160) = 321; frame_step = 80;
    # steps = max(1, 321-160+80+1) = 242 -> candidate starts 0,80,160,240.
    # The 240 window covers (51200-38400)/25600 = 0.5 < 0.75 so it is dropped
    # (spectrogram.py:304-309).
    starts = [s.start for s in mel_slices]
    assert starts == [0, 80, 160]
    assert all(s.stop - s.start == 160 for s in mel_slices)
    assert all(w.start == m.start * 160 and w.stop == m.stop * 160
               for w, m in zip(wav_slices, mel_slices))


def test_compute_partial_slices_short_input_returns_one():
    wav_slices, mel_slices = dsp.compute_partial_slices(
        1000, 16000, partial_utterance_n_frames=160, mel_window_step=10)
    assert len(mel_slices) == 1
    assert mel_slices[0] == slice(0, 160)


def test_sliced_ae_mel_consistency(sample_wav):
    cfg = MelConfig()
    chunks, mel_slices = dsp.mel_spec_auto_encoder_sliced(sample_wav)
    assert chunks.ndim == 3
    assert chunks.shape[1] == 80
    assert chunks.shape[2] == cfg.partial_utterance_n_frames
    # Chunks must agree with slicing the full mel of the padded wav.
    wav_slices, _ = dsp.compute_partial_slices(
        len(sample_wav), cfg.sr,
        partial_utterance_n_frames=cfg.partial_utterance_n_frames,
        mel_window_step=cfg.mel_window_step)
    padded = dsp.pad_for_slices(sample_wav, wav_slices)
    full = dsp.mel_spec_auto_encoder(padded)
    for c, s in zip(chunks, mel_slices):
        np.testing.assert_array_equal(c, full[:, s])


def test_jax_mel_matches_numpy_ae(sample_wav):
    from autovc_tpu.ops import melspec
    y = sample_wav[: 22050 * 2]
    ref = dsp.mel_spec_auto_encoder(y)
    out = np.asarray(melspec.mel_spec_auto_encoder(y))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-3)


def test_jax_mel_matches_numpy_se(sample_wav_16k):
    from autovc_tpu.ops import melspec
    y = sample_wav_16k[: 16000 * 2]
    ref = dsp.mel_spec_speaker_encoder(y)
    out = np.asarray(melspec.mel_spec_speaker_encoder(y))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=5e-3, atol=1e-4 * ref.max())


def test_jax_stft_matches_numpy(sample_wav):
    from autovc_tpu.ops import melspec
    y = sample_wav[:22050]
    ref = dsp.stft_magnitude(y, 2048, 275, 1100)
    out = np.asarray(melspec.stft_magnitude(y, 2048, 275, 1100))
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3 * ref.max())


def test_device_sliced_mel_matches_host(sample_wav):
    """The PRODUCTION device mel+slicing path (ops.melspec.
    mel_spec_auto_encoder_sliced, the front-end of every convert path)
    must match the host dsp implementation (restored from the deleted
    melspec_pallas test file — it covered this path, not the kernel)."""
    import jax
    from autovc_tpu.config import MelConfig
    from autovc_tpu.ops import melspec as dev_mel
    cfg = MelConfig(partial_utterance_n_frames=64)
    y = sample_wav[: 22050 * 3]
    dev_chunks, dev_slices = dev_mel.mel_spec_auto_encoder_sliced(y, cfg)
    host_chunks, host_mslices = dsp.mel_spec_auto_encoder_sliced(y, cfg)
    assert np.asarray(dev_chunks).shape == host_chunks.shape
    assert [(s.start, s.stop) for s in dev_slices] \
        == [(s.start, s.stop) for s in host_mslices]
    np.testing.assert_allclose(np.asarray(dev_chunks), host_chunks,
                               rtol=1e-3, atol=1e-4)
