"""Tests for host-side audio I/O and preprocessing tools."""
import os

import numpy as np
import pytest

from autovc_tpu.audio import Audio, io, tools


def test_load_wav_mono_float(sample_wav):
    assert sample_wav.dtype == np.float32
    assert sample_wav.ndim == 1
    assert np.max(np.abs(sample_wav)) <= 1.0


def test_save_load_roundtrip(tmp_path, rng):
    wav = (rng.standard_normal(22050) * 0.1).astype(np.float32)
    path = str(tmp_path / "t.wav")
    io.save_wav(path, wav, 22050)
    back, sr = io.load_wav(path)
    assert sr == 22050
    np.testing.assert_allclose(back, wav, atol=1e-4)


def test_resample_preserves_tone():
    # A 440 Hz tone resampled 48000 -> 22050 must stay a 440 Hz tone.
    t = np.arange(48000) / 48000
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = io.resample(tone, 48000, 22050)
    assert abs(len(out) - 22050) <= 2
    spec = np.abs(np.fft.rfft(out * np.hanning(len(out))))
    freq = np.fft.rfftfreq(len(out), 1 / 22050)
    assert abs(freq[np.argmax(spec)] - 440) < 5


def test_normalize_volume_hits_target(rng):
    wav = rng.standard_normal(16000).astype(np.float32) * 0.01
    out = tools.normalize_volume(wav, target_dBFS=-20)
    dbfs = 10 * np.log10(np.mean(out ** 2))
    assert dbfs == pytest.approx(-20, abs=0.1)


def test_normalize_volume_increase_only(rng):
    wav = rng.standard_normal(16000).astype(np.float32)  # ~0 dBFS, loud
    out = tools.normalize_volume(wav, target_dBFS=-30, increase_only=True)
    np.testing.assert_array_equal(out, wav)  # would need decrease -> no-op


def test_trim_long_silences_removes_gap():
    sr = 16000
    rng = np.random.default_rng(1)
    speech = (rng.standard_normal(sr) * 0.3).astype(np.float32)
    silence = np.zeros(2 * sr, dtype=np.float32)
    wav = np.concatenate([speech, silence, speech])
    out = tools.trim_long_silences(wav, sr)
    # Most of the 2 s silence should be gone, most speech kept.
    assert len(out) < len(wav) - sr
    assert len(out) > 1.5 * sr


def test_remove_noise_reduces_noise_floor():
    sr = 16000
    rng = np.random.default_rng(2)
    t = np.arange(2 * sr) / sr
    clean = np.sin(2 * np.pi * 300 * t).astype(np.float32) * 0.5
    clean[: sr // 2] = 0.0  # quiet region to estimate floor from
    noise = rng.standard_normal(2 * sr).astype(np.float32) * 0.02
    out = tools.remove_noise(clean + noise, sr)
    # Noise in the quiet region must drop.
    before = np.mean((clean + noise)[: sr // 2] ** 2)
    after = np.mean(out[: sr // 2] ** 2)
    assert after < before * 0.5
    assert len(out) == len(clean)


def test_split_audio_fixed_length(rng):
    sr = 16000
    wav = rng.standard_normal(5 * sr).astype(np.float32)
    parts = tools.split_audio(wav, sr, fixed_length=1)
    assert len(parts) == 4  # last partial chunk dropped (reference semantics)
    assert all(len(p) == sr for p in parts)


def test_combine_audio_arrays():
    a = np.ones(100, np.float32)
    b = np.zeros(50, np.float32)
    out = tools.combine_audio([a, b], sr=16000)
    assert len(out) == 150


def test_audio_class_pipeline(tmp_path):
    sr = 22050
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(sr).astype(np.float32) * 0.01
    audio = Audio(wav, sr_org=sr)
    audio.preprocess("normalize_volume", target_dBFS=-20)
    dbfs = 10 * np.log10(np.mean(audio.wav ** 2))
    assert dbfs == pytest.approx(-20, abs=0.2)
    path = str(tmp_path / "out.wav")
    audio.save(path)
    assert os.path.exists(path)


def test_audio_trim_snaps_sample_rate():
    rng = np.random.default_rng(4)
    wav = rng.standard_normal(22050).astype(np.float32) * 0.3
    audio = Audio(wav, sr_org=22050)
    audio.preprocess("trim_long_silences")
    assert audio.sr == 16000  # snapped to nearest VAD rate


def test_audio_unknown_tool_raises():
    audio = Audio(np.zeros(100, np.float32), sr_org=16000)
    with pytest.raises(ValueError):
        audio.preprocess("not_a_tool")


def test_retrieve_file_paths_dir():
    from autovc_tpu.utils import retrieve_file_paths
    files = retrieve_file_paths("/root/reference/data/samples")
    assert len(files) == 8
    assert all(f.endswith(".wav") for f in files)
    one = retrieve_file_paths(files[0])
    assert one == [files[0]]


def test_vad_backend_validation():
    import numpy as np
    import pytest
    wav = np.random.default_rng(0).uniform(-0.3, 0.3, 16000).astype(
        np.float32)
    with pytest.raises(ValueError):
        tools.create_silence_mask(wav, 16000, backend="nope")
    if not tools.webrtc_available():
        with pytest.raises(ImportError):
            tools.create_silence_mask(wav, 16000, backend="webrtc")


def test_vad_webrtc_agreement():
    """Mask agreement between the default energy VAD and the reference's
    WebRTC decision path on the bundled samples (VAD_DEVIATION.md); runs
    whenever the optional webrtcvad wheel is installed."""
    import glob

    import numpy as np
    import pytest
    if not tools.webrtc_available():
        pytest.skip("webrtcvad not installed (see docs/VAD_DEVIATION.md)")
    from autovc_tpu.audio import io
    agrees = []
    for p in sorted(glob.glob("/root/reference/data/samples/*.wav")):
        wav, _ = io.load_wav(p, sr=16000)
        _, m_e = tools.create_silence_mask(wav, 16000)
        _, m_w = tools.create_silence_mask(wav, 16000, backend="webrtc")
        agrees.append((m_e == m_w).mean())
    assert np.mean(agrees) >= 0.8, agrees
