"""Native C++ DSP core vs the numpy golden reference (rtol 1e-3 — the
BASELINE parity bar) plus a throughput sanity check."""
import time

import numpy as np
import pytest

from autovc_tpu import native
from autovc_tpu.audio import dsp
from autovc_tpu.config import MelConfig, SpeakerMelConfig

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def test_native_ae_mel_parity(sample_wav):
    y = sample_wav[: 22050 * 3]
    ref = dsp.mel_spec_auto_encoder(y)
    out = native.mel_spec_auto_encoder(y)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_native_se_mel_parity(sample_wav_16k):
    y = sample_wav_16k[: 16000 * 2]
    ref = dsp.mel_spec_speaker_encoder(y)
    out = native.mel_spec_speaker_encoder(y)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-3,
                               atol=1e-5 * float(ref.max()))


def test_native_short_input():
    y = np.zeros(100, np.float32)
    out = native.mel_spec_auto_encoder(y)
    assert out.shape[0] == 80
    assert np.isfinite(out).all()


def test_native_threading_consistent(sample_wav):
    y = sample_wav[: 22050]
    a = native.mel_spec_auto_encoder(y, n_threads=1)
    b = native.mel_spec_auto_encoder(y, n_threads=8)
    np.testing.assert_array_equal(a, b)


@pytest.mark.perf
def test_native_faster_than_numpy(sample_wav):
    # Wall-clock assertion: excluded from the default tier (concurrent CPU
    # load makes it flaky); generous 3x margin when run explicitly.
    y = np.tile(sample_wav, 4)  # ~28 s of audio
    native.mel_spec_auto_encoder(y)  # warm the .so
    t0 = time.time()
    native.mel_spec_auto_encoder(y)
    t_native = time.time() - t0
    t0 = time.time()
    dsp.mel_spec_auto_encoder(y)
    t_numpy = time.time() - t0
    # multithreaded native should be in the same league as numpy
    assert t_native < t_numpy * 3.0, (t_native, t_numpy)


def test_sliced_native_matches_numpy(sample_wav_16k):
    from autovc_tpu.config import SpeakerMelConfig
    cfg = SpeakerMelConfig()
    a, _, _ = dsp.mel_spec_speaker_encoder_sliced(sample_wav_16k, cfg)
    b, _, _ = dsp.mel_spec_speaker_encoder_sliced(sample_wav_16k, cfg,
                                                  use_native=True)
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, rtol=2e-3,
                               atol=1e-5 * float(a.max()))
