"""ctypes bindings + on-demand build for the native DSP core.

Builds ``libautovc_dsp.so`` from ``melspec.cc`` with g++ on first use
(cached next to the source; no build system needed for one TU) and exposes
librosa-parity mel front-ends.  Falls back to the numpy implementation in
:mod:`autovc_tpu.audio.dsp` when no compiler is available — behaviour is
identical, this is purely a host-side throughput component for dataset
precompute (the reference's eager per-file loop, dataloader.py:63-103).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

from autovc_tpu.audio import dsp
from autovc_tpu.config import MelConfig, SpeakerMelConfig

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "melspec.cc")
_SO = os.path.join(_HERE, "libautovc_dsp.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> str | None:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
           "-pthread", _SRC, "-o", _SO]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _SO
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            so = _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        lib.autovc_mel_spectrogram.restype = ctypes.c_int64
        lib.autovc_mel_spectrogram.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.autovc_amp_to_db_normalize.restype = None
        lib.autovc_amp_to_db_normalize.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _mel(wav: np.ndarray, n_fft: int, hop: int, win_length: int, power: int,
         fb: np.ndarray, n_threads: int = 0) -> np.ndarray:
    lib = get_lib()
    wav = np.ascontiguousarray(wav, np.float32)
    fb = np.ascontiguousarray(fb, np.float32)
    n_frames = 1 + (len(wav) + 2 * (n_fft // 2) - n_fft) // hop
    out = np.empty((n_frames, fb.shape[0]), np.float32)
    written = lib.autovc_mel_spectrogram(
        _fptr(wav), len(wav), n_fft, hop, win_length, power, _fptr(fb),
        fb.shape[0], _fptr(out), n_threads)
    assert written == n_frames, (written, n_frames)
    return out


def _numpy_ae(wav, cfg):
    mag = dsp.stft_magnitude(wav, cfg.n_fft, cfg.hop_length,
                             cfg.window_length)
    fb = dsp.mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, fmin=cfg.fmin)
    return dsp.normalize_spec(dsp.amp_to_db(fb @ mag)).astype(np.float32)


def _numpy_se(wav, cfg):
    mag = dsp.stft_magnitude(wav, cfg.n_fft, cfg.hop_length, cfg.n_fft)
    fb = dsp.mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels)
    return (fb @ (mag ** 2)).astype(np.float32).T


def mel_spec_auto_encoder(wav: np.ndarray, cfg: MelConfig = MelConfig(),
                          n_threads: int = 0) -> np.ndarray:
    """Native AE mel: amplitude mel -> dB -> [0,1], (n_mels, n_frames)."""
    if not available():
        return _numpy_ae(wav, cfg)
    fb = dsp.mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels, fmin=cfg.fmin)
    out = _mel(wav, cfg.n_fft, cfg.hop_length, cfg.window_length, 1, fb,
               n_threads)
    get_lib().autovc_amp_to_db_normalize(_fptr(out), out.size)
    return out.T.copy()


def mel_spec_speaker_encoder(wav: np.ndarray,
                             cfg: SpeakerMelConfig = SpeakerMelConfig(),
                             n_threads: int = 0) -> np.ndarray:
    """Native SE mel: power mel, (n_frames, n_mels)."""
    if not available():
        return _numpy_se(wav, cfg)
    fb = dsp.mel_filterbank(cfg.sr, cfg.n_fft, cfg.n_mels)
    return _mel(wav, cfg.n_fft, cfg.hop_length, cfg.n_fft, 2, fb, n_threads)
