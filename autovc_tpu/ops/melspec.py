"""TPU mel-spectrogram front-end: STFT as MXU matmuls.

Design (TPU-first, not a librosa port):
  * framing is a strided gather into (n_frames, n_fft) — static shapes only;
  * the rFFT is expressed as two real matmuls against precomputed
    cos/sin DFT matrices.  For n_fft = 2048 that is a (T, 2048) x (2048, 1025)
    matmul pair — orders of magnitude more FLOPs than an FFT, but it runs on
    the 128x128 systolic array, fuses with the windowing and the mel
    projection, and beats jnp.fft for the frame counts seen here;
  * the mel filterbank application folds into a third matmul
    (T, 1025) x (1025, n_mels);
  * dB + normalisation are fused elementwise epilogues.

Numerics match the host reference :mod:`autovc_tpu.audio.dsp`, which mirrors
the librosa semantics of the PyTorch reference
(``autovc/audio/spectrogram.py:62-219``): centre/reflect padding, periodic
Hann, slaney mel, amplitude mel for the auto-encoder path and power mel for
the speaker-encoder path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# The DFT/mel projections are accuracy-critical (they feed parity-tested
# mel features); force full fp32 MXU passes rather than the TPU's default
# bf16-accumulated matmul.
_dot = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

from autovc_tpu.audio import dsp
from autovc_tpu.config import MelConfig, SpeakerMelConfig


# NOTE: these caches hold *numpy* arrays (never jnp) — a jnp constant created
# while tracing under jit would cache a tracer and leak it into later calls.


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int, win_length: int, dtype=np.float32):
    """Windowed DFT matrices: returns (cos, sin) of shape (n_fft, n_bins).

    The Hann window is folded into the basis so the kernel is
    frames @ cos and frames @ sin directly.
    """
    n_bins = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    window = dsp.padded_window(n_fft, win_length)[:, None]
    cos = np.cos(ang) * window
    sin = -np.sin(ang) * window
    return cos.astype(dtype), sin.astype(dtype)


@functools.lru_cache(maxsize=8)
def _mel_fb(sr: int, n_fft: int, n_mels: int, fmin: float, dtype=np.float32):
    return dsp.mel_filterbank(sr, n_fft, n_mels, fmin=fmin).T.astype(dtype)


def frame(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Centre-padded framing: (n_samples,) -> (n_frames, n_fft)."""
    y = jnp.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length
    idx = (jnp.arange(n_fft)[None, :]
           + hop_length * jnp.arange(n_frames)[:, None])
    return y[idx]


def stft_magnitude(y: jnp.ndarray, n_fft: int, hop_length: int,
                   win_length: int) -> jnp.ndarray:
    """|STFT| via DFT matmuls: (n_samples,) -> (n_bins, n_frames)."""
    frames = frame(y, n_fft, hop_length)
    cos, sin = _dft_basis(n_fft, win_length, frames.dtype)
    re = _dot(frames, cos)
    im = _dot(frames, sin)
    return jnp.sqrt(re * re + im * im).T


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spec_auto_encoder(wav: jnp.ndarray,
                          cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """Auto-encoder mel on device: amplitude mel -> dB -> [0,1].

    (n_samples,) -> (n_mels, n_frames); matches
    ``dsp.mel_spec_auto_encoder`` / reference spectrogram.py:62-142.
    """
    frames = frame(wav, cfg.n_fft, cfg.hop_length)
    cos, sin = _dft_basis(cfg.n_fft, cfg.window_length, frames.dtype)
    re = _dot(frames, cos)
    im = _dot(frames, sin)
    mag = jnp.sqrt(re * re + im * im)                      # (T, bins)
    fb = _mel_fb(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin, frames.dtype)
    mel = _dot(mag, fb)                                        # (T, n_mels)
    db = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
    return jnp.clip((db + 100.0) / 100.0, 0.0, 1.0).T


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spec_speaker_encoder(wav: jnp.ndarray,
                             cfg: SpeakerMelConfig = SpeakerMelConfig()
                             ) -> jnp.ndarray:
    """Speaker-encoder mel on device: power mel, (n_frames, n_mels).

    Matches ``dsp.mel_spec_speaker_encoder`` / reference spectrogram.py:144-219.
    """
    frames = frame(wav, cfg.n_fft, cfg.hop_length)
    cos, sin = _dft_basis(cfg.n_fft, cfg.n_fft, frames.dtype)
    re = _dot(frames, cos)
    im = _dot(frames, sin)
    power = re * re + im * im                              # (T, bins)
    fb = _mel_fb(cfg.sr, cfg.n_fft, cfg.n_mels, 0.0, frames.dtype)
    return _dot(power, fb)
