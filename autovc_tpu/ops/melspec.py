"""TPU mel-spectrogram front-end: STFT as MXU matmuls, gather-free framing.

Design (TPU-first, not a librosa port):
  * the rFFT is expressed as real matmuls against a precomputed windowed
    cos|sin DFT basis — orders of magnitude more FLOPs than an FFT, but it
    runs on the 128x128 systolic array and beats jnp.fft at these frame
    counts;
  * framing is **hop-decomposed**: the padded wav is reshaped to rows of
    ``hop`` samples and the (n_frames, n_fft) frame matrix is never built.
    Frame f spans rows f..f+R-1 (R = ceil(n_fft/hop)), so the windowed DFT
    becomes R shifted (n_frames, hop) @ (hop, 2*n_bins) matmuls accumulated
    in f32.  The naive strided gather this replaces dominated the kernel on
    real v5e hardware (8.4 ms -> 0.32 ms for a 7 s clip, 26x);
  * the mel filterbank application is a third matmul
    (n_frames, n_bins) @ (n_bins, n_mels);
  * dB + normalisation are fused elementwise epilogues.

Numerics match the host reference :mod:`autovc_tpu.audio.dsp`, which mirrors
the librosa semantics of the PyTorch reference
(``autovc/audio/spectrogram.py:62-219``): centre/reflect padding, periodic
Hann, slaney mel, amplitude mel for the auto-encoder path and power mel for
the speaker-encoder path.  The DFT/mel matmuls force full-f32 MXU passes
(Precision.HIGHEST): bf16 single-pass drifts by ~0.16 absolute on the
normalised mel (measured on v5e) and costs the same wall-clock here.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

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
def _dft_basis_chunked(n_fft: int, win_length: int, hop: int):
    """The [cos|sin] basis split into R = ceil(n_fft/hop) row chunks of
    ``hop`` rows each (last chunk zero-padded), for hop-decomposed framing.
    Returns a (R, hop, 2*n_bins) numpy array."""
    cos, sin = _dft_basis(n_fft, win_length)
    basis = np.concatenate([cos, sin], axis=1)
    R = -(-n_fft // hop)
    chunks = []
    for r in range(R):
        b = basis[r * hop:(r + 1) * hop]
        if b.shape[0] < hop:
            b = np.pad(b, ((0, hop - b.shape[0]), (0, 0)))
        chunks.append(b)
    return np.stack(chunks)


@functools.lru_cache(maxsize=8)
def _mel_fb(sr: int, n_fft: int, n_mels: int, fmin: float, dtype=np.float32):
    return dsp.mel_filterbank(sr, n_fft, n_mels, fmin=fmin).T.astype(dtype)


def frame(y: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """Centre-padded framing: (n_samples,) -> (n_frames, n_fft).

    Materialises the frame matrix via gather — slow on TPU; kept for
    host-side use and tests.  The mel kernels below never call it.
    """
    y = jnp.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop_length
    idx = (jnp.arange(n_fft)[None, :]
           + hop_length * jnp.arange(n_frames)[:, None])
    return y[idx]


def _stft_re_im(y: jnp.ndarray, n_fft: int, hop: int,
                win_length: int) -> jnp.ndarray:
    """Gather-free windowed DFT: (n_samples,) -> (n_frames, 2*n_bins).

    Centre/reflect pad, then accumulate the R shifted row-block matmuls of
    the hop-decomposition (see module docstring)."""
    y = jnp.pad(y, n_fft // 2, mode="reflect")
    n_frames = 1 + (y.shape[0] - n_fft) // hop
    basis = _dft_basis_chunked(n_fft, win_length, hop)
    R = basis.shape[0]
    need = (n_frames + R - 1) * hop
    y = jnp.pad(y, (0, max(0, need - y.shape[0])))[:need]
    rows = y.reshape(n_frames + R - 1, hop)
    acc = jnp.zeros((n_frames, basis.shape[-1]), jnp.float32)
    for r in range(R):      # R is small and static (8 for the AE geometry)
        acc = acc + _dot(rows[r:r + n_frames], jnp.asarray(basis[r]))
    return acc


def stft_magnitude(y: jnp.ndarray, n_fft: int, hop_length: int,
                   win_length: int) -> jnp.ndarray:
    """|STFT| via DFT matmuls: (n_samples,) -> (n_bins, n_frames)."""
    out = _stft_re_im(y, n_fft, hop_length, win_length)
    n_bins = 1 + n_fft // 2
    re, im = out[:, :n_bins], out[:, n_bins:]
    return jnp.sqrt(re * re + im * im).T


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spec_auto_encoder(wav: jnp.ndarray,
                          cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """Auto-encoder mel on device: amplitude mel -> dB -> [0,1].

    (n_samples,) -> (n_mels, n_frames); matches
    ``dsp.mel_spec_auto_encoder`` / reference spectrogram.py:62-142.
    int16 input is PCM16 (dequantised on device — serving paths upload
    half the bytes over slow links).
    """
    if wav.dtype == jnp.int16:
        wav = wav.astype(jnp.float32) / 32767.0
    out = _stft_re_im(wav, cfg.n_fft, cfg.hop_length, cfg.window_length)
    n_bins = 1 + cfg.n_fft // 2
    re, im = out[:, :n_bins], out[:, n_bins:]
    mag = jnp.sqrt(re * re + im * im)                      # (T, bins)
    fb = _mel_fb(cfg.sr, cfg.n_fft, cfg.n_mels, cfg.fmin)
    mel = _dot(mag, fb)                                    # (T, n_mels)
    db = 20.0 * jnp.log10(jnp.maximum(1e-5, mel))
    return jnp.clip((db + 100.0) / 100.0, 0.0, 1.0).T


@functools.partial(jax.jit, static_argnames=("cfg", "starts", "n"))
def _slice_mel(wav: jnp.ndarray, cfg: MelConfig, starts: tuple, n: int):
    mel = mel_spec_auto_encoder(wav, cfg)
    return jnp.stack([jax.lax.dynamic_slice(mel, (0, s), (cfg.n_mels, n))
                      for s in starts])


def mel_spec_auto_encoder_sliced(wav: np.ndarray,
                                 cfg: MelConfig = MelConfig(),
                                 overlap: float = 0.5,
                                 min_pad_coverage: float = 0.75,
                                 pcm16: bool = False):
    """Device-resident ``cut=True`` AE mel path: (n_chunks, n_mels, N) chunks
    ON DEVICE plus the mel slices.

    Matches ``dsp.mel_spec_auto_encoder_sliced`` exactly (same slice index
    math on the host, same padded wav into the same mel kernel), but the mel
    and the chunk extraction run on device, so the only host->device
    transfer is the raw waveform — ~6x less traffic than shipping the
    50%%-overlapped chunk stack (matters on slow interconnects and keeps the
    whole pipeline on-chip).  ``pcm16=True`` uploads the wav as int16
    (half the bytes again; ~3e-5 re-quantisation — the serving paths'
    choice, as the audio was int16 PCM at the file boundary).
    """
    wav_slices, mel_slices = dsp.compute_partial_slices(
        len(wav), cfg.sr,
        partial_utterance_n_frames=cfg.partial_utterance_n_frames,
        min_pad_coverage=min_pad_coverage, overlap=overlap,
        mel_window_step=cfg.mel_window_step)
    wav = dsp.pad_for_slices(np.asarray(wav), wav_slices)
    if pcm16:
        wav = np.clip(np.round(wav.astype(np.float64) * 32767.0),
                      -32767, 32767).astype(np.int16)
    starts = tuple(int(s.start) for s in mel_slices)
    chunks = _slice_mel(jnp.asarray(wav), cfg, starts,
                        cfg.partial_utterance_n_frames)
    return chunks, mel_slices


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spec_speaker_encoder(wav: jnp.ndarray,
                             cfg: SpeakerMelConfig = SpeakerMelConfig()
                             ) -> jnp.ndarray:
    """Speaker-encoder mel on device: power mel, (n_frames, n_mels).

    Matches ``dsp.mel_spec_speaker_encoder`` / reference spectrogram.py:144-219.
    int16 input is PCM16 (dequantised on device).
    """
    if wav.dtype == jnp.int16:
        wav = wav.astype(jnp.float32) / 32767.0
    out = _stft_re_im(wav, cfg.n_fft, cfg.hop_length, cfg.n_fft)
    n_bins = 1 + cfg.n_fft // 2
    re, im = out[:, :n_bins], out[:, n_bins:]
    power = re * re + im * im                              # (T, bins)
    fb = _mel_fb(cfg.sr, cfg.n_fft, cfg.n_mels, 0.0)
    return _dot(power, fb)
