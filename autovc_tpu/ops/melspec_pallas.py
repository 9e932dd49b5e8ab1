"""Fused Pallas mel-spectrogram kernel — EXPERIMENTAL / superseded.

Status: the production device mel path is ``ops/melspec.py``, whose
hop-decomposed gather-free framing reaches 0.32 ms for a 7 s clip on v5e;
this kernel still frames via the XLA gather (~8 ms dominated by the gather
itself), so fusing the DFT+mel matmuls saves nothing measurable (the fused
intermediate is only ~2 MB).  It is retained as a worked example of a
grid-accumulator Pallas kernel and exercised in interpret mode by
tests/test_melspec_pallas.py; do not wire it into the pipeline without
re-benchmarking.

The kernel fuses the chain per tile:

    frames (FB, n_fft) @ [cos|sin] (n_fft, BB)  ->  re, im      (MXU)
    mag = sqrt(re^2 + im^2)                                      (VPU)
    mel += mag @ fb_block (BB, n_mels)                           (MXU)
    last bin-block: dB + [0,1] normalisation epilogue            (VPU)

Grid = (frame blocks, bin blocks); the mel accumulator tile is revisited
across the bin-block dimension so the magnitude never leaves VMEM.

Numerics: MXU matmuls on f32 operands run ONE bf16 pass by default, which
drifts the normalised mel by ~0.16 absolute on real hardware (measured on
v5e); the dots here therefore run a 3-pass hi/lo-bf16 split (the
Precision.HIGH decomposition) for ~5e-4 absolute agreement with the
host/XLA front-ends.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autovc_tpu.config import MelConfig, SpeakerMelConfig
from autovc_tpu.ops import melspec as M

_FB = 128          # frames per tile (MXU rows)
_BB = 128          # DFT bins per tile (MXU lanes)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _split_hi_lo(a):
    """f32 -> (hi, lo) bf16 pair with a ~= hi + lo."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a, b):
    """3-pass f32 matmul on the MXU (Precision.HIGH decomposition): a single
    bf16 pass loses ~3 decimal digits of the operands, which shows up as
    ~0.16 absolute drift on the normalised mel."""
    a_hi, a_lo = _split_hi_lo(a)
    b_hi, b_lo = _split_hi_lo(b)
    f32 = jnp.float32
    return (jnp.dot(a_hi, b_hi, preferred_element_type=f32)
            + jnp.dot(a_hi, b_lo, preferred_element_type=f32)
            + jnp.dot(a_lo, b_hi, preferred_element_type=f32))


def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, *,
            n_bin_blocks, epilogue):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    re = _dot3(frames_ref[...], cos_ref[...])
    im = _dot3(frames_ref[...], sin_ref[...])
    mag = jnp.sqrt(re * re + im * im) if epilogue == "db_norm" \
        else re * re + im * im                       # power for the SE path
    out_ref[...] += _dot3(mag, fb_ref[...])

    @pl.when(j == n_bin_blocks - 1)
    def _():
        if epilogue == "db_norm":                     # AE path
            db = 20.0 * jnp.log10(jnp.maximum(1e-5, out_ref[...]))
            out_ref[...] = jnp.clip((db + 100.0) / 100.0, 0.0, 1.0)


def _mel_fused(wav: jnp.ndarray, sr: int, n_fft: int, hop: int,
               win_length: int, n_mels: int, fmin: float,
               epilogue: str, interpret: bool) -> jnp.ndarray:
    """Returns (n_frames, n_mels) mel features."""
    frames = M.frame(wav, n_fft, hop)                # (T, n_fft), XLA gather
    T = frames.shape[0]
    Tp = _round_up(max(T, 8), _FB)
    frames = jnp.pad(frames, ((0, Tp - T), (0, 0)))

    cos, sin = M._dft_basis(n_fft, win_length)       # (n_fft, n_bins) numpy
    fb = M._mel_fb(sr, n_fft, n_mels, fmin)          # (n_bins, n_mels) numpy
    n_bins = cos.shape[1]
    Bp = _round_up(n_bins, _BB)
    Mp = _round_up(n_mels, 128)
    cos = jnp.asarray(np.pad(cos, ((0, 0), (0, Bp - n_bins))))
    sin = jnp.asarray(np.pad(sin, ((0, 0), (0, Bp - n_bins))))
    # zero rows for the padded bins kill their contribution to the mel sum
    fbp = jnp.asarray(np.pad(fb, ((0, Bp - n_bins), (0, Mp - n_mels))))

    n_bin_blocks = Bp // _BB
    grid = (Tp // _FB, n_bin_blocks)
    kern = functools.partial(_kernel, n_bin_blocks=n_bin_blocks,
                             epilogue=epilogue)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((Tp, Mp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_FB, n_fft), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _BB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, _BB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, Mp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_FB, Mp), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(frames, cos, sin, fbp)
    return out[:T, :n_mels]


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def mel_spec_auto_encoder_pallas(wav: jnp.ndarray,
                                 cfg: MelConfig = MelConfig(),
                                 interpret: bool = False) -> jnp.ndarray:
    """Fused AE mel: amplitude mel -> dB -> [0,1]; (n_mels, n_frames).
    Matches ops.melspec.mel_spec_auto_encoder / reference
    spectrogram.py:62-142."""
    out = _mel_fused(wav, cfg.sr, cfg.n_fft, cfg.hop_length,
                     cfg.window_length, cfg.n_mels, cfg.fmin,
                     "db_norm", interpret)
    return out.T


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def mel_spec_speaker_encoder_pallas(wav: jnp.ndarray,
                                    cfg: SpeakerMelConfig = SpeakerMelConfig(),
                                    interpret: bool = False) -> jnp.ndarray:
    """Fused SE mel: power mel, (n_frames, n_mels).  Matches
    ops.melspec.mel_spec_speaker_encoder / reference
    spectrogram.py:144-219."""
    return _mel_fused(wav, cfg.sr, cfg.n_fft, cfg.hop_length, cfg.n_fft,
                      cfg.n_mels, 0.0, "power", interpret)
