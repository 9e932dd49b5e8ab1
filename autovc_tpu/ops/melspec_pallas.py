"""Fused Pallas mel-spectrogram kernel (SURVEY.md §7 phase-1 kernel).

The XLA path (ops/melspec.py) runs the windowed DFT and the mel projection
as separate matmuls, materialising the (T, 1025) magnitude spectrogram in
HBM between them.  This kernel fuses the whole chain per tile:

    frames (FB, n_fft) @ [cos|sin] (n_fft, BB)  ->  re, im      (MXU)
    mag = sqrt(re^2 + im^2)                                      (VPU)
    mel += mag @ fb_block (BB, n_mels)                           (MXU)
    last bin-block: dB + [0,1] normalisation epilogue            (VPU)

Grid = (frame blocks, bin blocks); the mel accumulator tile is revisited
across the bin-block dimension so the magnitude never leaves VMEM.  The
cos/sin/fb operands stream through VMEM via the BlockSpec pipeline.

Numerics: f32 operands with f32 accumulation — matches the host/XLA mel
front-ends within the librosa-parity budget (rtol 1e-3; tested in
tests/test_melspec_pallas.py).
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


def _kernel(frames_ref, cos_ref, sin_ref, fb_ref, out_ref, *,
            n_bin_blocks, epilogue):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    re = jnp.dot(frames_ref[...], cos_ref[...],
                 preferred_element_type=jnp.float32)
    im = jnp.dot(frames_ref[...], sin_ref[...],
                 preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im) if epilogue == "db_norm" \
        else re * re + im * im                       # power for the SE path
    out_ref[...] += jnp.dot(mag, fb_ref[...],
                            preferred_element_type=jnp.float32)

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
