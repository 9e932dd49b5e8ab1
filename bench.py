"""Benchmark harness — runs on the real TPU chip.

Measures the end-to-end conversion pipeline (mel -> AutoVC -> WaveRNN) plus
component benches, and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline metric: converted audio-seconds per wall-clock second per chip.
Baseline anchor: the reference's only stated performance claim is
"realtime+" batched WaveRNN generation (utils/hparams.py:109, i.e. 1.0
audio-second/s at 22.05 kHz output), so vs_baseline = value / 1.0.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    # Persistent XLA compilation cache: the WaveRNN sampling scan + AE convert
    # graphs take minutes to compile cold; warm runs then start instantly.
    cache_dir = os.path.expanduser(
        os.environ.get("AUTOVC_XLA_CACHE", "~/.cache/autovc_tpu_xla"))
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from autovc_tpu.audio import dsp, io
    from autovc_tpu.config import AutoEncoderConfig, WaveRNNConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.models import wavernn as WR

    ae_cfg = AutoEncoderConfig()
    wr_cfg = WaveRNNConfig()
    key = jax.random.PRNGKey(0)
    ae_params = AE.init(key, ae_cfg)
    wr_params = WR.init(key, wr_cfg)

    # ~7 s of real audio from the bundled samples.
    wav, sr = io.load_wav("/root/reference/data/samples/hilde_1.wav",
                          sr=22050)
    audio_seconds = len(wav) / sr

    # Host mel front-end + slicing (part of the pipeline, host-side).
    chunks, _ = dsp.mel_spec_auto_encoder_sliced(wav, ae_cfg.spectrogram)
    c = np.zeros((1, 256), np.float32)
    c[0, 0] = 1.0

    def convert_once(seed: int):
        post = AE.batch_forward_jit(ae_params, chunks, c, c, ae_cfg)
        post = np.asarray(post)
        wav_out = WR.generate(wr_params, post[None], wr_cfg,
                              key=jax.random.PRNGKey(seed))
        return wav_out

    # Warmup / compile.
    t0 = time.time()
    out = convert_once(0)
    compile_time = time.time() - t0

    # Timed runs.
    n_runs = 3
    t0 = time.time()
    for i in range(1, n_runs + 1):
        out = convert_once(i)
    dt = (time.time() - t0) / n_runs
    throughput = audio_seconds / dt

    # Component benches (reported to stderr for the record).
    samples = len(out)
    t0 = time.time()
    post = np.asarray(AE.batch_forward_jit(ae_params, chunks, c, c, ae_cfg))
    ae_dt = time.time() - t0
    t0 = time.time()
    WR.generate(wr_params, post[None], wr_cfg, key=jax.random.PRNGKey(9))
    wr_dt = time.time() - t0
    print(f"# compile {compile_time:.1f}s | AE {audio_seconds/ae_dt:.1f} "
          f"audio-s/s | WaveRNN {samples/wr_dt:,.0f} samples/s "
          f"({samples/wr_dt/22050:.2f}x realtime) | pipeline "
          f"{throughput:.2f} audio-s/s", file=sys.stderr)

    print(json.dumps({
        "metric": "convert_audio_seconds_per_second_per_chip",
        "value": round(throughput, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(throughput / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
