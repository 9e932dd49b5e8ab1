#!/usr/bin/env python
"""Pre-warm the persistent XLA compilation cache for the canonical serving
shapes.

Cold compiles of the fused conversion programs take tens of seconds; this
script runs one conversion per bucketed input length (see
``VoiceConverter.convert(pad_to_seconds=...)``) so a fresh process serves
every shape from the on-disk cache (AUTOVC_XLA_CACHE, default
``~/.cache/autovc_tpu_xla``).

Usage:
    python scripts/prewarm_cache.py [--max_seconds 16] [--bucket 2.0]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bucket", type=float, default=2.0,
                    help="pad_to_seconds bucket")
    ap.add_argument("--max_seconds", type=float, default=16.0)
    ap.add_argument("--batch_sizes", type=int, nargs="*", default=[16],
                    help="training batch sizes to warm (0 to skip)")
    args = ap.parse_args()

    import jax
    cache_dir = os.path.expanduser(
        os.environ.get("AUTOVC_XLA_CACHE", "~/.cache/autovc_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    from autovc_tpu.voice_converter import VoiceConverter

    vc = VoiceConverter(verbose=False)
    sr = vc.config.convert.sr
    rng = np.random.default_rng(0)

    n_buckets = int(args.max_seconds / args.bucket)
    for i in range(1, n_buckets + 1):
        seconds = i * args.bucket
        wav = rng.uniform(-0.1, 0.1, int(seconds * sr)).astype(np.float32)
        from autovc_tpu.audio import Audio
        t0 = time.time()
        vc.convert(Audio(wav, sr=sr, sr_org=sr), Audio(wav, sr=sr,
                                                       sr_org=sr),
                   save_name=False, outprocess=(),
                   pad_to_seconds=args.bucket)
        print(f"warmed convert @ {seconds:.1f}s "
              f"({time.time() - t0:.1f}s)")

    for bs in args.batch_sizes:
        if not bs:
            continue
        import optax

        from autovc_tpu.models import autoencoder as AE
        from autovc_tpu.train import loop as tloop
        cfg = vc.AE.config
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
        step = tloop.make_ae_step(cfg, tx, ema_decay=0.9999)
        N = cfg.spectrogram.partial_utterance_n_frames
        x = rng.random((bs, cfg.n_mels, N), dtype=np.float32)
        c = rng.standard_normal((bs, 256)).astype(np.float32)
        params = vc.AE.params
        t0 = time.time()
        out = step(params, tx.init(params), params, x, c)
        jax.block_until_ready(out[0])
        print(f"warmed train step @ batch {bs} ({time.time() - t0:.1f}s)")

    print(f"cache: {cache_dir} "
          f"({len(os.listdir(cache_dir))} entries)")


if __name__ == "__main__":
    main()
