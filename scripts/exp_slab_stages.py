#!/usr/bin/env python
"""Serving-slab stage attribution (VERDICT r4 #6): per-stage timing split
of the 64-row bf16 convert_slab forward, plus candidate-optimisation probes
(BLSTM scan unroll at slab width, conv stack share).

All variants are paired in one process so tunnel jitter cancels.

Usage:  python scripts/exp_slab_stages.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def _setup():
    import jax
    cache_dir = os.path.expanduser("~/.cache/autovc_tpu_xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _sync(out):
    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "ravel") and not isinstance(leaf, np.ndarray):
            np.asarray(leaf.ravel()[0:1])
            return


def timeit(fn, repeats=3, budget_s=0.6):
    out = fn(0)
    _sync(out)
    per_ops, seed = [], 1
    for _ in range(repeats):
        t0 = time.time()
        out = fn(seed)
        _sync(out)
        t1 = time.time() - t0
        K = max(2, min(64, int(budget_s / max(t1, 1e-3))))
        t0 = time.time()
        for i in range(seed + 1, seed + 1 + K):
            out = fn(i)
        _sync(out)
        tK = time.time() - t0
        per_ops.append((tK - t1) / (K - 1) if K > 1 else t1)
        seed += K + 1
    return sorted(per_ops)[len(per_ops) // 2]


def main():
    import functools

    import jax
    import jax.numpy as jnp

    _setup()
    from autovc_tpu.config import AutoEncoderConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.ops import conv as C
    from autovc_tpu.ops import precision as PREC
    from autovc_tpu.ops import rnn as R

    cfg = AutoEncoderConfig()
    S, T = 64, cfg.spectrogram.partial_utterance_n_frames   # 64 x 400 slab
    key = jax.random.PRNGKey(0)
    params = AE.init(key, cfg)
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.random((S, cfg.n_mels, T)).astype(np.float32))
    c = jax.device_put(rng.random((S, cfg.dim_emb)).astype(np.float32))
    results = {}

    # ---- baseline: the full slab program --------------------------------
    dt = timeit(lambda i: AE.convert_slab(params, x, c, c, cfg, "bf16"))
    results["full_slab_ms"] = round(dt * 1e3, 3)

    # ---- stage jits (same dtype policy as the slab) ---------------------
    def staged(stage_fn):
        @jax.jit
        def run(p, *args):
            with PREC.compute("bf16"):
                return stage_fn(p, *args)
        return run

    h_in = jnp.concatenate(
        [x, jnp.broadcast_to(c[:, :, None], (S, cfg.dim_emb, T))], axis=1)

    def enc_convs(p, h):
        for pc in p["encoder"]["convs"]:
            h, _ = C.conv_bn(pc, h, 5, train=False, activation=jax.nn.relu)
        return h
    f = staged(enc_convs)
    results["enc_convs_ms"] = round(timeit(lambda i: f(params, h_in))*1e3, 3)

    h512 = jax.device_put(rng.random((S, T, 512)).astype(np.float32))

    def blstm(p, h):
        return R.bilstm_stack(p["encoder"]["blstm"], h)
    f = staged(blstm)
    results["enc_blstm_ms"] = round(timeit(lambda i: f(params, h512))*1e3, 3)

    dec_in = jax.device_put(rng.random(
        (S, T, 2 * cfg.dim_neck + cfg.dim_emb)).astype(np.float32))

    def lstm1(p, h):
        return R.lstm_stack(p["decoder"]["lstm1"], h)[0]
    f = staged(lstm1)
    results["dec_lstm1_ms"] = round(timeit(lambda i: f(params, dec_in))*1e3, 3)

    hpre = jax.device_put(rng.random(
        (S, cfg.dim_pre, T)).astype(np.float32))

    def dec_convs(p, h):
        for pc in p["decoder"]["convs"]:
            h, _ = C.conv_bn(pc, h, 5, train=False, activation=jax.nn.relu)
        return h
    f = staged(dec_convs)
    results["dec_convs_ms"] = round(timeit(lambda i: f(params, hpre))*1e3, 3)

    hpre_t = jax.device_put(rng.random(
        (S, T, cfg.dim_pre)).astype(np.float32))

    def lstm2_skewed(p, h):
        return R.lstm_stack_skewed(p["decoder"]["lstm2"], h)[0]
    f = staged(lstm2_skewed)
    results["dec_lstm2_skewed_ms"] = round(
        timeit(lambda i: f(params, hpre_t))*1e3, 3)

    def lstm2_perlayer(p, h):
        return R.lstm_stack(p["decoder"]["lstm2"], h)[0]
    f = staged(lstm2_perlayer)
    results["dec_lstm2_perlayer_ms"] = round(
        timeit(lambda i: f(params, hpre_t))*1e3, 3)

    from autovc_tpu.ops import lstm_pallas as LP

    def lstm2_stream(p, h):
        return LP.lstm_stack_stream(p["decoder"]["lstm2"], h)
    f = staged(lstm2_stream)
    results["dec_lstm2_stream_ms"] = round(
        timeit(lambda i: f(params, hpre_t))*1e3, 3)

    mel_in = jax.device_put(rng.random((S, cfg.n_mels, T)).astype(np.float32))

    def postnet(p, h):
        return AE.postnet(p["postnet"], h, train=False)[0]
    f = staged(postnet)
    results["postnet_ms"] = round(timeit(lambda i: f(params, mel_in))*1e3, 3)

    stages = (results["enc_convs_ms"] + results["enc_blstm_ms"]
              + results["dec_lstm1_ms"] + results["dec_convs_ms"]
              + results["dec_lstm2_skewed_ms"] + results["postnet_ms"])
    results["sum_of_stages_ms"] = round(stages, 3)

    print(json.dumps(results, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "exp_slab_stages.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
