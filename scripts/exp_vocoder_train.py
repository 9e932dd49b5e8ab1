#!/usr/bin/env python
"""Vocoder train-step attribution experiment (VERDICT r4 #3).

Records, on the real chip, for make_vocoder_step's geometry (batch 32,
seq_frames 5 -> 1375 samples, rd=fc=512):
  * forward-only vs forward+backward wall time (the fwd/bwd split the r3/r4
    AE analysis used to find its 6.4x);
  * sensitivity sweeps: scan unroll, batch size, seq_frames, bf16 saved
    activations — each paired IN-PROCESS against the baseline so tunnel
    jitter cancels.

Usage:  python scripts/exp_vocoder_train.py
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
    import jax
    import optax

    _setup()
    from autovc_tpu.config import WaveRNNConfig
    from autovc_tpu.models import wavernn as WR
    from autovc_tpu.ops import precision as PREC
    from autovc_tpu.train import loop as tloop

    cfg = WaveRNNConfig()
    hop = cfg.hop_length
    key = jax.random.PRNGKey(0)
    params = WR.init(key, cfg)
    tx = optax.chain(optax.clip_by_global_norm(4.0), optax.adam(1e-4))
    results = {}

    def make_batch(vb, seqf, seed=1):
        rng = np.random.default_rng(seed)
        vm = jax.device_put(rng.random(
            (vb, 80, seqf + 2 * cfg.pad)).astype(np.float32))
        vx = jax.device_put(rng.uniform(
            -1, 1, (vb, seqf * hop)).astype(np.float32))
        vy = jax.device_put(np.roll(np.asarray(vx), -1, 1))
        return vx, vy, vm

    vb, seqf = 32, 5
    vx, vy, vm = make_batch(vb, seqf)

    # ---- forward only ---------------------------------------------------
    @jax.jit
    def fwd_only(p, x, y, m):
        with PREC.compute("bf16"):
            l, _ = WR.loss(p, x, y, m, cfg, train=True)
        return l

    dt_f = timeit(lambda i: fwd_only(params, vx, vy, vm))
    results["fwd_ms"] = round(dt_f * 1e3, 3)

    # ---- forward+backward (the full product step) -----------------------
    step = tloop.make_vocoder_step(cfg, tx)
    st = (params, tx.init(params))
    dt_fb = timeit(lambda i: step(*st, vx, vy, vm)[:2])
    results["step_ms"] = round(dt_fb * 1e3, 3)
    results["bwd_over_fwd"] = round((dt_fb - dt_f) / dt_f, 2)

    # ---- grad-only (isolate optimizer/EMA cost) -------------------------
    @jax.jit
    def grad_only(p, x, y, m):
        def lf(pp):
            l, np_ = WR.loss(pp, x, y, m, cfg, train=True)
            return l, np_
        with PREC.compute("bf16"):
            (l, _), g = jax.value_and_grad(lf, has_aux=True)(p)
        return l, g

    dt_g = timeit(lambda i: grad_only(params, vx, vy, vm))
    results["grad_ms"] = round(dt_g * 1e3, 3)

    # ---- batch scaling (weight-streaming amortisation probe) ------------
    # opt state device-resident OUTSIDE the timed lambda (the r5a run
    # re-ran tx.init per call and measured the opt-state upload, not the
    # step)
    opt0 = tx.init(params)
    for b in (16, 64, 128):
        x2, y2, m2 = make_batch(b, seqf)
        dt = timeit(lambda i: step(params, opt0, x2, y2, m2)[:2])
        results[f"step_ms_b{b}"] = round(dt * 1e3, 3)

    # ---- seq_frames scaling (fixed-overhead amortisation probe) ---------
    for sf in (10, 20):
        x2, y2, m2 = make_batch(vb, sf)
        dt = timeit(lambda i: step(params, opt0, x2, y2, m2)[:2])
        results[f"step_ms_seqf{sf}"] = round(dt * 1e3, 3)

    print(json.dumps(results, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "exp_vocoder_train.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
