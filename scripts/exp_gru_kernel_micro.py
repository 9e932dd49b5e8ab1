#!/usr/bin/env python
"""Micro-bench of the fused GRU-pair train kernels in isolation
(vocoder geometry B=32, T=1375, H=512, bf16 policy): forward kernel,
forward+backward, and the us/round each implies.

Usage:  python scripts/exp_gru_kernel_micro.py
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
    import jax.numpy as jnp

    _setup()
    from autovc_tpu.ops import gru_train_pallas as GP
    from autovc_tpu.ops import precision as PREC

    B, T, H = 32, 1375, 512
    rng = np.random.default_rng(0)
    f = lambda *s: jax.device_put(
        (0.4 * rng.standard_normal(s)).astype(np.float32))
    # TIME-MAJOR since the r5 layout change
    args = (f(T, B, 3 * H), f(T, B, 3 * H), f(H, 3 * H), f(H, 3 * H),
            f(3 * H), f(H, 3 * H), f(3 * H))
    results = {}

    @jax.jit
    def fwd(*a):
        with PREC.compute("bf16"):
            h1, h2 = GP.gru_pair(*a)
        return h2

    dt = timeit(lambda i: fwd(*args))
    results["pair_fwd_ms"] = round(dt * 1e3, 3)
    results["pair_fwd_us_per_round"] = round(dt * 1e6 / T, 3)

    @jax.jit
    def fb(*a):
        with PREC.compute("bf16"):
            g = jax.grad(lambda *aa: jnp.sum(GP.gru_pair(*aa)[1]),
                         argnums=(0, 3))(*a)
        return g

    dt2 = timeit(lambda i: fb(*args))
    results["pair_grad_ms"] = round(dt2 * 1e3, 3)
    results["pair_bwd_ms"] = round((dt2 - dt) * 1e3, 3)
    results["pair_bwd_us_per_round"] = round((dt2 - dt) * 1e6 / T, 3)

    print(json.dumps(results, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "exp_gru_kernel_micro.json"), "w") as f2:
        json.dump(results, f2, indent=1)


if __name__ == "__main__":
    main()
