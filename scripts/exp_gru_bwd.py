#!/usr/bin/env python
"""Fine-grained GRU fwd/bwd attribution for the vocoder train step
(follow-up to exp_vocoder_train.py: backward is 3.8x forward at 30 ms).

Times, at the vocoder geometry (B=32, T=1375, H=512):
  * one gru_layer forward;
  * its grad (custom-VJP backward scan);
  * grad with backward-scan unroll variants;
  * grad with bf16 saved activations;
  * the non-GRU remainder (MelResNet + fc stack) fwd and grad.

Usage:  python scripts/exp_gru_bwd.py
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
    from autovc_tpu.ops import precision as PREC
    from autovc_tpu.ops import rnn as R

    B, T, H = 32, 1375, 512
    key = jax.random.PRNGKey(0)
    p1 = R.init_gru_layer(key, H, H)
    x = jax.device_put(np.random.default_rng(0).random(
        (B, T, H)).astype(np.float32))
    results = {}

    @jax.jit
    def fwd(p, x):
        with PREC.compute("bf16"):
            return jnp.sum(R.gru_layer(p, x)[0])

    results["gru_fwd_ms"] = round(timeit(lambda i: fwd(p1, x)) * 1e3, 3)

    @jax.jit
    def grad(p, x):
        with PREC.compute("bf16"):
            return jax.grad(lambda pp: jnp.sum(R.gru_layer(pp, x)[0]))(p)

    results["gru_grad_ms"] = round(timeit(lambda i: grad(p1, x)) * 1e3, 3)

    # per-round latencies implied (T fwd rounds; T bwd + T fwd-resave)
    results["fwd_us_per_round"] = round(
        results["gru_fwd_ms"] * 1e3 / T, 3)
    results["bwd_us_per_round"] = round(
        (results["gru_grad_ms"] - results["gru_fwd_ms"]) * 1e3 / (2 * T), 3)

    print(json.dumps(results, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "exp_gru_bwd.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
