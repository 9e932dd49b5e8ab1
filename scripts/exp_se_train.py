#!/usr/bin/env python
"""SE train-step attribution (VERDICT r4 #7): fwd/bwd split of make_se_step
at the bench geometry (8 spk x 6 utt, T=160, H=256, 3 layers), plus probes:
skewed-stack forward (fewer sequential rounds) vs per-layer scans, and a
skewed-stack TRAINING step (autodiff backward) vs the custom-VJP per-layer
path — quantifying what a custom skewed VJP would have to beat.

Usage:  python scripts/exp_se_train.py
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
        K = max(2, min(128, int(budget_s / max(t1, 1e-3))))
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
    from autovc_tpu.config import SpeakerEncoderConfig
    from autovc_tpu.models import speaker_encoder as SE
    from autovc_tpu.ops import precision as PREC
    from autovc_tpu.ops import rnn as R
    from autovc_tpu.train import loop as tloop

    cfg = SpeakerEncoderConfig()
    params = SE.init(jax.random.PRNGKey(2), cfg)
    tx = optax.chain(optax.clip_by_global_norm(3.0), optax.adam(1e-4))
    block = jax.device_put(np.random.default_rng(0).random(
        (8, 6, 160, 40)).astype(np.float32))
    flat = jax.device_put(np.asarray(block).reshape(48, 160, 40))
    results = {}
    dtype = "bf16" if cfg.learn.precision == "bf16" else "f32"

    # ---- the product step (fwd+bwd+opt) ---------------------------------
    step = tloop.make_se_step(cfg, tx)
    st = (params, tx.init(params))
    results["step_ms"] = round(timeit(
        lambda i: step(*st, block)[:2]) * 1e3, 3)

    # ---- forward-only loss ----------------------------------------------
    @jax.jit
    def fwd_only(p, b):
        with PREC.compute(dtype):
            return SE.batch_ge2e_loss(p, b)

    results["fwd_ms"] = round(timeit(lambda i: fwd_only(params, block))
                              * 1e3, 3)

    # ---- grad only (isolate optimizer) ----------------------------------
    @jax.jit
    def grad_only(p, b):
        with PREC.compute(dtype):
            return jax.value_and_grad(SE.batch_ge2e_loss)(p, b)

    results["grad_ms"] = round(timeit(lambda i: grad_only(params, block))
                               * 1e3, 3)
    results["bwd_over_fwd"] = round(
        (results["grad_ms"] - results["fwd_ms"]) / results["fwd_ms"], 2)

    # ---- stack-only probes: per-layer vs skewed, fwd and fwd+bwd --------
    @jax.jit
    def stack_perlayer(p, x):
        with PREC.compute(dtype):
            return R.lstm_stack(p["lstm"], x)[1][0]

    @jax.jit
    def stack_skewed(p, x):
        with PREC.compute(dtype):
            return R.lstm_stack_skewed(p["lstm"], x)[1][0]

    results["stack_perlayer_fwd_ms"] = round(
        timeit(lambda i: stack_perlayer(params, flat)) * 1e3, 3)
    results["stack_skewed_fwd_ms"] = round(
        timeit(lambda i: stack_skewed(params, flat)) * 1e3, 3)

    @jax.jit
    def stack_perlayer_grad(p, x):
        with PREC.compute(dtype):
            return jax.grad(
                lambda pp: jnp_sum(R.lstm_stack(pp["lstm"], x)[1][0]))(p)

    @jax.jit
    def stack_skewed_grad(p, x):
        with PREC.compute(dtype):
            return jax.grad(
                lambda pp: jnp_sum(
                    R.lstm_stack_skewed(pp["lstm"], x)[1][0]))(p)

    results["stack_perlayer_grad_ms"] = round(
        timeit(lambda i: stack_perlayer_grad(params, flat)) * 1e3, 3)
    results["stack_skewed_grad_ms"] = round(
        timeit(lambda i: stack_skewed_grad(params, flat)) * 1e3, 3)

    print(json.dumps(results, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "exp_se_train.json"), "w") as f:
        json.dump(results, f, indent=1)


def jnp_sum(x):
    import jax.numpy as jnp
    return jnp.sum(x)


if __name__ == "__main__":
    main()
