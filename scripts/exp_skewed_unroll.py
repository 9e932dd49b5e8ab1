#!/usr/bin/env python
"""Skewed LSTM2 stack at serving-slab geometry (64 x 400, 2 x 1024, bf16):
scan-unroll sweep + an f32-carry vs pre-cast-weight probe.  Follow-up to
exp_slab_stages.py (lstm2 = 56% of the slab at 18.5 us/round vs 8.2 us
compute SoL).

Usage:  python scripts/exp_skewed_unroll.py
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
    from autovc_tpu.ops import precision as PREC
    from autovc_tpu.ops import rnn as R

    B, T, H, L = 64, 400, 1024, 2
    params = R.init_lstm_stack(jax.random.PRNGKey(0), 512, H, L)
    x = jax.device_put(np.random.default_rng(0).random(
        (B, T, 512)).astype(np.float32))
    results = {}

    def skewed_unroll(params, x, unroll, precast):
        Lh = len(params)
        Bx, Tx, _ = x.shape
        xp0 = PREC.dot(x, params[0]["w_ih"]) + params[0]["b_ih"] \
            + params[0]["b_hh"]
        xp0 = jnp.pad(jnp.swapaxes(xp0, 0, 1), ((0, Lh - 1), (0, 0), (0, 0)))
        w_big = jnp.concatenate([
            jnp.stack([p["w_hh"] for p in params]),
            jnp.stack([p["w_ih"] for p in params[1:]]),
        ])
        if precast:
            w_big = w_big.astype(jnp.bfloat16)

            def bdot(a, w):
                return jnp.einsum("gbh,ghk->gbk", a.astype(jnp.bfloat16), w,
                                  preferred_element_type=jnp.float32)
        else:
            bdot = PREC.rec_bdot
        b_rest = jnp.stack([p["b_ih"] + p["b_hh"] for p in params[1:]])
        h0 = jnp.zeros((Lh, Bx, H), x.dtype)
        steps = jnp.arange(Tx + Lh - 1)

        def step(carry, inp):
            h, c, y_prev = carry
            xp0_t, s = inp
            big = bdot(jnp.concatenate([h, y_prev[:-1]]), w_big)
            hp, xp_in = big[:Lh], big[Lh:]
            gates = jnp.concatenate([
                (xp0_t + hp[0])[None],
                xp_in + b_rest[:, None, :] + hp[1:],
            ])
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            t_l = s - jnp.arange(Lh)
            live = ((t_l >= 0) & (t_l < Tx))[:, None, None]
            h = jnp.where(live, h_new, h)
            c = jnp.where(live, c_new, c)
            y_prev = jnp.where(live, h_new, y_prev)
            return (h, c, y_prev), h[Lh - 1]

        (_, _, _), ys = jax.lax.scan(step, (h0, c0 := jnp.zeros_like(h0),
                                            h0), (xp0, steps), unroll=unroll)
        return jnp.swapaxes(ys[Lh - 1:], 0, 1)

    for unroll in (4, 8, 16, 25):
        f = jax.jit(functools.partial(skewed_unroll, unroll=unroll,
                                      precast=False))

        def run(i, f=f):
            with PREC.compute("bf16"):
                return f(params, x)
        results[f"skewed_u{unroll}_ms"] = round(timeit(run) * 1e3, 3)

    for unroll in (8, 16):
        f = jax.jit(functools.partial(skewed_unroll, unroll=unroll,
                                      precast=True))

        def run(i, f=f):
            with PREC.compute("bf16"):
                return f(params, x)
        results[f"skewed_u{unroll}_precast_ms"] = round(timeit(run)*1e3, 3)

    print(json.dumps(results, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                           "exp_skewed_unroll.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
