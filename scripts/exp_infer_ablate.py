"""Round-4 experiment: where does single-stream AE conversion latency go?

Per-subcomponent device times for the bf16 inference path at the
single-utterance geometry (M=1 chunk x 400 frames).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def setup():
    import jax
    cache_dir = os.path.expanduser(
        os.environ.get("AUTOVC_XLA_CACHE", "~/.cache/autovc_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def sync(o):
    import jax
    np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0:1])


def timeit(f, *a, K=32):
    out = f(*a)
    sync(out)
    best = None
    for _ in range(3):
        t0 = time.time(); out = f(*a); sync(out); t1 = time.time() - t0
        t0 = time.time()
        for _ in range(K):
            out = f(*a)
        sync(out)
        tK = time.time() - t0
        per = (tK - t1) / (K - 1)
        best = per if best is None else min(best, per)
    return best


def main():
    setup()
    import jax
    import jax.numpy as jnp

    from autovc_tpu.config import AutoEncoderConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.ops import precision as PREC
    from autovc_tpu.ops import rnn as R

    cfg = AutoEncoderConfig()
    params = AE.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    T = 400
    x = jnp.asarray(rng.random((M, 80, T), dtype=np.float32))
    c = jnp.asarray(rng.standard_normal((M, 256)).astype(np.float32))

    @jax.jit
    def full(p, x, c):
        with PREC.compute("bf16"):
            _, mel_post, _, _ = AE.forward(p, x, c, c, cfg, train=False)
        return mel_post

    @jax.jit
    def enc_only(p, x, c):
        with PREC.compute("bf16"):
            return AE.encoder(p["encoder"], x, c, cfg.freq, cfg.dim_neck,
                              train=False)[0]

    @jax.jit
    def enc_convs_only(p, x, c):
        from autovc_tpu.ops import conv as Cv
        with PREC.compute("bf16"):
            h = jnp.concatenate(
                [x, jnp.broadcast_to(c[:, :, None], (*c.shape, T))], axis=1)
            for pp in p["encoder"]["convs"]:
                h, _ = Cv.conv_bn(pp, h, 5, train=False,
                                  activation=jax.nn.relu)
        return h

    @jax.jit
    def blstm_only(p, h):
        with PREC.compute("bf16"):
            return R.bilstm_stack(p["encoder"]["blstm"], h)

    @jax.jit
    def dec_lstm1(p, u):
        with PREC.compute("bf16"):
            return R.lstm_stack(p["decoder"]["lstm1"], u)[0]

    @jax.jit
    def dec_lstm2(p, h):
        with PREC.compute("bf16"):
            return R.lstm_stack(p["decoder"]["lstm2"], h)[0]

    @jax.jit
    def dec_lstm2_skewed(p, h):
        with PREC.compute("bf16"):
            return R.lstm_stack_skewed(p["decoder"]["lstm2"], h)[0]

    @jax.jit
    def post_only(p, m):
        with PREC.compute("bf16"):
            return AE.postnet(p["postnet"], m, train=False)[0]

    h512 = jnp.asarray(rng.standard_normal((M, T, 512)).astype(np.float32))
    u320 = jnp.asarray(rng.standard_normal((M, T, 320)).astype(np.float32))
    m80 = jnp.asarray(rng.random((M, 80, T)).astype(np.float32))

    rows = [
        ("full forward", lambda: timeit(full, params, x, c)),
        ("encoder convs", lambda: timeit(enc_convs_only, params, x, c)),
        ("encoder blstm", lambda: timeit(blstm_only, params, h512)),
        ("encoder total", lambda: timeit(enc_only, params, x, c)),
        ("decoder lstm1", lambda: timeit(dec_lstm1, params, u320)),
        ("decoder lstm2", lambda: timeit(dec_lstm2, params, h512)),
        ("decoder lstm2 skewed", lambda: timeit(dec_lstm2_skewed, params,
                                                h512)),
        ("postnet", lambda: timeit(post_only, params, m80)),
    ]
    print(f"M={M} T={T}")
    for name, f in rows:
        t0 = time.time()
        dt = f()
        print(f"{name:<22} {dt*1e3:7.2f} ms  (wall {time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
