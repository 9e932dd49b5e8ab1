"""Round-4 experiment: where does the AE train step's time go?

Ablations on the real TPU chip (uses the persistent compile cache).
Run: python scripts/exp_train_ablate.py [variant ...]
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


def timeit(f, *a, K=8):
    out = f(*a)
    sync(out)
    t0 = time.time(); out = f(*a); sync(out); t1 = time.time() - t0
    t0 = time.time()
    for _ in range(K):
        out = f(*a)
    sync(out)
    tK = time.time() - t0
    return (tK - t1) / (K - 1)


def main():
    setup()
    import jax
    import jax.numpy as jnp

    from autovc_tpu.config import AutoEncoderConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.ops import precision as PREC

    cfg = AutoEncoderConfig()
    params = AE.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.random((16, 80, 400), dtype=np.float32))
    cb = jnp.asarray(rng.standard_normal((16, 256)).astype(np.float32))

    def loss_norecon(p, x, c):
        mel_dec, mel_post, codes, p1 = AE.forward(p, x, c, c, cfg,
                                                  train=True)
        return jnp.mean((mel_post - x) ** 2) + jnp.mean((mel_dec - x) ** 2)

    def loss_evalrecon(p, x, c):
        mel_dec, mel_post, codes, p1 = AE.forward(p, x, c, c, cfg,
                                                  train=True)
        recon_codes, _ = AE.content_codes(p1, mel_post, c, cfg, train=False)
        return (jnp.mean((mel_post - x) ** 2)
                + jnp.mean((mel_dec - x) ** 2)
                + jnp.mean(jnp.abs(recon_codes - codes)))

    variants = {}

    @jax.jit
    def pure_fwd(p, x, c):
        with PREC.compute("bf16"):
            return AE.forward(p, x, c, c, cfg, train=True)[1]
    variants["pure_fwd"] = lambda: timeit(pure_fwd, params, xb, cb)

    @jax.jit
    def fwd_loss(p, x, c):
        with PREC.compute("bf16"):
            return AE.loss(p, x, c, cfg)[0]
    variants["fwd_loss"] = lambda: timeit(fwd_loss, params, xb, cb)

    @jax.jit
    def grad_norecon(p, x, c):
        with PREC.compute("bf16"):
            return jax.value_and_grad(loss_norecon)(p, x, c)
    variants["grad_norecon"] = lambda: timeit(grad_norecon, params, xb, cb)

    @jax.jit
    def grad_evalrecon(p, x, c):
        with PREC.compute("bf16"):
            return jax.value_and_grad(loss_evalrecon)(p, x, c)
    variants["grad_evalrecon"] = lambda: timeit(grad_evalrecon, params,
                                                xb, cb)

    @jax.jit
    def grad_full(p, x, c):
        with PREC.compute("bf16"):
            return jax.value_and_grad(AE.loss, has_aux=True)(p, x, c, cfg)
    variants["grad_full"] = lambda: timeit(grad_full, params, xb, cb)

    names = sys.argv[1:] or list(variants)
    for n in names:
        t0 = time.time()
        dt = variants[n]()
        print(f"{n:<16} {dt*1e3:7.1f} ms   (wall incl compile "
              f"{time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
