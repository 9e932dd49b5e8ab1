"""Round-4 experiment: WaveRNN rows-kernel throughput vs fold-row count,
and loop-unroll variants.  Locates the real knee so auto geometry and the
kernel's inner loop can be tuned to >=60% honest MFU (VERDICT r3 #4).
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


def timeit(f, K=8):
    out = f(0)
    sync(out)
    best = None
    for _ in range(3):
        t0 = time.time(); out = f(100); sync(out); t1 = time.time() - t0
        t0 = time.time()
        for i in range(K):
            out = f(i)
        sync(out)
        tK = time.time() - t0
        per = (tK - t1) / (K - 1)
        best = per if best is None else min(best, per)
    return best


def main():
    setup()
    import jax
    import jax.numpy as jnp

    from autovc_tpu.config import WaveRNNConfig
    from autovc_tpu.models import wavernn as WR
    from autovc_tpu.ops import wavernn_pallas as WRP
    from autovc_tpu.utils import roofline as RL

    cfg = WaveRNNConfig()
    params = WR.init(jax.random.PRNGKey(0), cfg)
    spec = RL.chip_spec()
    S = cfg.total_scale
    # geometry of the r3 bench workload: target 2750 -> fpf = (2750+1100)/275
    target, overlap = 2750, 550
    fpf = (target + 2 * overlap) // S
    from autovc_tpu.models.wavernn import _composite_upsample_kernel
    _, J = _composite_upsample_kernel(params["upsample"]["up_convs"],
                                      cfg.upsample_factors)
    rng = np.random.default_rng(0)
    rows_list = [int(r) for r in (sys.argv[1:] or
                                  [8, 16, 24, 32, 40, 48, 64])]
    T_steps = fpf * S
    for rows in rows_list:
        mel_rows = jnp.asarray(rng.random((rows, fpf + 2 * J, 80),
                                          dtype=np.float32))
        aux_rows = jnp.asarray(rng.random((rows, fpf, cfg.res_out_dims),
                                          dtype=np.float32))

        def f(i):
            return WRP.generate_rows_pallas(params, mel_rows, aux_rows,
                                            jax.random.PRNGKey(i), cfg,
                                            True)

        dt = timeit(f)
        fl, by = RL.wavernn_step_cost(cfg, rows)
        tf = fl * T_steps / dt / 1e12
        mfu = 100 * tf / spec.peak_bf16_tflops
        print(f"rows={rows:<4} {dt*1e3:7.2f} ms  {rows*T_steps/dt/1e6:7.2f} "
              f"Msamples/s  {tf:6.1f} TF/s  {mfu:5.1f}% bf16 MFU  "
              f"{dt/T_steps*1e6:6.3f} us/step", flush=True)


if __name__ == "__main__":
    main()
