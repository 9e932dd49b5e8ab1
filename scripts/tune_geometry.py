"""Sweep WaveRNN serving geometry on the real chip.

Measures the Pallas sampling kernel's per-step time across fold-row counts
(slab sizes) and fold-length ladder entries, so `_FOLD_ROWS_KNEE`,
`_TARGET_LADDER` (models/wavernn.py) and the serving SLAB can be pinned to
measured numbers instead of guesses.

Usage:  python scripts/tune_geometry.py [T_steps]
Prints a rows-vs-throughput table and a fold-length table.
"""
from __future__ import annotations

import sys
import time

import numpy as np


def sync(x):
    np.asarray(x.ravel()[0:1])


def time_call(fn, k=8):
    out = fn(0)
    sync(out)
    t0 = time.time()
    out = fn(1)
    sync(out)
    t1 = time.time() - t0
    t0 = time.time()
    for i in range(2, 2 + k):
        out = fn(i)
    sync(out)
    tk = time.time() - t0
    return (tk - t1) / (k - 1)


def main():
    import jax

    from autovc_tpu.config import WaveRNNConfig
    from autovc_tpu.models import wavernn as WR
    from autovc_tpu.ops import wavernn_pallas as WRP

    cfg = WaveRNNConfig()
    params = WR.init(jax.random.PRNGKey(0), cfg)
    S = cfg.total_scale
    _, J = WR._composite_upsample_kernel(params["upsample"]["up_convs"],
                                         cfg.upsample_factors)
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 12_100
    assert T % S == 0, f"T must be a multiple of total_scale {S}"
    fpf = T // S
    rng = np.random.default_rng(0)

    def rows_inputs(rows, fpf):
        mel_rows = rng.random((rows, fpf + 2 * J, cfg.feat_dims),
                              dtype=np.float32)
        aux_rows = rng.random((rows, fpf, cfg.res_out_dims),
                              dtype=np.float32)
        return mel_rows, aux_rows

    print(f"rows sweep at T={T} steps "
          f"(backend={jax.default_backend()}):")
    print(f"{'rows':>5} {'us/step':>9} {'Msamples/s':>11}")
    for rows in (8, 16, 24, 32, 48, 64, 96, 128):
        mel_rows, aux_rows = rows_inputs(rows, fpf)
        dt = time_call(lambda i: WRP.generate_rows_pallas(
            params, mel_rows, aux_rows, jax.random.PRNGKey(i), cfg, True))
        print(f"{rows:>5} {dt / T * 1e6:>9.3f} {rows * T / dt / 1e6:>11.2f}")

    print("\nfold-length sweep (fixed 32 rows):")
    print(f"{'target':>7} {'T_steps':>8} {'us/step':>9} {'Msamples/s':>11}")
    for target in (2_750, 5_500, 11_000, 22_000, 44_000):
        t_steps = target + 2 * 550
        mel_rows, aux_rows = rows_inputs(32, t_steps // S)
        dt = time_call(lambda i: WRP.generate_rows_pallas(
            params, mel_rows, aux_rows, jax.random.PRNGKey(i), cfg, True),
            k=4)
        print(f"{target:>7} {t_steps:>8} {dt / t_steps * 1e6:>9.3f} "
              f"{32 * t_steps / dt / 1e6:>11.2f}")


if __name__ == "__main__":
    main()
