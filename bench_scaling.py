"""DP scaling-efficiency harness (BASELINE.md: >=80% DP scaling efficiency
at N>=2) — measures sharded AE train-step throughput at mesh sizes
1/2/4/8 with a FIXED per-device batch (weak scaling), and reports
efficiency(N) = throughput(N) / (N * throughput(1)).

On this box it runs against the 8-device virtual CPU mesh (2 physical
cores), so the printed efficiencies measure the *machinery*, not hardware
scaling; on a real multi-chip TPU slice the same harness produces the
BASELINE number.  Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python bench_scaling.py

Prints one JSON line with per-N throughput and efficiency.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main():
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax

    # a sitecustomize hook pins the platform at interpreter start; honour an
    # explicit JAX_PLATFORMS request (the CPU-mesh invocation in the
    # docstring) over the pin
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from autovc_tpu.config import AutoEncoderConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.parallel import sharding as shd
    from autovc_tpu.parallel import steps as psteps
    from autovc_tpu.train import schedules

    devices = jax.devices()
    sizes = [n for n in (1, 2, 4, 8) if n <= len(devices)]
    per_device_batch = int(os.environ.get("AUTOVC_SCALING_BATCH", "2"))
    T = int(os.environ.get("AUTOVC_SCALING_FRAMES", "64"))
    n_steps = int(os.environ.get("AUTOVC_SCALING_STEPS", "6"))

    cfg = AutoEncoderConfig().with_overrides(
        spectrogram={"partial_utterance_n_frames": T})
    params = AE.init(jax.random.PRNGKey(0), cfg)
    tx = schedules.make_optimizer(cfg.optimizer, steps_per_epoch=8)
    rng = np.random.default_rng(0)

    results = {}
    for n in sizes:
        mesh = shd.make_mesh((n,), ("data",), devices=devices[:n])
        B = per_device_batch * n
        x = rng.random((B, 80, T), dtype=np.float32)
        c = rng.standard_normal((B, 256)).astype(np.float32)
        c /= np.linalg.norm(c, axis=1, keepdims=True)

        step = psteps.make_sharded_ae_step(cfg, tx, ema_decay=0.9999,
                                           mesh=mesh, params_example=params)
        with jax.set_mesh(mesh):
            p = shd.shard_params(params, mesh)
            ema = shd.shard_params(params, mesh)
            opt = jax.device_put(
                tx.init(params),
                shd.tree_shardings_like(tx.init(params),
                                        shd.replicated(mesh)))
            xs = psteps.shard_batch(x, mesh)
            cs = psteps.shard_batch(c, mesh)
            p, opt, ema, aux = step(p, opt, ema, xs, cs)   # compile
            jax.block_until_ready(aux["loss"])
            t0 = time.time()
            for _ in range(n_steps):
                p, opt, ema, aux = step(p, opt, ema, xs, cs)
            jax.block_until_ready(aux["loss"])
            dt = (time.time() - t0) / n_steps
        # audio-seconds consumed per second (12.5 ms per frame)
        results[n] = {"ms_per_step": round(dt * 1e3, 1),
                      "audio_s_per_s": round(B * T * 0.0125 / dt, 2)}
        print(f"# N={n}: batch {B}, {dt*1e3:.1f} ms/step, "
              f"{results[n]['audio_s_per_s']} audio-s/s", file=sys.stderr)

    base = results[sizes[0]]["audio_s_per_s"]
    for n in sizes:
        results[n]["efficiency"] = round(
            results[n]["audio_s_per_s"] / (n * base), 3)

    # ---- DP-sharded vocoder serving (fold-row axis over 'data') ----------
    # generate_many's union fold batch is embarrassingly parallel over rows:
    # sharding the row axis splits the sampling scan's per-step matmuls
    # across devices with zero collectives until the readback.
    from autovc_tpu.config import WaveRNNConfig
    from autovc_tpu.models import wavernn as WR

    wr_cfg = WaveRNNConfig().with_overrides(
        rnn_dims=128, fc_dims=128, compute_dims=32, res_out_dims=16,
        res_blocks=2)
    wr_params = WR.init(jax.random.PRNGKey(1), wr_cfg)
    rows_per_dev = int(os.environ.get("AUTOVC_SCALING_VOC_ROWS", "2"))
    T_steps = int(os.environ.get("AUTOVC_SCALING_VOC_STEPS", "1100"))
    voc = {}
    for n in sizes:
        mesh = shd.make_mesh((n,), ("data",), devices=devices[:n])
        rows = rows_per_dev * n
        cond = rng.random((rows, T_steps, 80), dtype=np.float32)
        aux = rng.random((rows, T_steps, wr_cfg.res_out_dims),
                         dtype=np.float32)
        with jax.set_mesh(mesh):
            cs = psteps.shard_batch(cond, mesh)
            as_ = psteps.shard_batch(aux, mesh)
            key = jax.random.PRNGKey(0)
            out = WR._generate_scan(wr_params, cs, as_, key, wr_cfg, True, 1)
            jax.block_until_ready(out)                 # compile
            t0 = time.time()
            for i in range(3):
                out = WR._generate_scan(wr_params, cs, as_,
                                        jax.random.PRNGKey(i), wr_cfg,
                                        True, 1)
            jax.block_until_ready(out)
            dt = (time.time() - t0) / 3
        voc[n] = {"ms": round(dt * 1e3, 1),
                  "samples_per_s": round(rows * T_steps / dt, 0)}
        print(f"# voc N={n}: {rows} rows, {dt*1e3:.1f} ms, "
              f"{voc[n]['samples_per_s']:.0f} samples/s", file=sys.stderr)
    vbase = voc[sizes[0]]["samples_per_s"]
    for n in sizes:
        voc[n]["efficiency"] = round(voc[n]["samples_per_s"] / (n * vbase), 3)

    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "sizes": sizes,
        "results": {str(k): v for k, v in results.items()},
        "efficiency_at_max": results[sizes[-1]]["efficiency"],
        "vocoder": {str(k): v for k, v in voc.items()},
        "vocoder_efficiency_at_max": voc[sizes[-1]]["efficiency"],
        "physical_cores": os.cpu_count(),
        "platform": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
