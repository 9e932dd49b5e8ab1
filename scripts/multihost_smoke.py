#!/usr/bin/env python
"""Multi-host smoke: each process joins a jax.distributed cluster (env set by
``launcher.launch_local_multiprocess`` or a real pod), builds a global mesh
over all processes' devices, and runs one DP-sharded AutoVC train step.

Prints ``MULTIHOST_OK loss=<x> procs=<n> devices=<m>`` on success.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    # honour the env platform even where a sitecustomize pins another one
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    coord = os.environ.get("AUTOVC_COORD")
    if coord:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(os.environ["AUTOVC_NPROC"]),
            process_id=int(os.environ["AUTOVC_PID"]))
    else:
        jax.distributed.initialize()

    import numpy as np

    from autovc_tpu.config import AutoEncoderConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.parallel import sharding as shd
    from autovc_tpu.parallel import steps as psteps
    from autovc_tpu.train import schedules

    cfg = AutoEncoderConfig().with_overrides(
        spectrogram={"partial_utterance_n_frames": 32})
    params = AE.init(jax.random.PRNGKey(0), cfg)
    tx = schedules.make_optimizer(cfg.optimizer, steps_per_epoch=1)
    mesh = shd.make_mesh()
    dp = mesh.shape["data"]

    B = 2 * dp
    rng = np.random.default_rng(0)
    x = rng.random((B, 80, 32), dtype=np.float32)
    c = rng.standard_normal((B, 256)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)

    step = psteps.make_sharded_ae_step(cfg, tx, 0.9999, mesh, params)
    with jax.set_mesh(mesh):
        p = shd.shard_params(params, mesh)
        ema = shd.shard_params(params, mesh)
        opt = jax.device_put(tx.init(params), shd.tree_shardings_like(
            tx.init(params), shd.replicated(mesh)))
        # every process feeds its local batch shard
        per = B // jax.process_count()
        pid = jax.process_index()
        local_x = x[pid * per:(pid + 1) * per]
        local_c = c[pid * per:(pid + 1) * per]
        from jax.sharding import NamedSharding, PartitionSpec as P
        s = NamedSharding(mesh, P("data"))
        gx = jax.make_array_from_process_local_data(s, local_x, x.shape)
        gc = jax.make_array_from_process_local_data(s, local_c, c.shape)
        _, _, _, aux = step(p, opt, ema, gx, gc)
        loss = float(aux["loss"])
    if jax.process_index() == 0:
        print(f"MULTIHOST_OK loss={loss:.4f} procs={jax.process_count()} "
              f"devices={len(jax.devices())}")


if __name__ == "__main__":
    main()
