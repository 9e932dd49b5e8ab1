"""Parallelism layer: mesh/sharding rules (DP/TP), pjit-sharded steps,
sequence-parallel ring recurrence (SP), and stage-pipeline parallelism (PP).
See docs/ARCHITECTURE.md and SURVEY.md §2c."""
from autovc_tpu.parallel.sharding import (make_mesh, param_shardings,
                                          replicated, shard_params)
from autovc_tpu.parallel.steps import (chunk_sharded_convert,
                                       initialize_distributed,
                                       make_sharded_ae_step,
                                       make_sharded_se_step, shard_batch)

__all__ = [
    "make_mesh", "param_shardings", "replicated", "shard_params",
    "initialize_distributed", "make_sharded_ae_step", "chunk_sharded_convert",
    "make_sharded_se_step", "shard_batch",
]
