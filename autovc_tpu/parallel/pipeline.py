"""Stage-level pipeline parallelism for batch conversion.

The reference's three-model chain (speaker encoder -> auto-encoder ->
WaveRNN; reference autovc/voice_converter.py:88-209) runs strictly
sequentially on one device.  SURVEY.md §2c marks this chain as a natural
inference pipeline: stage i lives on submesh i, utterances stream through,
and stage i of utterance j overlaps stage i-1 of utterance j+1.

TPU-native mechanics (no scheduler thread, no queues): JAX dispatch is
asynchronous, so a host loop that enqueues ``stage2(stage1(x_j))`` never
blocks — XLA executes stage 1 of utterance j+1 on its own devices while
stage 2 of utterance j runs on different devices, and the inter-stage
handoff is an async device-to-device copy riding ICI.  The only
synchronization is the final host readback, and ``run`` bounds the number
of in-flight items so device memory stays constant for any batch size.

Each stage owns a disjoint device group; a group can be a single device or a
multi-device submesh (so DP-within-a-stage composes with the pipeline).

The vocoder stage is FIRST-CLASS: it runs the same fused program as the
single-device serving path (``wavernn._generate_program`` — Pallas rows
kernel when the geometry admits it, auto fold geometry, on-device
crossfade-unfold/trim/fade tail), so pipeline output needs no host-side
post-processing and the two serving modes share one vocoder code path.
"""
from __future__ import annotations

from collections import deque
from typing import Any, Callable, List, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class Stage:
    """One pipeline stage: a fn + its params, pinned to a submesh.

    ``jit=False`` for fns that are already composed of jitted programs
    (e.g. module-level jits with static args): placement still follows the
    committed shardings of params/args, so the stage stays device-pinned.
    """

    def __init__(self, fn: Callable, params: Any, devices: Sequence,
                 jit: bool = True):
        self.mesh = Mesh(np.asarray(devices).reshape(-1), ("stage",))
        self._repl = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, self._repl)
        self.fn = jax.jit(fn) if jit else fn

    def __call__(self, *args):
        # Pin non-param inputs to this stage's devices; params are resident.
        args = [a if isinstance(a, (int, float))
                else jax.device_put(a, self._repl) for a in args]
        return self.fn(self.params, *args)


class StagePipeline:
    """Compose stages over disjoint device groups and stream items through.

    >>> pipe = StagePipeline([(ae_fn, ae_params), (voc_fn, voc_params)],
    ...                      device_groups=[devs[:4], devs[4:]])
    >>> outs = pipe.run(items)        # list of host arrays
    """

    def __init__(self, stages: Sequence[tuple], device_groups: Sequence,
                 jit: bool = True):
        assert len(stages) == len(device_groups)
        used = set()
        for g in device_groups:
            ids = {d.id for d in g}
            assert not ids & used, "device groups must be disjoint"
            used |= ids
        self.stages = [Stage(fn, params, group, jit=jit)
                       for (fn, params), group in zip(stages, device_groups)]

    def __call__(self, *args):
        x = self.stages[0](*args)
        for stage in self.stages[1:]:
            x = stage(x)
        return x

    def run(self, items: Sequence, max_inflight: int = 4) -> List[np.ndarray]:
        """Stream items through the pipeline; returns host arrays.

        Dispatch runs ahead of collection by at most ``max_inflight`` items:
        enough look-ahead that every stage always has work (full software
        pipelining via async dispatch), while in-flight device memory stays
        O(max_inflight) instead of O(len(items)).
        """
        assert max_inflight >= 2, "pipelining needs >= 2 in-flight items"
        results: List[np.ndarray] = []
        inflight: deque = deque()
        for it in items:
            if len(inflight) >= max_inflight:
                results.append(np.asarray(inflight.popleft()))
            args = it if isinstance(it, tuple) else (it,)
            inflight.append(self(*args))
        while inflight:
            results.append(np.asarray(inflight.popleft()))
        return results


def split_devices(devices: Sequence | None = None,
                  n_stages: int = 2) -> List[List]:
    """Partition the device list into ``n_stages`` contiguous groups
    (contiguous IDs = neighbouring chips = handoffs ride one ICI hop)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    assert n >= n_stages, f"need >= {n_stages} devices, have {n}"
    base, rem = divmod(n, n_stages)
    groups, i = [], 0
    for s in range(n_stages):
        size = base + (1 if s < rem else 0)
        groups.append(devices[i:i + size])
        i += size
    return groups


def conversion_pipeline(ae_params, wr_params, ae_cfg, wr_cfg,
                        devices: Sequence | None = None,
                        overlap: float = 0.5,
                        ae_precision: str = "auto",
                        backend: str = "auto",
                        fast_math: bool = True,
                        unroll: int = 4) -> StagePipeline:
    """The AutoVC inference pipeline as two device-pinned stages:

      stage 0: chunked auto-encoder conversion + mean overlap-add merge
               (reference batch_forward, auto_encoder/model.py:395-437);
      stage 1: the COMPLETE fused vocoder program — conditioning, fold,
               sampling (Pallas rows kernel on TPU / XLA scan elsewhere,
               auto fold geometry) and the on-device crossfade-unfold/trim/
               fade tail (reference generate, wavernn/model.py:214-329).

    ``run`` takes ``(chunks, c_org, c_trg, key)`` tuples per utterance and
    returns FINISHED float32 waveforms — the identical tail the slab
    serving path produces (one shared code path, wavernn._finish).
    """
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.models import wavernn as WR

    g = wr_cfg.generate
    groups = split_devices(devices, 2)
    # Pallas kernels carry no GSPMD sharding rule: a stage whose group has
    # more than one device compiles an SPMD program over its submesh and
    # must stay on the pure-XLA paths (the same invariant
    # steps.chunk_sharded_convert enforces with fast_kernels=False).
    ae_fast = False if len(groups[0]) > 1 else None
    voc_backend = "xla" if len(groups[1]) > 1 else backend

    def ae_stage(params, chunks, c_org, c_trg, key):
        mel = AE.batch_forward_jit(params, chunks, c_org, c_trg, ae_cfg,
                                   overlap, ae_precision,
                                   fast_kernels=ae_fast)
        return mel, key

    def voc_stage(params, mel_and_key):
        # geometry/flags threaded from wr_cfg.generate exactly as the slab
        # path (WR.generate) resolves them, so the two serving modes stay
        # behaviorally identical under non-default configs
        mel, key = mel_and_key
        t_total = (int(mel.shape[-1]) - 1) * wr_cfg.hop_length
        target = (WR.auto_fold_target(t_total, g.overlap, wr_cfg)
                  if g.auto_target else g.target)
        be = WR.resolve_backend(voc_backend, wr_cfg, target, g.overlap,
                                g.batched, False, int(mel.shape[-1]),
                                fast_math)
        mu_law = g.mu_law and wr_cfg.mode == "RAW"
        return WR._generate_program(params, mel[None], key, wr_cfg, target,
                                    g.overlap, g.batched, mu_law, fast_math,
                                    unroll, be, False)
    # jit=False: both stages are already built from module-level jitted
    # programs with static-arg geometry; re-jitting would capture the
    # Python-side geometry dispatch in a single trace.
    return StagePipeline([(ae_stage, ae_params), (voc_stage, wr_params)],
                         groups, jit=False)
