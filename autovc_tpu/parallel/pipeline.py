"""Stage-level pipeline parallelism for batch conversion.

The reference's three-model chain (speaker encoder -> auto-encoder ->
WaveRNN; reference autovc/voice_converter.py:88-209) runs strictly
sequentially on one device.  SURVEY.md §2c marks this chain as a natural
inference pipeline: stage i lives on submesh i, utterances stream through,
and stage i of utterance j overlaps stage i-1 of utterance j+1.

TPU-native mechanics (no scheduler thread, no queues): JAX dispatch is
asynchronous, so a host loop that enqueues ``stage2(stage1(x_j))`` for each
utterance never blocks — XLA executes stage 1 of utterance j+1 on its own
devices while stage 2 of utterance j runs on different devices, and the
inter-stage handoff is an async device-to-device copy riding ICI.  The only
synchronization is the final host readback.

Each stage owns a disjoint device group; a group can be a single device or a
multi-device submesh (so DP-within-a-stage composes with the pipeline).
"""
from __future__ import annotations

from typing import Any, Callable, List, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class Stage:
    """One pipeline stage: a jitted fn + its params, pinned to a submesh."""

    def __init__(self, fn: Callable, params: Any, devices: Sequence):
        self.mesh = Mesh(np.asarray(devices).reshape(-1), ("stage",))
        self._repl = NamedSharding(self.mesh, P())
        self.params = jax.device_put(params, self._repl)
        self.fn = jax.jit(fn)

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

    def __init__(self, stages: Sequence[tuple], device_groups: Sequence):
        assert len(stages) == len(device_groups)
        used = set()
        for g in device_groups:
            ids = {d.id for d in g}
            assert not ids & used, "device groups must be disjoint"
            used |= ids
        self.stages = [Stage(fn, params, group)
                       for (fn, params), group in zip(stages, device_groups)]

    def __call__(self, *args):
        x = self.stages[0](*args)
        for stage in self.stages[1:]:
            x = stage(x)
        return x

    def run(self, items: Sequence) -> List[np.ndarray]:
        """Stream items through the pipeline; returns host arrays.

        The loop enqueues every item before reading any result back, so all
        stages run concurrently on their own device groups (software
        pipelining via async dispatch).
        """
        inflight = []
        for it in items:
            args = it if isinstance(it, tuple) else (it,)
            inflight.append(self(*args))
        return [np.asarray(o) for o in inflight]


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
                        overlap: float = 0.5) -> StagePipeline:
    """The AutoVC inference pipeline as two device-pinned stages:

      stage 0: chunked auto-encoder conversion + mean overlap-add merge
               (reference batch_forward, auto_encoder/model.py:395-437);
      stage 1: WaveRNN conditioning upsample -> fold -> sampling scan
               (reference generate, wavernn/model.py:214-329).

    ``run`` takes ``(chunks, c_org, c_trg, key)`` tuples per utterance and
    returns raw sample streams (still folded; unfold with
    ``wavernn.xfade_and_unfold`` on host, which is O(n) numpy).
    """
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.models import wavernn as WR

    def ae_stage(params, chunks, c_org, c_trg, key):
        mel = AE.batch_forward(params, chunks, c_org, c_trg, ae_cfg,
                               overlap=overlap)
        return mel, key

    def voc_stage(params, mel_and_key):
        mel, key = mel_and_key
        g = wr_cfg.generate
        cond, aux = WR._prepare_conditioning(params, mel[None], wr_cfg,
                                             g.target, g.overlap, True)
        return WR._generate_scan(params, cond, aux, key, wr_cfg)

    groups = split_devices(devices, 2)
    return StagePipeline([(ae_stage, ae_params), (voc_stage, wr_params)],
                         groups)
