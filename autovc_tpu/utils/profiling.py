"""Profiling / tracing hooks.

The reference's only observability is wall-clock sec/step prints
(auto_encoder/model.py:334-335) and a vocoder kHz display
(wavernn/model.py:332-336).  Here: ``jax.profiler`` trace capture (viewable
in XProf/TensorBoard), a step timer with device sync, and throughput
accounting in the BASELINE metric (audio-seconds/s/chip).
"""
from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "logs/profile"):
    """Capture a device trace: ``with profiling.trace(): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def sync(tree):
    """Force completion AND host visibility of every array in the tree.

    (``block_until_ready`` alone does not round-trip through the remote-TPU
    tunnel used in some environments; a host transfer does.)
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(leaf)
    return tree


class StepTimer:
    """Rolling throughput accounting for training/conversion loops."""

    def __init__(self, sr: int = 22050, hop_length: int = 275):
        self.sr = sr
        self.hop_length = hop_length
        self.reset()

    def reset(self):
        self.t0 = time.time()
        self.steps = 0
        self.frames = 0

    def tick(self, n_frames: int = 0):
        self.steps += 1
        self.frames += n_frames

    @property
    def sec_per_step(self) -> float:
        return (time.time() - self.t0) / max(self.steps, 1)

    @property
    def audio_seconds_per_second(self) -> float:
        """Processed audio-seconds per wall-clock second (the BASELINE
        throughput metric)."""
        audio_s = self.frames * self.hop_length / self.sr
        return audio_s / max(time.time() - self.t0, 1e-9)

    def metrics(self) -> dict:
        return {"sec_per_step": self.sec_per_step,
                "audio_s_per_s": self.audio_seconds_per_second}
