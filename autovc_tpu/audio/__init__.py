"""Audio container + preprocessing pipeline.

``Audio`` mirrors the reference class (``autovc/audio/__init__.py:12-106``):
wrap a wav + sample rate, resample, apply a named preprocessing pipeline, and
save.  Pipeline dispatch is by an explicit registry
(:data:`autovc_tpu.audio.tools.PIPELINE_FUNCS`) instead of reflection over a
module ``__dict__``.
"""
from __future__ import annotations

import numpy as np

from autovc_tpu.audio import dsp, io, tools

__all__ = ["Audio", "dsp", "io", "tools"]

_VAD_SRS = np.array([8000, 16000, 32000, 48000])


class Audio:
    def __init__(self, wav, sr: int | None = None, sr_org: int | None = None):
        """Load or wrap audio data.

        Parameters mirror the reference (audio/__init__.py:13-49): ``wav`` is
        a path or an array; ``sr`` triggers a resample; ``sr_org`` declares the
        rate of array input.
        """
        if isinstance(wav, str):
            self.wav_path = wav
            self.wav, self.sr = io.load_wav(wav, sr=sr_org)
        else:
            assert sr_org is not None, "sr_org must be given for array input"
            self.wav_path = None
            self.wav = np.asarray(wav, dtype=np.float32)
            self.sr = sr_org
        if sr is not None:
            self.resample(sr)

    def save(self, save_path: str = "example_audio.wav"):
        io.save_wav(save_path, self.wav, self.sr)

    def resample(self, sr: int):
        if sr != self.sr:
            self.wav = io.resample(self.wav, self.sr, sr)
            self.sr = sr
        return self

    @property
    def duration(self) -> float:
        return len(self.wav) / self.sr

    def preprocess(self, *pipeline, **kwargs):
        """Apply named tools from :mod:`autovc_tpu.audio.tools` in order.

        Shared kwargs are routed to every function that accepts them, and a
        ``trim_long_silences`` stage first snaps the sample rate to the nearest
        VAD-supported rate — both reference behaviours
        (audio/__init__.py:70-106).
        """
        if "trim_long_silences" in pipeline:
            sr = int(_VAD_SRS[np.argmin(abs(_VAD_SRS - self.sr))])
            self.resample(sr)

        for name in pipeline:
            if name is None:
                continue
            if name not in tools.PIPELINE_FUNCS:
                raise ValueError(
                    f"'{name}' is not a known audio tool; options: "
                    f"{sorted(tools.PIPELINE_FUNCS)}")
            func, allowed = tools.PIPELINE_FUNCS[name]
            func_kwargs = {k: v for k, v in kwargs.items() if k in allowed}
            if "sr" in allowed:
                func_kwargs["sr"] = self.sr
            self.wav = np.asarray(func(self.wav, **func_kwargs),
                                  dtype=np.float32)
        return self
