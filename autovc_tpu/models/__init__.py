"""Uniform model loader facade (mirrors ``autovc/models.py:9-54``).

``load_model(model_type, ...)`` resolves a checkpoint path, loads native
``.ckpt`` files directly, and converts reference PyTorch ``.pt``/``.pyt``
files via :mod:`autovc_tpu.utils.torch_compat`.  When no checkpoint exists it
returns freshly initialised parameters (seeded), so the framework is usable
without pretrained blobs (none ship with the reference either).
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import numpy as np

from autovc_tpu.config import (AutoEncoderConfig, ConverterConfig,
                               SpeakerEncoderConfig, WaveRNNConfig)
from autovc_tpu.utils import checkpoint as ckpt_util

MODEL_TYPES = ("auto_encoder", "speaker_encoder", "vocoder")


@dataclass
class LoadedModel:
    model_type: str
    params: Any
    config: Any
    step: int = 0
    extras: Dict[str, Any] = field(default_factory=dict)

    @property
    def speakers(self) -> Dict[str, np.ndarray]:
        """Mean-speaker registry (speaker_encoder only); rides in the
        checkpoint like the reference's (speaker_encoder/model.py:106-114)."""
        return self.extras.setdefault("speakers", {})


def _init_params(model_type: str, config, seed: int = 0):
    key = jax.random.PRNGKey(seed)
    if model_type == "auto_encoder":
        from autovc_tpu.models import autoencoder
        return autoencoder.init(key, config)
    if model_type == "speaker_encoder":
        from autovc_tpu.models import speaker_encoder
        return speaker_encoder.init(key, config)
    if model_type == "vocoder":
        from autovc_tpu.models import wavernn
        return wavernn.init(key, config)
    raise ValueError(f"'{model_type}' is not a supported model_type; "
                     f"choose from {MODEL_TYPES}")


def default_config(model_type: str):
    return {"auto_encoder": AutoEncoderConfig,
            "speaker_encoder": SpeakerEncoderConfig,
            "vocoder": WaveRNNConfig}[model_type]()


def artifact_cache_dir() -> str:
    """Local model-artifact cache (name -> file), the offline half of the
    reference's wandb artifact registry (voice_converter.py:462-478)."""
    return os.path.expanduser(
        os.environ.get("AUTOVC_MODEL_CACHE", "~/.cache/autovc_tpu/models"))


def resolve_artifact(model_name: str, model_dir: str,
                     verbose: bool = True) -> str | None:
    """Resolve a checkpoint name to a local file.

    Resolution order mirrors the reference's artifact lookup
    (voice_converter.py:460-478): explicit path -> model_dir/name -> the
    local artifact cache -> a wandb artifact download when a run is live.
    Returns None when the name cannot be resolved.
    """
    if os.path.isfile(model_name):
        return model_name
    cand = os.path.join(model_dir.rstrip("/"), model_name)
    if os.path.isfile(cand):
        return cand
    cached = os.path.join(artifact_cache_dir(), model_name)
    if os.path.isfile(cached):
        return cached
    # wandb artifact fetch (reference voice_converter.py:462-478): only when
    # a run is active — never from unit tests / offline use.
    try:
        import wandb
        if wandb.run is not None:
            name = os.path.splitext(model_name)[0]
            artifact = wandb.run.use_artifact(f"{name}:latest")
            adir = artifact.download(root=artifact_cache_dir())
            for f in sorted(os.listdir(adir)):
                if f == model_name or f.startswith(name):
                    return os.path.join(adir, f)
    except Exception as e:
        if verbose:
            print(f"[registry] wandb artifact lookup for "
                  f"'{model_name}' failed: {e}")
    return None


def load_model(model_type: str, model_name: str | None = None,
               model_dir: str | None = None, config=None,
               seed: int = 0, verbose: bool = True,
               missing_ok: bool = False) -> LoadedModel:
    """Construct (and optionally restore) one model.

    Resolution order: explicit path -> model_dir/model_name -> artifact
    cache -> wandb artifact (when a run is live) -> error.  A missing
    *requested* checkpoint raises (a typo'd name must not silently train
    from scratch); ``model_name=None`` or ``missing_ok=True`` opts into
    fresh init.
    """
    if model_type not in MODEL_TYPES:
        raise ValueError(f"'{model_type}' is not a supported model_type; "
                         f"choose from {MODEL_TYPES}")
    config = config if config is not None else default_config(model_type)
    model_dir = model_dir if model_dir is not None else config.model_dir

    path = resolve_artifact(model_name, model_dir,
                            verbose=verbose) if model_name else None

    if path is None:
        if model_name and not missing_ok:
            raise FileNotFoundError(
                f"[{model_type}] checkpoint '{model_name}' not found: not a "
                f"file, not in '{model_dir}', not in the artifact cache "
                f"('{artifact_cache_dir()}'), and no live wandb run to fetch "
                f"from.  Pass model_name=None for a fresh init, or "
                f"missing_ok=True to fall back to one explicitly.")
        if verbose:
            tag = (f"requested '{model_name}' missing; " if model_name
                   else "no checkpoint requested; ")
            print(f"[{model_type}] {tag}using fresh init")
        return LoadedModel(model_type, _init_params(model_type, config, seed),
                           config)

    if ckpt_util._is_torch_checkpoint(path):
        from autovc_tpu.utils import torch_compat
        params, extras = torch_compat.load_reference_checkpoint(path,
                                                                model_type)
        step = extras.pop("step", 0) or 0
        if verbose:
            print(f"[{model_type}] converted PyTorch checkpoint '{path}' "
                  f"(step {step})")
        return LoadedModel(model_type, params, config, step, extras)

    blob = ckpt_util.load_checkpoint(path)
    params = blob.pop("params")
    step = blob.pop("step", 0) or 0
    if verbose:
        print(f"[{model_type}] loaded '{path}' (step {step})")
    return LoadedModel(model_type, params, config, step, blob)


def load_models(model_types, model_names, model_dirs=None, configs=None,
                verbose: bool = True):
    """Load several models at once (mirrors models.py:38-54)."""
    n = len(model_types)
    model_dirs = model_dirs or [None] * n
    configs = configs or [None] * n
    return [load_model(t, name, d, c, verbose=verbose)
            for t, name, d, c in zip(model_types, model_names, model_dirs,
                                     configs)]


def save_model(model: LoadedModel, model_name: str,
               save_dir: str | None = None, **extra_payload) -> str:
    """Persist a model in the native format; extras (speaker registry, EMA,
    optimizer state) ride along."""
    save_dir = save_dir or model.config.model_dir
    path = os.path.join(save_dir.rstrip("/"), model_name)
    payload = {"step": model.step, "params": model.params,
               **model.extras, **extra_payload}
    ckpt_util.save_checkpoint(path, payload)
    return path
