"""Structured metrics writer: wandb-compatible with a JSONL fallback.

The reference threads wandb through every model (SURVEY.md §2a #16).  Here a
single ``MetricsLogger`` owns the run: it forwards to wandb when available
and the mode is not 'disabled', and always appends JSONL records locally so
training is observable offline (this environment has no network egress).
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Mapping

from autovc_tpu.config import WandbConfig


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except (TypeError, ValueError):
        if hasattr(v, "item") and getattr(v, "size", 2) == 1:
            return v.item()
        if hasattr(v, "tolist") and getattr(v, "size", 1 << 30) <= 64:
            return v.tolist()
        return str(type(v).__name__)


class MetricsLogger:
    def __init__(self, cfg: WandbConfig = WandbConfig(),
                 log_dir: str = "logs", run_config: Mapping | None = None,
                 **wandb_overrides):
        self.cfg = cfg
        self.run = None
        self.jsonl_path = None
        self._t0 = time.time()

        os.makedirs(os.path.join(log_dir, cfg.project), exist_ok=True)
        self.jsonl_path = os.path.join(
            log_dir, cfg.project, f"metrics_{int(self._t0)}.jsonl")

        if cfg.mode != "disabled":
            try:
                import wandb
                self.run = wandb.init(
                    entity=cfg.entity, project=cfg.project, mode=cfg.mode,
                    reinit=cfg.reinit, save_code=cfg.save_code,
                    dir=os.path.join(log_dir, cfg.project),
                    config=dict(run_config or {}), **wandb_overrides)
            except Exception as e:  # no wandb / no network: fall back
                print(f"[metrics] wandb unavailable ({e}); JSONL only")
                self.run = None

    def log(self, metrics: Dict[str, Any], step: int | None = None) -> None:
        record = {k: _jsonable(v) for k, v in metrics.items()}
        record["_time"] = round(time.time() - self._t0, 3)
        if step is not None:
            record["_step"] = step
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.run is not None:
            self.run.log(metrics, step=step)

    def log_histogram(self, name: str, values, step: int | None = None,
                      bins: int = 24) -> None:
        """Log a value histogram — wandb.Histogram when live; the JSONL
        record always gets bin counts + summary stats.  Together with
        :meth:`log_tree_histograms` this covers the reference's
        ``run.watch(model)`` parameter/gradient histogram stream
        (auto_encoder/model.py:276-277, speaker_encoder/model.py:332-333)."""
        import numpy as np
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        counts, edges = np.histogram(v, bins=bins)
        record = {f"hist/{name}": {
            "count": int(v.size), "mean": float(v.mean()),
            "std": float(v.std()), "min": float(v.min()),
            "max": float(v.max()), "bins": counts.tolist(),
            "lo": float(edges[0]), "hi": float(edges[-1])}}
        record["_time"] = round(time.time() - self._t0, 3)
        if step is not None:
            record["_step"] = step
        with open(self.jsonl_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.run is not None:
            import wandb
            self.run.log({name: wandb.Histogram(
                np_histogram=(counts, edges))}, step=step)

    def log_tree_histograms(self, prefix: str, tree, step: int | None = None,
                            bins: int = 24) -> None:
        """Histogram every array leaf of a pytree (named by its key path)."""
        import jax
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            name = "/".join(
                str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            if hasattr(leaf, "shape"):
                self.log_histogram(f"{prefix}/{name}", leaf, step=step,
                                   bins=bins)

    def log_audio(self, name: str, wav, sr: int, caption: str = "",
                  step: int | None = None, save_dir: str | None = None):
        """Log converted audio — to wandb when live, else to a wav file."""
        if self.run is not None:
            import wandb
            self.run.log({name: wandb.Audio(wav, caption=caption,
                                            sample_rate=sr)}, step=step)
        elif save_dir:
            from autovc_tpu.audio import io
            os.makedirs(save_dir, exist_ok=True)
            io.save_wav(os.path.join(save_dir, f"{name}.wav"), wav, sr)

    def log_figure(self, name: str, fig, step: int | None = None,
                   save_dir: str | None = None) -> None:
        """Log a matplotlib figure — wandb Image when live, else a PNG under
        ``save_dir`` (defaults next to the JSONL log).  Mirrors the
        reference's mel-comparison / TSNE figure logging
        (auto_encoder/model.py:371-374, speaker_encoder/model.py:417-419)."""
        try:
            if self.run is not None:
                import wandb
                self.run.log({name: wandb.Image(fig)}, step=step)
            else:
                out_dir = save_dir or os.path.dirname(self.jsonl_path)
                os.makedirs(out_dir, exist_ok=True)
                suffix = f"_{step}" if step is not None else ""
                fig.savefig(os.path.join(out_dir, f"{name}{suffix}.png"))
        finally:
            import matplotlib.pyplot as plt
            plt.close(fig)

    def log_artifact(self, path: str, name: str, type_: str) -> None:
        if self.run is not None:
            import wandb
            artifact = wandb.Artifact(name, type_)
            artifact.add_file(path)
            self.run.log_artifact(artifact)

    def finish(self) -> None:
        if self.run is not None:
            self.run.finish()
            self.run = None
