#!/usr/bin/env python
"""End-to-end mel-reconstruction parity harness vs a reference checkpoint.

BASELINE.md demands "mel reconstruction allclose (rtol 1e-3) vs the PyTorch
reference on data/samples".  The reference's pretrained blobs are absent
(/root/reference/.MISSING_LARGE_BLOBS), so this harness is the standing
machinery: point it at any reference-format AutoVC ``.pt`` file (real or
mirror-generated) and it

  1. loads the weights into BOTH the torch mirror architecture and the
     autovc_tpu model via ``load_model``/``torch_compat``,
  2. computes the AE-path mel of each sample wav (our DSP front-end on both
     sides — identical inputs isolate model parity from DSP parity),
  3. runs both forward passes and reports per-file mel MSE and the global
     allclose verdict at rtol 1e-3 / atol 1e-4.

Usage:
    python scripts/eval_reference_parity.py --auto_encoder AutoVC.pt \
        [--samples /root/reference/data/samples] [--max_files N]
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def evaluate(auto_encoder: str, samples: str = "/root/reference/data/samples",
             max_files: int | None = None, max_seconds: float | None = None,
             rtol: float = 1e-3, atol: float = 1e-4,
             mirror_pt: str | None = None):
    """``auto_encoder`` may be a reference-format ``.pt`` OR a native
    ``.ckpt`` (e.g. one produced by convert->save): the torch-mirror side
    then loads from ``mirror_pt`` (defaults to ``auto_encoder``, which must
    be a ``.pt`` in that case)."""
    import torch

    from autovc_tpu.audio import dsp, io
    from autovc_tpu.config import AutoEncoderConfig
    from autovc_tpu.models import autoencoder as AE
    from autovc_tpu.models import load_model

    # torch mirror side (test-only architecture re-expression of the
    # reference modules; state-dict names match, so the file loads directly)
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    try:
        from torch_mirrors import MirrorAutoVC
    finally:
        sys.path.pop(0)

    cfg = AutoEncoderConfig()
    loaded = load_model("auto_encoder", auto_encoder, verbose=False)
    mirror = MirrorAutoVC()
    blob = torch.load(mirror_pt or auto_encoder, map_location="cpu",
                      weights_only=False)
    state = blob["model_state"] if isinstance(blob, dict) and \
        "model_state" in blob else blob
    mirror.load_state_dict(state)
    mirror.eval()

    rng = np.random.default_rng(0)
    c = rng.standard_normal((1, 256)).astype(np.float32)
    c /= np.linalg.norm(c)

    wavs = sorted(f for f in os.listdir(samples) if f.endswith(".wav"))
    if max_files:
        wavs = wavs[:max_files]
    per_file, ok = {}, True
    for name in wavs:
        wav, sr = io.load_wav(os.path.join(samples, name),
                              sr=cfg.spectrogram.sr)
        if max_seconds:
            wav = wav[: int(max_seconds * sr)]
        mel = dsp.mel_spec_auto_encoder(wav, cfg.spectrogram)
        # trim to a freq multiple so both sides see the same static shape
        T = (mel.shape[-1] // cfg.freq) * cfg.freq
        mel = mel[:, :T].astype(np.float32)

        with torch.no_grad():
            _, post_ref, _ = mirror(torch.tensor(mel[None]),
                                    torch.tensor(c), torch.tensor(c))
        post_ref = post_ref.numpy()[0]
        _, post, _, _ = AE.forward(loaded.params, mel[None], c, c, cfg)
        post = np.asarray(post)[0]

        mse = float(np.mean((post - post_ref) ** 2))
        close = bool(np.allclose(post, post_ref, rtol=rtol, atol=atol))
        ok = ok and close
        per_file[name] = {"mel_mse": mse, "allclose": close}

    return {"allclose_rtol1e3": ok,
            "mel_mse": float(np.mean([v["mel_mse"]
                                      for v in per_file.values()])),
            "files": per_file}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--auto_encoder", required=True)
    ap.add_argument("--samples", default="/root/reference/data/samples")
    ap.add_argument("--max_files", type=int, default=None)
    ap.add_argument("--max_seconds", type=float, default=None)
    ap.add_argument("--mirror_pt", default=None,
                    help="reference-format .pt for the torch-mirror side "
                         "when --auto_encoder is a native .ckpt")
    args = ap.parse_args()
    report = evaluate(args.auto_encoder, args.samples, args.max_files,
                      args.max_seconds, mirror_pt=args.mirror_pt)
    print(json.dumps(report, indent=2))
    sys.exit(0 if report["allclose_rtol1e3"] else 1)


if __name__ == "__main__":
    main()
