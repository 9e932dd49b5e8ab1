#!/usr/bin/env python
"""Convert reference PyTorch checkpoints to the native autovc_tpu format.

The reference distributes pretrained weights as three torch files
(``AutoVC_seed40_200k.pt``, ``SpeakerEncoder.pt``, ``WaveRNN_Pretrained.pyt``
— utils/hparams.py:132-136, fetched by scripts/setup/get_pretrained_models.sh).
This is the offline replacement for that fetch script: point it at the torch
files and it writes ``.ckpt`` pytrees (gate-order preserving, SE speaker
registry included).

Usage:
    python scripts/convert_reference_checkpoints.py \
        --auto_encoder models/AutoVC/AutoVC_seed40_200k.pt \
        --speaker_encoder models/SpeakerEncoder/SpeakerEncoder.pt \
        --vocoder models/WaveRNN/WaveRNN_Pretrained.pyt \
        --out_dir models/native
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--auto_encoder")
    ap.add_argument("--speaker_encoder")
    ap.add_argument("--vocoder")
    ap.add_argument("--out_dir", default="models/native")
    args = ap.parse_args()

    from autovc_tpu.utils import torch_compat
    from autovc_tpu.utils.checkpoint import save_checkpoint

    os.makedirs(args.out_dir, exist_ok=True)
    for model_type, path in [("auto_encoder", args.auto_encoder),
                             ("speaker_encoder", args.speaker_encoder),
                             ("vocoder", args.vocoder)]:
        if not path:
            continue
        params, extras = torch_compat.load_reference_checkpoint(path,
                                                                model_type)
        out = os.path.join(
            args.out_dir,
            os.path.splitext(os.path.basename(path))[0] + ".ckpt")
        save_checkpoint(out, {"params": params, **extras})
        print(f"{model_type}: {path} -> {out}")


if __name__ == "__main__":
    main()
