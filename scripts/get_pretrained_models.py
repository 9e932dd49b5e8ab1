#!/usr/bin/env python
"""Pretrained-model bootstrap: fetch reference checkpoints into the cache.

Python analogue of the reference's gdown script
(``scripts/setup/get_pretrained_models.sh:1-56``): resolves a model type
(+ optional variant name) to its published Google-Drive file ID, downloads
it into the local artifact cache (``models.artifact_cache_dir()``), and
sanity-loads it through ``load_model`` (which converts the PyTorch format
to the native pytree on the fly, ``utils/torch_compat``).

This environment has no network egress, so downloads are gated: with
``--offline-ok`` (or when the fetch fails) the script only reports what it
WOULD fetch and where it would land.  ``--from-file`` installs an
already-downloaded blob into the cache instead (the common path on an
air-gapped TPU pod: stage the file once, install everywhere).

Usage:
    python scripts/get_pretrained_models.py -t WaveRNN
    python scripts/get_pretrained_models.py -t AutoVC -n basic
    python scripts/get_pretrained_models.py -t AutoVC -n SMK \
        --from-file /staging/AutoVC_SMK.pt
"""
from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

# Published file IDs from the reference bootstrap
# (get_pretrained_models.sh:18-29).
DRIVE_IDS = {
    ("WaveRNN", None): ("WaveRNN_Pretrained.pyt",
                        "1dtkRFL83Iya1wBt0ucBBb0Q4i5GlU6IF"),
    ("SpeakerEncoder", None): ("SpeakerEncoder.pt",
                               "1j-M5KoqvJWJINJLXyhz403gTuZTm4kwV"),
    ("AutoVC", "basic"): ("AutoVC_basic.pt",
                          "1jKTxQUhBXNVi38C43YuDIg46QdAPgGrH"),
    ("AutoVC", "origin"): ("AutoVC_origin.pt",
                           "1Pjhk-lb9QW4EzsUSzlpns0NOIKrHoBlU"),
    ("AutoVC", "SMK"): ("AutoVC_SMK.pt",
                        "1npx7nzdVapSbZg5wkHFFGbSvUPLstF_A"),
    ("AutoVC", "seed40_200k"): ("AutoVC_seed40_200k.pt",
                                "1ovdribZLkx1Wky5IHEt2_1Ibo9AI3jbt"),
}

MODEL_TYPE_BY_KIND = {"WaveRNN": "vocoder",
                      "SpeakerEncoder": "speaker_encoder",
                      "AutoVC": "auto_encoder"}


def resolve(kind: str, name: str | None):
    key = (kind, name if kind == "AutoVC" else None)
    if kind == "AutoVC" and name is None:
        raise SystemExit(
            "AutoVC needs a variant via -n, one of: "
            + ", ".join(n for k, n in DRIVE_IDS if k == "AutoVC"))
    if key not in DRIVE_IDS:
        valid = sorted({k for k, _ in DRIVE_IDS})
        raise SystemExit(f"unknown model '{kind}' (name={name!r}); "
                         f"types: {valid}")
    return DRIVE_IDS[key]


def fetch(file_id: str, dest: str, timeout: float = 60.0) -> bool:
    """Best-effort Google-Drive download (the gdown 'uc?id=' endpoint)."""
    import urllib.request
    url = f"https://drive.google.com/uc?id={file_id}&export=download"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(dest + ".part", "wb") as f:
            shutil.copyfileobj(r, f)
        os.replace(dest + ".part", dest)
        return True
    except Exception as e:
        print(f"download failed ({e}); this environment may have no "
              f"network egress", file=sys.stderr)
        for p in (dest + ".part",):
            if os.path.exists(p):
                os.remove(p)
        return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", "--type", required=True,
                    help="WaveRNN | SpeakerEncoder | AutoVC")
    ap.add_argument("-n", "--name", default=None,
                    help="AutoVC variant (basic/origin/SMK/seed40_200k)")
    ap.add_argument("--from-file", default=None,
                    help="install a locally staged blob instead of "
                         "downloading")
    ap.add_argument("--offline-ok", action="store_true",
                    help="exit 0 after printing the plan when the network "
                         "is unavailable")
    ap.add_argument("--no-verify", action="store_true",
                    help="skip the load_model sanity conversion")
    args = ap.parse_args()

    from autovc_tpu.models import artifact_cache_dir, load_model

    fname, file_id = resolve(args.type, args.name)
    cache = artifact_cache_dir()
    os.makedirs(cache, exist_ok=True)
    dest = os.path.join(cache, fname)

    if os.path.isfile(dest):
        print(f"already cached: {dest}")
    elif args.from_file:
        shutil.copyfile(args.from_file, dest)
        print(f"installed {args.from_file} -> {dest}")
    else:
        print(f"fetching drive id {file_id} -> {dest}")
        if not fetch(file_id, dest):
            msg = (f"plan: {args.type}({args.name or '-'}) = drive "
                   f"{file_id} -> {dest}")
            print(msg)
            sys.exit(0 if args.offline_ok else 1)

    if not args.no_verify:
        m = load_model(MODEL_TYPE_BY_KIND[args.type], dest, verbose=True)
        print(f"verified: {m.model_type} checkpoint loads "
              f"(step {m.step})")


if __name__ == "__main__":
    main()
