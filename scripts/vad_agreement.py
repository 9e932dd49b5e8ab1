"""Quantify the energy-VAD vs WebRTC-VAD deviation on the bundled samples.

The framework's default VAD decision function is energy-based
(autovc_tpu/audio/tools.py:create_silence_mask, backend='energy'); the
reference uses the WebRTC GMM VAD (reference autovc/audio/tools.py:69-80,
``webrtcvad.Vad(mode=3)``), reachable here via backend='webrtc' when the
optional ``webrtcvad`` wheel is installed.

Run with webrtcvad installed to print the per-sample mask agreement table
recorded in docs/VAD_DEVIATION.md:

    pip install webrtcvad && python scripts/vad_agreement.py
"""
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from autovc_tpu.audio import io, tools  # noqa: E402

SAMPLES = os.environ.get("AUTOVC_BENCH_SAMPLES",
                         "/root/reference/data/samples")


def main():
    if not tools.webrtc_available():
        print("webrtcvad is not installed; printing energy-VAD statistics "
              "only (install webrtcvad for the agreement column).")
    rows = []
    for p in sorted(glob.glob(os.path.join(SAMPLES, "*.wav"))):
        wav, _ = io.load_wav(p, sr=16000)
        _, m_energy = tools.create_silence_mask(wav, 16000)
        silence_pct = 100.0 * (1.0 - m_energy.mean())
        if tools.webrtc_available():
            _, m_webrtc = tools.create_silence_mask(wav, 16000,
                                                    backend="webrtc")
            agree = 100.0 * (m_energy == m_webrtc).mean()
            rows.append((os.path.basename(p), len(wav) / 16000,
                         silence_pct,
                         100.0 * (1.0 - m_webrtc.mean()), agree))
        else:
            rows.append((os.path.basename(p), len(wav) / 16000,
                         silence_pct, None, None))

    hdr = (f"{'sample':<22}{'dur_s':>7}{'energy_sil%':>12}"
           f"{'webrtc_sil%':>12}{'agree%':>8}")
    print(hdr)
    print("-" * len(hdr))
    for name, dur, es, ws, ag in rows:
        ws_s = f"{ws:12.1f}" if ws is not None else f"{'n/a':>12}"
        ag_s = f"{ag:8.1f}" if ag is not None else f"{'n/a':>8}"
        print(f"{name:<22}{dur:7.1f}{es:12.1f}{ws_s}{ag_s}")


if __name__ == "__main__":
    main()
