"""CLI entry: ``python -m autovc_tpu -mode {train,convert} ...``

Mirrors ``autovc/__main__.py:8-37``: phase-1 init args build the
VoiceConverter, phase-2 mode args drive train or convert; a
``-mean_speaker_path`` pre-step learns mean speakers first
(__main__.py:22-23).
"""
from __future__ import annotations

import sys

from autovc_tpu.cli import parse_mode_args, parse_vc_args


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    vc_args, rest = parse_vc_args(argv)
    mode_args = parse_mode_args(vc_args.mode, rest)

    from autovc_tpu.voice_converter import VoiceConverter
    vc = VoiceConverter(
        auto_encoder=vc_args.auto_encoder,
        speaker_encoder=vc_args.speaker_encoder,
        vocoder=vc_args.vocoder,
        auto_encoder_params=vc_args.auto_encoder_params,
        speaker_encoder_params=vc_args.speaker_encoder_params,
        vocoder_params=vc_args.vocoder_params,
        wandb_params=vc_args.wandb_params,
        verbose=not vc_args.quiet)

    if mode_args.mean_speaker_path:
        vc.learn_speakers(mode_args.mean_speaker_path)

    if vc_args.mode == "convert":
        # Fail fast on unsupported -convert_params keys: convert() has an
        # explicit signature (the reference's **kwargs silently swallowed
        # typos), so a bad key should die at the CLI, not mid-batch.
        import inspect
        allowed = set(inspect.signature(
            VoiceConverter.convert).parameters) - {"self", "source",
                                                   "target"}
        bad = sorted(set(mode_args.convert_params) - allowed)
        if bad:
            raise SystemExit(
                f"unsupported -convert_params key(s) {bad}; "
                f"convert() accepts: {sorted(allowed)}")
        vc.convert_multiple(
            sources=mode_args.sources,
            targets=(mode_args.targets[0] if len(mode_args.targets) == 1
                     else mode_args.targets),
            match_method=mode_args.match_method,
            bidirectional=mode_args.bidirectional,
            save_dir=mode_args.save_dir,
            save_name=mode_args.save_name,
            **({"sr": mode_args.sr} if mode_args.sr else {}),
            **mode_args.convert_params)
    else:
        kwargs = dict(mode_args.train_params)
        for k in ("n_epochs", "batch_size", "model_name", "save_dir"):
            v = getattr(mode_args, k)
            if v is not None:
                kwargs[k] = v
        data_path = mode_args.data_path
        if mode_args.model_type == "speaker_encoder":
            # speaker-encoder data is 'name=path' pairs -> dict
            data_path = {k.strip(): v.strip() for k, v in
                         (a.split("=") for a in data_path)}
        elif len(data_path) == 1:
            data_path = data_path[0]
        vc.train(data_path=data_path, model_type=mode_args.model_type,
                 **kwargs)
    vc.close()


if __name__ == "__main__":
    main()
