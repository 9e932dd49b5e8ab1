"""CLI parsing + end-to-end CLI invocation tests."""
import sys

import numpy as np
import pytest

from autovc_tpu.cli import parse_mode_args, parse_vc_args


def test_two_phase_parse():
    argv = ["-mode", "convert", "-auto_encoder", "x.ckpt",
            "-sources", "a.wav", "-targets", "b.wav"]
    vc_args, rest = parse_vc_args(argv)
    assert vc_args.mode == "convert"
    assert vc_args.auto_encoder == "x.ckpt"
    mode_args = parse_mode_args("convert", rest)
    assert mode_args.sources == ["a.wav"]
    assert mode_args.targets == ["b.wav"]


def test_parse_kwargs_literal_eval():
    argv = ["-mode", "train",
            "-auto_encoder_params", "dim_neck=16", "model_dir=models/x"]
    vc_args, _ = parse_vc_args(argv)
    assert vc_args.auto_encoder_params == {"dim_neck": 16,
                                           "model_dir": "models/x"}


def test_string_to_none():
    args = parse_mode_args("convert", ["-sources", "a", "-targets", "b",
                                       "-save_dir", "None"])
    assert args.save_dir is None


def test_train_args():
    args = parse_mode_args("train", ["-data_path", "d1", "d2",
                                     "-model_type", "speaker_encoder",
                                     "-n_epochs", "3"])
    assert args.data_path == ["d1", "d2"]
    assert args.n_epochs == 3


def test_cli_convert_end_to_end(tmp_path):
    """Full CLI run with tiny models on a short clip."""
    from autovc_tpu.__main__ import main
    from autovc_tpu.audio import io
    wav, sr = io.load_wav("/root/reference/data/samples/hilde_1.wav",
                          sr=22050)
    src = str(tmp_path / "src.wav")
    io.save_wav(src, wav[: int(0.5 * sr)], sr)

    main(["-mode", "convert", "-quiet",
          "-auto_encoder_params",
          "spectrogram={'partial_utterance_n_frames': 64}",
          "-vocoder_params", "rnn_dims=32", "fc_dims=32", "compute_dims=16",
          "res_out_dims=16", "res_blocks=2",
          "generate={'target': 1100, 'overlap': 275}",
          "-sources", src, "-targets", src,
          "-save_dir", str(tmp_path), "-save_name", "out.wav"])
    out, out_sr = io.load_wav(str(tmp_path / "out.wav"))
    assert out_sr == 22050
    assert np.isfinite(out).all()
    assert len(out) > 0.3 * sr


def test_cli_rejects_bad_mode():
    with pytest.raises(SystemExit):
        parse_vc_args(["-mode", "bogus"])


def test_cli_rejects_unknown_convert_params():
    """Unsupported -convert_params keys die at dispatch time with a clear
    message, before any model work (convert() has an explicit signature —
    the reference's **kwargs silently swallowed typos)."""
    from autovc_tpu.__main__ import main
    with pytest.raises(SystemExit, match="mel_kwargsss"):
        main(["-mode", "convert", "-quiet",
              "-sources", "a.wav", "-targets", "b.wav",
              "-convert_params", "mel_kwargsss=1"])
