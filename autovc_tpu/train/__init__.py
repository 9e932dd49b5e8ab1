"""Training subsystem: datasets, schedules, jitted loops, dispatcher."""
from __future__ import annotations

from autovc_tpu.train import data, loop, schedules  # noqa: F401


def train_model(vc, model_type: str, data_path, **kwargs):
    """Dispatcher used by ``VoiceConverter.train`` (mirrors the kwarg-routing
    entry voice_converter.py:213-298, with explicit kwargs instead of
    reflection buckets).

    Extra kwargs are forwarded to the matching ``train_*`` loop; dataset
    construction kwargs: ``preprocess``, ``preprocess_args``, ``cut``,
    ``data_path_excluded``, ``one_hot``, ``use_mean_speaker_embedding``.
    """
    dataset_keys = {"preprocess", "preprocess_args", "cut",
                    "data_path_excluded", "one_hot",
                    "use_mean_speaker_embedding"}
    ds_kwargs = {k: kwargs.pop(k) for k in list(kwargs)
                 if k in dataset_keys}
    logger = vc.logger

    # per-epoch conversion examples (auto_encoder/model.py:347-357)
    source_examples = kwargs.pop("source_examples", None)
    target_examples = kwargs.pop("target_examples", None)
    on_epoch_end = None
    if source_examples and target_examples and model_type == "auto_encoder":
        def on_epoch_end(epoch, params):
            vc.AE.params = params
            vc.convert_multiple(
                source_examples, target_examples,
                save_dir=("wandb" if logger is not None
                          and logger.run is not None
                          else "training_examples"),
                audio_log_dict={"epoch": epoch})

    if model_type == "auto_encoder":
        dataset = data.AutoEncoderDataset(
            data_path, speaker_encoder=vc.SE.params,
            speaker_encoder_params=vc.SE.config,
            speakers=vc.speakers, cfg=vc.AE.config,
            verbose=vc.verbose, **ds_kwargs)
        params, ema, info = loop.train_autoencoder(
            vc.AE.params, dataset, vc.AE.config, logger=logger,
            verbose=vc.verbose, start_step=vc.AE.step,
            on_epoch_end=on_epoch_end, **kwargs)
        vc.AE.params = params
        vc.AE.step = info["step"]
        vc.AE.extras["ema_params"] = ema
        return info

    if model_type == "speaker_encoder":
        dataset = data.SpeakerEncoderDataset(
            data_path, cfg=vc.SE.config, verbose=vc.verbose, **ds_kwargs)
        params, info = loop.train_speaker_encoder(
            vc.SE.params, dataset, vc.SE.config, logger=logger,
            verbose=vc.verbose, speakers=vc.speakers,
            start_step=vc.SE.step, **kwargs)
        vc.SE.params = params
        vc.SE.step = info["step"]
        return info

    if model_type == "vocoder":
        dataset = data.VocoderDataset(
            data_path, mel_cfg=vc.AE.config.spectrogram,
            vocoder_cfg=vc.vocoder.config, verbose=vc.verbose,
            **{k: v for k, v in ds_kwargs.items()
               if k in ("preprocess", "preprocess_args",
                        "data_path_excluded")})
        params, info = loop.train_vocoder(
            vc.vocoder.params, dataset, vc.vocoder.config, logger=logger,
            verbose=vc.verbose, start_step=vc.vocoder.step, **kwargs)
        vc.vocoder.params = params
        vc.vocoder.step = info["step"]
        return info

    raise ValueError(f"'{model_type}' is not a supported model_type")
