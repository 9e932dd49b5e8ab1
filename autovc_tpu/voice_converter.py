"""VoiceConverter — the user-facing orchestrator (L5).

Re-design of ``autovc/voice_converter.py:18-498``: owns the three models
(auto-encoder, speaker encoder, vocoder), an immutable merged config, and a
metrics logger.  Public surface mirrors the reference: ``convert``,
``convert_multiple``, ``train``, ``learn_speakers``, ``setup_logging``
(wandb-compatible), ``close``.

Deliberate fixes over the reference (SURVEY.md §2a behaviour quirks):
  * the source embedding comes from the actual source utterance, not a
    hard-coded ``speakers['hilde']`` (voice_converter.py:145-147);
  * utterances are resampled to the speaker encoder's own sample rate before
    embedding (the reference embeds 22 kHz audio with 16 kHz mel params);
  * ``convert_multiple(bidirectional=True)`` recurses with the full target
    list (the reference recursed with the last loop variable,
    voice_converter.py:396).
"""
from __future__ import annotations

import os
import time
from itertools import product
from typing import Any, Dict

import numpy as np

import functools

from autovc_tpu.audio import Audio, dsp, io
from autovc_tpu.config import ConverterConfig
from autovc_tpu.models import LoadedModel, load_model, save_model
from autovc_tpu.utils import retrieve_file_paths
from autovc_tpu.utils.logging import MetricsLogger


@functools.lru_cache(maxsize=1)
def _fused_convert_jit():
    """Build (once) the single-dispatch wav -> waveform program.

    The reference chains three separately-launched models
    (autovc/voice_converter.py:88-209); the r4 path here still dispatched
    mel+AE and the vocoder as separate programs and a blocked convert paid
    ~3 tunnel round-trips for ~10 ms of device work (VERDICT r4 #4).  This
    program traces the WHOLE chain — device mel + chunk slicing, AE chunk
    forward + overlap-add merge, vocoder conditioning/sampling/crossfade —
    into ONE jitted dispatch, so a blocked conversion costs one dispatch +
    one readback: ~1 RTT + device time.  All geometry (chunk starts, fold
    target, backend) is static, resolved on host before the call.
    """
    import jax
    import jax.numpy as jnp

    from autovc_tpu.models import autoencoder as AEm
    from autovc_tpu.models import wavernn as WRm
    from autovc_tpu.ops import melspec as dev_mel

    @functools.partial(
        jax.jit,
        static_argnames=("ae_cfg", "starts", "overlap", "precision",
                         "wr_cfg", "target", "wr_overlap", "batched",
                         "mu_law", "fast_math", "unroll", "backend"))
    def run(ae_params, wr_params, wav, c_src, c_trg, key, *, ae_cfg,
            starts, overlap, precision, wr_cfg, target, wr_overlap,
            batched, mu_law, fast_math, unroll, backend):
        # int16 I/O: the wav payload crosses the (possibly tunneled) link
        # in PCM16 both ways — half the transfer bytes of f32, and the
        # audio was int16 PCM at the file boundary anyway (~3e-5
        # re-quantisation after host preprocessing)
        if wav.dtype == jnp.int16:
            wav = wav.astype(jnp.float32) / 32767.0
        mel_cfg = ae_cfg.spectrogram
        chunks = dev_mel._slice_mel(wav, mel_cfg, starts,
                                    mel_cfg.partial_utterance_n_frames)
        post = AEm.batch_forward(ae_params, chunks, c_src, c_trg, ae_cfg,
                                 overlap, precision)
        out = WRm._generate_program(wr_params, post[None], key, wr_cfg,
                                    target, wr_overlap, batched, mu_law,
                                    fast_math, unroll, backend, False)
        return jnp.clip(jnp.round(out * 32767.0), -32767,
                        32767).astype(jnp.int16)

    return run


class VoiceConverter:
    def __init__(self,
                 auto_encoder: str | None = None,
                 speaker_encoder: str | None = None,
                 vocoder: str | None = None,
                 config: ConverterConfig | None = None,
                 auto_encoder_params: Dict[str, Any] | None = None,
                 speaker_encoder_params: Dict[str, Any] | None = None,
                 vocoder_params: Dict[str, Any] | None = None,
                 wandb_params: Dict[str, Any] | None = None,
                 verbose: bool = True,
                 ae_precision: str | None = None,
                 vocoder_backend: str | None = None):
        """Build a converter from checkpoint names/paths + config overrides.

        Unlike the reference (which mutates module-level dicts in place,
        voice_converter.py:67-70), overrides merge into an immutable config.

        ``ae_precision`` selects the auto-encoder inference compute policy:
        'auto' (bf16 on TPU — the MXU-native multiply, ~4x faster, mel MSE
        ~1e-6 vs f32, equivalence-gated in bench.py — f32 elsewhere),
        'bf16', or 'f32' (Precision.HIGHEST, exact reference parity).
        ``vocoder_backend``: 'auto' (Pallas sampling kernel on TPU, XLA
        scan elsewhere), 'xla', or 'pallas'.  Defaults come from
        ``AUTOVC_AE_PRECISION`` / ``AUTOVC_VOCODER_BACKEND`` env vars,
        falling back to 'auto'.
        """
        cfg = config or ConverterConfig()
        if auto_encoder_params:
            cfg = cfg.with_overrides(auto_encoder=auto_encoder_params)
        if speaker_encoder_params:
            cfg = cfg.with_overrides(speaker_encoder=speaker_encoder_params)
        if vocoder_params:
            cfg = cfg.with_overrides(vocoder=vocoder_params)
        if wandb_params:
            cfg = cfg.with_overrides(wandb=wandb_params)
        self.config = cfg
        self.verbose = verbose
        self.logger: MetricsLogger | None = None
        self.ae_precision = (
            ae_precision
            or os.environ.get("AUTOVC_AE_PRECISION", "auto"))
        self.vocoder_backend = (
            vocoder_backend
            or os.environ.get("AUTOVC_VOCODER_BACKEND", "auto"))

        self.AE = load_model("auto_encoder", auto_encoder,
                             cfg.auto_encoder.model_dir, cfg.auto_encoder,
                             verbose=verbose)
        self.SE = load_model("speaker_encoder", speaker_encoder,
                             cfg.speaker_encoder.model_dir,
                             cfg.speaker_encoder, verbose=verbose)
        self.vocoder = load_model("vocoder", vocoder, cfg.vocoder.model_dir,
                                  cfg.vocoder, verbose=verbose)

    # ------------------------------------------------------------------
    # Embedding helpers
    # ------------------------------------------------------------------

    @property
    def speakers(self) -> Dict[str, np.ndarray]:
        """Mean-speaker embedding registry (rides in the SE checkpoint)."""
        return self.SE.speakers

    def _embed(self, audio: Audio) -> np.ndarray:
        """d-vector of an utterance, at the SE's native sample rate.

        Routed through ``embed_utterances`` as a batch of one, so the same
        speaker embeds IDENTICALLY through convert and convert_batch by
        construction — on every backend (the r5 device-mel embed path
        included)."""
        from autovc_tpu.models import speaker_encoder as SEm
        wav = audio.wav
        if audio.sr != self.SE.config.spectrogram.sr:
            wav = io.resample(wav, audio.sr, self.SE.config.spectrogram.sr)
        return SEm.embed_utterances(self.SE.params, [wav],
                                    self.SE.config)[0]

    def _embed_many(self, audios):
        """d-vectors for several utterances in ONE device dispatch
        (speaker_encoder.embed_utterances) — the batch-serving path.
        On the device path the result stays a DEVICE array (block=False)
        so the SE -> AE dispatch chain never syncs the host."""
        from autovc_tpu.models import speaker_encoder as SEm
        se_sr = self.SE.config.spectrogram.sr
        wavs = [a.wav if a.sr == se_sr else io.resample(a.wav, a.sr, se_sr)
                for a in audios]
        return SEm.embed_utterances(self.SE.params, wavs, self.SE.config,
                                    block=False)

    def _ae_params(self, use_ema: bool):
        """Auto-encoder params, optionally the EMA-smoothed copy saved by
        training (rides in the checkpoint as ``ema_params``)."""
        if not use_ema:
            return self.AE.params
        ema = self.AE.extras.get("ema_params")
        if ema is None:
            raise ValueError(
                "use_ema=True but the auto-encoder checkpoint carries no "
                "'ema_params' (train first, or load a checkpoint saved by "
                "this framework's training loop)")
        return ema

    def _fused_convert(self, wav, c_source, c_target, ae_cfg, overlap,
                       seed, ae_params) -> np.ndarray:
        """Resolve the static geometry on host, then run the whole device
        chain as ONE dispatched program (:func:`_fused_convert_jit`):
        upload, one execute, one readback."""
        import jax

        from autovc_tpu.models import wavernn as WRm

        mel_cfg = ae_cfg.spectrogram
        wav_slices, mel_slices = dsp.compute_partial_slices(
            len(wav), mel_cfg.sr,
            partial_utterance_n_frames=mel_cfg.partial_utterance_n_frames,
            overlap=overlap, mel_window_step=mel_cfg.mel_window_step)
        wav_p = dsp.pad_for_slices(np.asarray(wav), wav_slices)
        starts = tuple(int(s.start) for s in mel_slices)
        N = mel_cfg.partial_utterance_n_frames
        total_frames = N + (len(starts) - 1) * int(N * (1 - overlap))
        wr_cfg = self.vocoder.config
        g = wr_cfg.generate
        t_total = (total_frames - 1) * wr_cfg.hop_length
        target = (WRm.auto_fold_target(t_total, g.overlap, wr_cfg)
                  if g.auto_target else g.target)
        backend = WRm.resolve_backend(self.vocoder_backend, wr_cfg, target,
                                      g.overlap, g.batched, False,
                                      total_frames, True)
        mu_law = g.mu_law and wr_cfg.mode == "RAW"
        wav_i16 = np.clip(np.round(np.asarray(wav_p, np.float64) * 32767.0),
                          -32767, 32767).astype(np.int16)
        out = _fused_convert_jit()(
            ae_params, self.vocoder.params, wav_i16,
            np.asarray(c_source, np.float32),
            np.asarray(c_target, np.float32), jax.random.PRNGKey(seed),
            ae_cfg=ae_cfg, starts=starts, overlap=overlap,
            precision=self.ae_precision, wr_cfg=wr_cfg, target=target,
            wr_overlap=g.overlap, batched=g.batched, mu_law=mu_law,
            fast_math=True, unroll=4, backend=backend)
        return np.asarray(out).astype(np.float32) / 32767.0

    def _speaker_embedding(self, target, preprocess, preprocess_args,
                           sr) -> np.ndarray:
        """Registry lookup by name, else embed the utterance file."""
        if isinstance(target, str) and target in self.speakers:
            return np.asarray(self.speakers[target])
        audio = Audio(target, sr) if isinstance(target, str) else target
        audio.preprocess(*preprocess, **preprocess_args)
        return self._embed(audio)

    # ------------------------------------------------------------------
    # Conversion
    # ------------------------------------------------------------------

    def convert(self, source, target, sr: int | None = None,
                save_name=None, save_dir=None,
                preprocess=None, preprocess_args=None,
                outprocess=None, outprocess_args=None,
                cut: bool = True, overlap: float = 0.5,
                audio_log_dict: Dict[str, Any] | None = None,
                seed: int = 0, use_ema: bool = False,
                pad_to_seconds: float | None = None,
                partial_frames: int | None = None,
                parallel: str | None = None, mesh=None,
                fuse_dispatch: bool | None = None):
        """Convert the content of ``source`` into the voice of ``target``.

        Mirrors voice_converter.py:88-211.  ``target`` may be a wav path or a
        learned mean-speaker name.  ``save_name=False`` skips saving;
        ``save_dir='wandb'`` logs the audio to the active run.
        ``use_ema=True`` runs the auto-encoder with its EMA-smoothed
        parameters (the reference keeps an EMA copy it never uses,
        auto_encoder/model.py:321,379-392).

        ``pad_to_seconds=s`` zero-pads the (preprocessed) input up to a
        multiple of ``s`` seconds and trims the converted audio back to the
        true duration: every program in the pipeline then compiles for at
        most duration/s distinct shapes, so arbitrary-length inputs reuse
        the persistent compilation cache (see scripts/prewarm_cache.py).

        ``partial_frames`` overrides the mel chunk length (default: the
        reference's 400 frames, hparams.py:15).  Single-stream latency is
        floored by sequential-steps x per-step weight streaming, so
        shorter chunks cut latency nearly linearly (128 frames ~ 3x lower
        AE latency at 1-8 MXU rows) at the cost of more overlap-add seams
        and less recurrent context per chunk — a serving-latency knob, not
        a quality default.

        ``parallel`` selects a multi-device auto-encoder strategy over
        ``mesh`` (default: a 1-D 'data' mesh over all devices):
          * ``"chunks"`` — the overlapped chunk axis is the DP axis
            (sequence parallelism with the reference's chunk semantics,
            spectrogram.py:248-311); requires ``cut=True``.
          * ``"ring"`` — EXACT sequence parallelism: the unchunked mel's
            time axis is sharded and every recurrence runs as a ppermute
            ring wavefront (parallel/ring.py); the mel frame count is
            trimmed to a mesh-size multiple.

        ``fuse_dispatch`` dispatches the whole device chain (mel + AE +
        vocoder) as ONE jitted program synced once, cutting a blocked
        conversion from ~3 host<->device round-trips to ~1 (VERDICT r4
        #4).  Default (None) fuses on TPU for the standard
        ``cut=True``/single-device path; pass False to force the staged
        dispatch (e.g. to reuse stage-level compile caches).
        Returns the converted :class:`Audio`.
        """
        import jax

        from autovc_tpu.models import autoencoder as AEm
        from autovc_tpu.models import wavernn as WRm

        cc = self.config.convert
        sr = sr or cc.sr
        preprocess = cc.preprocess if preprocess is None else preprocess
        preprocess_args = dict(cc.preprocess_args if preprocess_args is None
                               else preprocess_args)
        outprocess = cc.outprocess if outprocess is None else outprocess
        outprocess_args = dict(cc.outprocess_args if outprocess_args is None
                               else outprocess_args)

        if self.verbose:
            print(f"Converting '{source}' -> '{target}'...")
        t0 = time.time()

        audio_src = Audio(source, sr) if isinstance(source, str) else source
        audio_src.preprocess(*preprocess, **preprocess_args)
        true_samples = len(audio_src.wav)
        if pad_to_seconds:
            bucket = int(round(pad_to_seconds * audio_src.sr))
            pad = (-len(audio_src.wav)) % bucket
            if pad:
                audio_src.wav = np.pad(audio_src.wav, (0, pad))

        c_source = self._embed(audio_src)[None]
        c_target = self._speaker_embedding(target, preprocess,
                                           preprocess_args, sr)[None]

        ae_cfg = self.AE.config
        if partial_frames is not None:
            if partial_frames < ae_cfg.freq:
                raise ValueError(
                    f"partial_frames must be >= the encoder's downsampling "
                    f"freq ({ae_cfg.freq}): shorter chunks produce no "
                    f"forward content codes")
            ae_cfg = ae_cfg.with_overrides(
                spectrogram={"partial_utterance_n_frames": partial_frames})
        mel_cfg = ae_cfg.spectrogram
        ae_params = self._ae_params(use_ema)
        # The mel front-end, chunk slicing, AE and vocoder all run on
        # device; the raw wav is the only upload and the finished waveform
        # the only download.
        if parallel not in (None, "chunks", "ring"):
            raise ValueError(f"parallel must be None, 'chunks' or 'ring', "
                             f"got {parallel!r}")
        if parallel == "chunks" and not cut:
            raise ValueError("parallel='chunks' shards the chunk axis; it "
                             "requires cut=True")
        if fuse_dispatch is None:
            # fuse where dispatch round-trips dominate (TPU, esp. tunneled)
            fuse_dispatch = (cut and parallel is None
                             and jax.default_backend() == "tpu")
        if parallel == "ring" and pad_to_seconds:
            raise ValueError("pad_to_seconds trims by chunk geometry and "
                             "does not compose with parallel='ring'")
        if parallel == "ring":
            import jax.numpy as jnp

            from autovc_tpu.parallel import ring as pring
            from autovc_tpu.parallel import sharding as shd
            mesh = mesh or shd.make_mesh()
            n = int(mesh.shape["data"])
            mel = dsp.mel_spec_auto_encoder(audio_src.wav, mel_cfg)
            Tn = (mel.shape[-1] // n) * n
            if Tn == 0:
                raise ValueError(f"input too short for ring SP over {n} "
                                 f"devices ({mel.shape[-1]} mel frames)")
            post_mel = pring.ring_autovc_infer(
                ae_params, jnp.asarray(mel[None, :, :Tn], jnp.float32),
                jnp.asarray(c_source), jnp.asarray(c_target), ae_cfg,
                mesh, "data", self.ae_precision)[0]
        elif cut and fuse_dispatch and parallel is None:
            # single-dispatch path: mel + AE + vocoder as ONE program,
            # synced once at the final readback (VERDICT r4 #4)
            post_mel = None
            waveform = self._fused_convert(
                audio_src.wav, c_source, c_target, ae_cfg, overlap,
                seed, ae_params)
        elif cut:
            from autovc_tpu.ops import melspec as dev_mel
            chunks, _ = dev_mel.mel_spec_auto_encoder_sliced(
                audio_src.wav, mel_cfg, overlap=overlap)
            if parallel == "chunks":
                import jax.numpy as jnp

                from autovc_tpu.parallel import sharding as shd
                from autovc_tpu.parallel import steps as psteps
                mesh = mesh or shd.make_mesh()
                n = int(mesh.shape["data"])
                M = int(chunks.shape[0])
                pad = (-M) % n
                if pad:
                    chunks = jnp.pad(chunks, ((0, pad), (0, 0), (0, 0)))
                chunks = psteps.shard_batch(chunks, mesh)
                post_mel = psteps.chunk_sharded_convert(
                    ae_params, chunks, jnp.asarray(c_source),
                    jnp.asarray(c_target), jnp.int32(M), ae_cfg, overlap,
                    precision=self.ae_precision)
                # padded-timeline output; keep the true-utterance frames
                N = chunks.shape[-1]
                post_mel = post_mel[:, :N + (M - 1) * int(N * (1 - overlap))]
            else:
                post_mel = AEm.batch_forward_jit(
                    ae_params, chunks, c_source, c_target, ae_cfg, overlap,
                    self.ae_precision)
        else:
            mel = dsp.mel_spec_auto_encoder(audio_src.wav, mel_cfg)
            post_mel = AEm.infer(ae_params, mel[None],
                                 c_source, c_target, ae_cfg,
                                 precision=self.ae_precision)[0]

        if post_mel is not None:
            waveform = WRm.generate(self.vocoder.params, post_mel[None],
                                    self.vocoder.config,
                                    key=jax.random.PRNGKey(seed),
                                    backend=self.vocoder_backend)
        if pad_to_seconds:
            # trim the bucket padding: keep exactly the span the unpadded
            # slice set would have produced
            _, true_slices = dsp.compute_partial_slices(
                true_samples, mel_cfg.sr,
                partial_utterance_n_frames=mel_cfg.partial_utterance_n_frames,
                overlap=overlap, mel_window_step=mel_cfg.mel_window_step)
            waveform = waveform[: (true_slices[-1].stop - 1)
                                * mel_cfg.hop_length]

        audio_out = Audio(waveform, sr=sr, sr_org=mel_cfg.sr)
        audio_out.preprocess(*outprocess, **outprocess_args)
        if self.verbose:
            dur = len(audio_out.wav) / audio_out.sr
            dt = time.time() - t0
            print(f"  {dur:.2f}s audio in {dt:.2f}s "
                  f"({dur / dt:.2f}x realtime)")

        if save_name is False:
            return audio_out

        if save_name is None:
            src_name = (os.path.splitext(os.path.basename(source))[0]
                        if isinstance(source, str) else "source")
            trg_name = (os.path.splitext(os.path.basename(str(target)))[0])
            save_name = f"{src_name}_to_{trg_name}.wav"

        if save_dir == "wandb":
            assert self.logger is not None, \
                "setup_logging() must run before save_dir='wandb'"
            self.logger.log_audio(save_name.replace(".wav", ""),
                                  audio_out.wav, audio_out.sr,
                                  caption=save_name)
            if audio_log_dict:
                self.logger.log(audio_log_dict)
        else:
            if save_dir is not None:
                save_dir = (save_dir if save_dir.startswith("results")
                            else os.path.join("results", save_dir))
            else:
                save_dir = "results"
            os.makedirs(save_dir, exist_ok=True)
            out_path = os.path.join(save_dir, save_name)
            audio_out.save(out_path)
            if self.verbose:
                print(f"  saved '{out_path}'")
        return audio_out

    def convert_batch(self, sources, target, sr: int | None = None,
                      preprocess=None, preprocess_args=None,
                      outprocess=None, outprocess_args=None,
                      overlap: float = 0.5, seed: int = 0,
                      save_dir=None, use_ema: bool = False,
                      parallel: str | None = None, devices=None):
        """Batch-serving conversion: many sources -> one target voice in one
        device pass per stage.

        All utterances' mel chunks run through the auto-encoder as one batch
        and all their vocoder folds join one sampling loop
        (:func:`wavernn.generate_many`), filling the MXU far better than
        per-utterance calls.  Returns a list of converted :class:`Audio`.

        ``parallel="pipeline"`` runs the AE and vocoder as device-pinned
        pipeline stages over disjoint device groups
        (:func:`autovc_tpu.parallel.pipeline.conversion_pipeline`):
        utterance j's vocoding overlaps utterance j+1's AE conversion;
        ``devices`` (default: all) is split contiguously between the stages.
        Requires >= 2 devices.
        """
        import jax

        from autovc_tpu.models import autoencoder as AEm
        from autovc_tpu.models import wavernn as WRm

        cc = self.config.convert
        sr = sr or cc.sr
        preprocess = cc.preprocess if preprocess is None else preprocess
        preprocess_args = dict(cc.preprocess_args if preprocess_args is None
                               else preprocess_args)
        outprocess = cc.outprocess if outprocess is None else outprocess
        outprocess_args = dict(cc.outprocess_args if outprocess_args is None
                               else outprocess_args)

        sources = retrieve_file_paths(sources)
        c_target = self._speaker_embedding(target, preprocess,
                                           preprocess_args, sr)[None]

        ae_cfg = self.AE.config
        # Stage 1: preprocessing + embedding on host, mel + slicing on
        # device (only the raw wavs cross the host boundary).
        from concurrent.futures import ThreadPoolExecutor

        from autovc_tpu.ops import melspec as dev_mel

        def _load(src):
            audio = Audio(src, sr)
            audio.preprocess(*preprocess, **preprocess_args)
            return audio

        # host preprocessing is per-utterance independent numpy (load,
        # resample, VAD/normalize) — thread it; device dispatch stays on
        # this thread
        with ThreadPoolExecutor(max_workers=min(8, len(sources) or 1)) as ex:
            audios = list(ex.map(_load, sources))
        all_chunks = [dev_mel.mel_spec_auto_encoder_sliced(
            a.wav, ae_cfg.spectrogram, overlap=overlap, pcm16=True)[0]
            for a in audios]
        c_orgs = self._embed_many(audios)

        ae_params = self._ae_params(use_ema)
        if parallel == "pipeline":
            # Stage-parallel serving: AE on one device group, vocoder on
            # the other; utterance j's vocoding overlaps utterance j+1's
            # conversion (parallel/pipeline.py).  The vocoder stage runs
            # the same fused program (Pallas kernel + on-device finish) as
            # the slab path, so the outputs are finished waveforms.
            from autovc_tpu.parallel import pipeline as ppipe
            pipe = ppipe.conversion_pipeline(
                ae_params, self.vocoder.params, ae_cfg, self.vocoder.config,
                devices=devices, overlap=overlap,
                ae_precision=self.ae_precision,
                backend=self.vocoder_backend)
            items = [(chunks, c_org[None], c_target,
                      jax.random.PRNGKey(seed + i))
                     for i, (chunks, c_org)
                     in enumerate(zip(all_chunks, c_orgs))]
            wavs = [w.astype(np.float32) for w in pipe.run(items)]
        elif parallel is not None:
            raise ValueError(f"parallel must be None or 'pipeline', "
                             f"got {parallel!r}")
        else:
            # Shape-stable serving: every utterance's chunks run through
            # fixed-row slab programs (one compile for ANY workload) and
            # merge into one packed mel timeline on device; per-utterance
            # views feed the joint vocoder pass — nothing but the finished
            # waveforms crosses the host boundary.
            packed, starts, lengths = AEm.batch_forward_packed(
                ae_params, all_chunks, c_orgs, c_target, ae_cfg, overlap,
                self.ae_precision)
            post_mels = [packed[:, s:s + L] for s, L in zip(starts, lengths)]

            wavs = WRm.generate_many(self.vocoder.params, post_mels,
                                     self.vocoder.config,
                                     key=jax.random.PRNGKey(seed),
                                     backend=self.vocoder_backend)
        def _finish_out(src_wav):
            src, wav = src_wav
            audio_out = Audio(wav, sr=sr, sr_org=ae_cfg.spectrogram.sr)
            audio_out.preprocess(*outprocess, **outprocess_args)
            if save_dir is not None:
                os.makedirs(save_dir, exist_ok=True)
                name = os.path.splitext(os.path.basename(src))[0]
                trg = os.path.splitext(os.path.basename(str(target)))[0]
                audio_out.save(os.path.join(save_dir,
                                            f"{name}_to_{trg}.wav"))
            return audio_out

        with ThreadPoolExecutor(max_workers=min(8, len(sources) or 1)) as ex:
            return list(ex.map(_finish_out, zip(sources, wavs)))

    def convert_multiple(self, sources, targets,
                         match_method: str = "all_combinations",
                         bidirectional: bool = False, **convert_params):
        """Batch conversion (voice_converter.py:346-398): 'all_combinations'
        crosses every source with every target; 'align' zips them."""
        sources = retrieve_file_paths(sources)
        target_args = [targets] if isinstance(targets, str) else list(targets)
        resolved = []
        for t in target_args:
            if t in self.speakers:
                assert not bidirectional, \
                    "bidirectional conversion cannot source from a mean " \
                    "speaker embedding"
                resolved.append(t)
            else:
                resolved.extend(retrieve_file_paths(t))

        if match_method == "align":
            assert len(sources) == len(resolved)
            matches = list(zip(sources, resolved))
        elif match_method == "all_combinations":
            matches = list(product(sources, resolved))
        else:
            raise ValueError(f"unknown match_method {match_method!r}")

        audio_objects = [self.convert(s, t, **convert_params)
                         for s, t in matches]
        if bidirectional:
            audio_objects.extend(self.convert_multiple(
                resolved, sources, match_method, **convert_params))
        return audio_objects

    # ------------------------------------------------------------------
    # Training / speaker registry
    # ------------------------------------------------------------------

    def learn_speakers(self, mean_speaker_path,
                       mean_speaker_path_excluded=()):
        """Learn mean speaker embeddings (voice_converter.py:400-414).

        ``mean_speaker_path``: dict name -> path, or list of 'name=path'
        strings.
        """
        from autovc_tpu.models import speaker_encoder as SEm
        if not isinstance(mean_speaker_path, dict):
            try:
                mean_speaker_path = {
                    k.strip(): v.strip()
                    for k, v in (arg.split("=") for arg in mean_speaker_path)}
            except Exception as e:
                raise ValueError(
                    "mean_speaker_path must be a dict or list of 'name=path' "
                    "strings") from e
        for speaker, path in mean_speaker_path.items():
            files = retrieve_file_paths(path,
                                        list(mean_speaker_path_excluded))
            if self.verbose:
                print(f"Learning mean embedding for '{speaker}' "
                      f"({len(files)} files)...")
            self.speakers[speaker] = SEm.learn_speaker(
                self.SE.params, files, self.SE.config)
        return self.speakers

    def train(self, data_path, model_type: str = "auto_encoder", **kwargs):
        """Train one of the models (voice_converter.py:213-298).  Delegates
        to :mod:`autovc_tpu.train`."""
        from autovc_tpu import train as train_mod
        if model_type not in ("auto_encoder", "speaker_encoder", "vocoder"):
            raise ValueError(f"'{model_type}' is not a supported model_type")
        self.setup_logging()
        return train_mod.train_model(self, model_type, data_path, **kwargs)

    # ------------------------------------------------------------------
    # Logging / persistence
    # ------------------------------------------------------------------

    def setup_logging(self, **params) -> MetricsLogger:
        if self.logger is None:
            self.logger = MetricsLogger(
                self.config.wandb,
                run_config={"config": "autovc_tpu"}, **params)
        return self.logger

    # reference name (voice_converter.py:418) kept as an alias
    setup_wandb = setup_logging

    def save(self, model_type: str, model_name: str, save_dir=None) -> str:
        model: LoadedModel = {"auto_encoder": self.AE,
                              "speaker_encoder": self.SE,
                              "vocoder": self.vocoder}[model_type]
        path = save_model(model, model_name, save_dir)
        if self.logger is not None:
            self.logger.log_artifact(path, model_name, model_type)
        return path

    def close(self):
        if self.logger is not None:
            self.logger.finish()
            self.logger = None
