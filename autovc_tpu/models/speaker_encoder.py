"""GE2E speaker encoder: d-vector embedder + GE2E softmax loss.

Functional JAX re-design of ``autovc/speaker_encoder/model.py:21-463``:
3-layer LSTM(40 -> 256) -> Linear(256 -> 256) -> ReLU -> L2-normalise, taking
the final hidden state of the last layer (model.py:70-90).  The GE2E
similarity matrix / loss follows section 2.1 of the GE2E paper
(model.py:192-264) in fully vectorised form.

Fixes over the reference (SURVEY.md §2a quirks):
  * ``similarity_weight``/``similarity_bias`` are real parameters in the
    pytree (the reference creates detached copies inside ``learn``,
    model.py:339-340, and its ``_similarity_matrix`` crashes on a stale
    ``self.params.device``, model.py:217).
  * ``embed_utterance`` embeds the actual utterance — used by the converter
    instead of the reference's hard-coded 'hilde' lookup
    (voice_converter.py:145-147).
"""
from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from autovc_tpu.audio import dsp
from autovc_tpu.config import SpeakerEncoderConfig
from autovc_tpu.ops import conv as C
from autovc_tpu.ops import rnn as R

Params = Dict[str, Any]


def init(key, cfg: SpeakerEncoderConfig = SpeakerEncoderConfig()) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "lstm": R.init_lstm_stack(k1, cfg.input_size, cfg.hidden_size,
                                  cfg.num_layers),
        "linear": C.init_linear(k2, cfg.hidden_size, cfg.embedding_size),
        # GE2E affine scaling, fixed initial values w=10, b=-5
        # (speaker_encoder/model.py:339-340).
        "similarity_weight": jnp.asarray(10.0, jnp.float32),
        "similarity_bias": jnp.asarray(-5.0, jnp.float32),
    }


def forward(params: Params, utterances: jnp.ndarray) -> jnp.ndarray:
    """(B, n_frames, n_mels) -> L2-normalised embeddings (B, emb).

    The 3-layer recurrence runs as ONE pipelined scan (T+2 sequential
    rounds instead of 3T; the 3x256 stack's fused weight block is ~5 MB,
    comfortably VMEM-resident — ops/rnn.py:lstm_stack_skewed)."""
    _, (h, _), _ = R.lstm_stack_skewed(params["lstm"], utterances)
    raw = jax.nn.relu(C.linear(params["linear"], h))
    return raw / jnp.linalg.norm(raw, axis=-1, keepdims=True)


forward_jit = jax.jit(forward)


def embed_utterance(params: Params, wav: np.ndarray,
                    cfg: SpeakerEncoderConfig = SpeakerEncoderConfig(),
                    using_partials: bool = True,
                    return_partials: bool = False,
                    use_native: bool = False, **slice_kwargs):
    """Embedding of one utterance (model.py:136-190): slice into partials,
    embed the batch, average, L2-normalise.

    ``use_native`` routes the mel through the threaded C++ core (numpy
    fallback when absent); VoiceConverter passes True on BOTH its single
    and batch paths so the same speaker embeds identically either way,
    while the torch-parity tests keep the numpy reference default."""
    if not using_partials:
        frames = dsp.mel_spec_speaker_encoder(wav, cfg.spectrogram)
        embed = np.asarray(forward_jit(params, frames[None]))[0]
        return (embed, None, None) if return_partials else embed

    frames_batch, wave_slices, _ = dsp.mel_spec_speaker_encoder_sliced(
        wav, cfg.spectrogram, use_native=use_native, **slice_kwargs)
    partial_embeds = np.asarray(forward_jit(params, frames_batch))
    raw = partial_embeds.mean(axis=0)
    embed = raw / np.linalg.norm(raw, 2)
    if return_partials:
        return embed, partial_embeds, wave_slices
    return embed


@functools.partial(jax.jit, static_argnames=("cfg", "p_max"))
def _device_partial_rows(wav: jnp.ndarray, starts: jnp.ndarray, cfg,
                         p_max: int) -> jnp.ndarray:
    """Device-side partial-window extraction: power mel of a (bucketed)
    wav, then a window gather at the utterance's true mel-slice starts.
    ``p_max`` is the partial count of a FULL bucket, so one program serves
    every utterance in that bucket; padding rows (start 0) are dropped by
    the caller."""
    from autovc_tpu.ops import melspec as dev_mel
    mel = dev_mel.mel_spec_speaker_encoder(wav, cfg)   # (F, n_mels)
    n = cfg.partial_utterance_n_frames
    idx = starts[:, None] + jnp.arange(n)[None, :]     # (p_max, n)
    return mel[idx]                                    # (p_max, n, mels)


@functools.lru_cache(maxsize=64)
def _bucket_partials(n_samples: int, sr: int, n_frames: int,
                     mel_window_step: float) -> int:
    """Partial count of a full bucket-length wav (static per bucket)."""
    _, mel_slices = dsp.compute_partial_slices(
        n_samples, sr, partial_utterance_n_frames=n_frames,
        mel_window_step=mel_window_step)
    return len(mel_slices)


@functools.partial(jax.jit, static_argnames=("counts",))
def _segment_embeds(emb: jnp.ndarray, counts: tuple) -> jnp.ndarray:
    """Per-utterance mean + L2-normalise of stacked partial embeddings,
    on device (so a non-blocking embed chain never syncs the host)."""
    outs, r = [], 0
    for n in counts:
        raw = jnp.mean(emb[r:r + n], axis=0)
        r += n
        outs.append(raw / jnp.linalg.norm(raw))
    return jnp.stack(outs)


def embed_utterances(params: Params, wavs,
                     cfg: SpeakerEncoderConfig = SpeakerEncoderConfig(),
                     device: bool | None = None, block: bool = True,
                     **slice_kwargs):
    """d-vectors for SEVERAL utterances in ONE forward dispatch (the
    serving path).  Returns a list of (emb,) arrays in input order.

    ``device`` (None = auto: True on TPU): compute the power mels ON
    DEVICE — each utterance's wav is padded to a 1 s bucket (bounded
    compile variants) and its partial windows are gathered on device, so
    the host does no FFT work at all (the host-mel loop was ~0.4 s of a
    1.27 s blocked serve batch on a 2-core host, r5 attribution).  With
    ``device=False`` the mels run through the threaded C++ host core —
    numerics parity-tested against the device mel at rtol 2e-3
    (tests/test_dsp.py's dev-vs-host gates); either path is identical to
    per-utterance embedding with the same backend.

    ``block=False`` (device path only): the mean+normalise runs on device
    and a DEVICE (n_utts, emb) array returns with no host sync — the
    batch-serving dispatch chain feeds it straight into
    ``autoencoder.batch_forward_packed`` asynchronously.
    """
    if device is None:
        device = jax.default_backend() == "tpu"
    sp = cfg.spectrogram
    n_frames = slice_kwargs.get("partial_utterance_n_frames",
                                sp.partial_utterance_n_frames)
    step = slice_kwargs.get("mel_window_step", sp.mel_window_step)
    counts, row_blocks = [], []
    if device:
        for wav in wavs:
            wav_slices, mel_slices = dsp.compute_partial_slices(
                len(wav), sp.sr, partial_utterance_n_frames=n_frames,
                mel_window_step=step)
            wav_p = dsp.pad_for_slices(np.asarray(wav, np.float32),
                                       wav_slices)
            Lb = -(-len(wav_p) // sp.sr) * sp.sr       # 1 s buckets
            p_max = _bucket_partials(Lb, sp.sr, n_frames, step)
            starts = np.zeros(p_max, np.int32)
            true = [int(s.start) for s in mel_slices]
            starts[:len(true)] = true
            wav_b = np.pad(wav_p, (0, Lb - len(wav_p)))
            # PCM16 upload (half the link bytes; dequantised on device)
            wav_i16 = np.clip(np.round(wav_b.astype(np.float64) * 32767.0),
                              -32767, 32767).astype(np.int16)
            row_blocks.append(_device_partial_rows(
                jnp.asarray(wav_i16),
                jnp.asarray(starts), sp, p_max)[:len(true)])
            counts.append(len(true))
        rows = jnp.concatenate(row_blocks, axis=0)
        R = int(rows.shape[0])
        Rb = -(-R // 32) * 32
        if Rb != R:
            rows = jnp.pad(rows, ((0, Rb - R), (0, 0), (0, 0)))
        if not block:
            return _segment_embeds(forward_jit(params, rows),
                                   tuple(counts))
    else:
        for wav in wavs:
            fb, _, _ = dsp.mel_spec_speaker_encoder_sliced(
                wav, sp, use_native=True, **slice_kwargs)
            row_blocks.append(np.asarray(fb))
            counts.append(fb.shape[0])
        rows = np.concatenate(row_blocks, axis=0)
        R = rows.shape[0]
        Rb = -(-R // 32) * 32          # bounded compile-cache variants
        if Rb != R:
            rows = np.pad(rows, ((0, Rb - R), (0, 0), (0, 0)))
    emb = np.asarray(forward_jit(params, rows))
    outs, r = [], 0
    for n in counts:
        raw = emb[r:r + n].mean(axis=0)
        r += n
        outs.append(raw / np.linalg.norm(raw, 2))
    return outs


def similarity_matrix(params: Params, embeds: jnp.ndarray) -> jnp.ndarray:
    """GE2E similarity matrix (model.py:192-234), vectorised.

    Args:
      embeds: (speakers S, utterances U, emb E), assumed L2-normalised.
    Returns: (S, U, S) scaled cosine similarities — entry [j, u, k] compares
    utterance u of speaker j with the centroid of speaker k; the k == j case
    uses the exclusive centroid (leave-one-out).
    """
    S, U, E = embeds.shape
    centroids_incl = jnp.mean(embeds, axis=1)                     # (S, E)
    centroids_incl = centroids_incl / jnp.linalg.norm(
        centroids_incl, axis=-1, keepdims=True)
    centroids_excl = (jnp.sum(embeds, axis=1, keepdims=True) - embeds) \
        / (U - 1)                                                  # (S, U, E)
    centroids_excl = centroids_excl / jnp.linalg.norm(
        centroids_excl, axis=-1, keepdims=True)

    sim_all = jnp.einsum("jue,ke->juk", embeds, centroids_incl)
    sim_diag = jnp.sum(embeds * centroids_excl, axis=-1)           # (S, U)
    eye = jnp.eye(S, dtype=bool)[:, None, :]                       # (S, 1, S)
    sim = jnp.where(eye, sim_diag[:, :, None], sim_all)
    return sim * params["similarity_weight"] + params["similarity_bias"]


def ge2e_loss(params: Params, embeds: jnp.ndarray) -> jnp.ndarray:
    """GE2E softmax loss (model.py:236-264): cross-entropy of the similarity
    rows against the true speaker index."""
    S, U, _ = embeds.shape
    sim = similarity_matrix(params, embeds).reshape(S * U, S)
    targets = jnp.repeat(jnp.arange(S), U)
    logp = jax.nn.log_softmax(sim, axis=-1)
    return -jnp.mean(logp[jnp.arange(S * U), targets])


def _forward_train(params: Params, utterances: jnp.ndarray,
                   fast_kernels: bool | None = None) -> jnp.ndarray:
    """Training-path forward.  On single-device TPU the 3x256 stack runs
    as the fused Pallas train kernel (ops/lstm_train_pallas: all layers
    chained per round, VMEM-resident weights, custom-VJP backward kernel —
    the six per-layer XLA scans it replaces were ~1.3 ms of the 1.56 ms
    step, VERDICT r4 #7).  Elsewhere: per-layer scans whose hand-derived
    VJP (ops/rnn._lstm_core) keeps the backward's weight gradients out of
    the scan.  Numerics are identical to :func:`forward`;
    ``fast_kernels=False`` forces the scan path (GSPMD-sharded callers —
    Pallas carries no sharding rule)."""
    from autovc_tpu.ops import lstm_train_pallas as LT
    H = params["lstm"][0]["w_hh"].shape[0]
    use_kernel = (LT.stack_train_supported(H) if fast_kernels is None
                  else fast_kernels)
    if use_kernel:
        _, (h, _) = LT.lstm_stack_train(params["lstm"], utterances)
    else:
        _, (h, _), _ = R.lstm_stack(params["lstm"], utterances)
    raw = jax.nn.relu(C.linear(params["linear"], h))
    return raw / jnp.linalg.norm(raw, axis=-1, keepdims=True)


def batch_ge2e_loss(params: Params, batch: jnp.ndarray,
                    fast_kernels: bool | None = None) -> jnp.ndarray:
    """Loss from raw mel batches (S, U, frames, mels): embed every utterance
    as one flat batch (MXU-friendly — the reference loops per speaker,
    model.py:267-272), reshape, apply GE2E."""
    S, U, T, M = batch.shape
    embeds = _forward_train(params, batch.reshape(S * U, T, M),
                            fast_kernels).reshape(S, U, -1)
    return ge2e_loss(params, embeds)


def equal_error_rate(sim: np.ndarray) -> float:
    """EER diagnostic from a similarity matrix (S, U, S) — the metric the
    reference left commented out (model.py:254-262)."""
    S, U, _ = sim.shape
    labels = np.zeros((S, U, S), dtype=bool)
    for j in range(S):
        labels[j, :, j] = True
    scores = sim.reshape(-1)
    truth = labels.reshape(-1)
    order = np.argsort(-scores)
    truth = truth[order]
    tpr = np.cumsum(truth) / max(truth.sum(), 1)
    fpr = np.cumsum(~truth) / max((~truth).sum(), 1)
    return float(fpr[np.argmin(np.abs(fpr - (1 - tpr)))])


def learn_speaker(params: Params, wav_files, cfg: SpeakerEncoderConfig
                  = SpeakerEncoderConfig()) -> np.ndarray:
    """Mean speaker embedding over a list of wav files (model.py:446-460)."""
    from autovc_tpu.audio import io
    embeds = []
    for f in wav_files:
        wav, _ = io.load_wav(f, sr=cfg.spectrogram.sr)
        embeds.append(embed_utterance(params, wav, cfg))
    return np.mean(np.stack(embeds), axis=0)
