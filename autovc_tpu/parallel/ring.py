"""Sequence-parallel (SP) recurrence: time-sharded LSTM with a ppermute ring.

The reference scales long audio only by overlapped *chunking* (SURVEY.md §5;
reference ``compute_partial_slices`` autovc/audio/spectrogram.py:248-311 and
the nanmean chunk merge autovc/auto_encoder/model.py:395-437), which is
approximate at chunk boundaries.  This module is the **exact** TPU-native
sequence-parallel design promised in SURVEY.md §2c: the time axis is sharded
over the mesh, each device scans only its local slice, and boundary hidden
states travel between neighbour devices over ICI with ``lax.ppermute`` — the
recurrent-network analogue of ring attention.

What it buys on hardware:

* **memory**: activations and the hoisted input projection (the (B, T, 4H)
  tensor, by far the largest buffer of an LSTM layer) are split N ways, so
  sequences N× longer than one chip's HBM fit;
* **parallel phases**: the input projection (one big MXU matmul) and all
  elementwise work run fully data-parallel over the time shards; only the
  thin (B, H) @ (H, 4H) recurrent chain is serialized;
* **wavefronts**: for the bidirectional layer the forward wavefront starts at
  device 0 and the backward wavefront at device N-1 *concurrently*, so two
  devices are always busy — 2× utilization over running the directions
  back-to-back;
* **ICI traffic**: one (B, H) hidden-state + (B, H) cell-state hop per device
  boundary per direction — a few KB riding ICI, negligible vs the compute.

Exactness is asserted against the single-device scans in
tests/test_ring_sp.py on an 8-device CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from autovc_tpu.ops import rnn as R

Params = Dict[str, Any]


def _local_scan(w_hh, xp_t, h, c, reverse: bool):
    """Scan the fused-gate LSTM body over a local (T_loc, B, 4H) slice."""

    def step(carry, xt):
        h, c = carry
        gates = xt + jnp.matmul(h, w_hh, precision=R.DOT_PRECISION)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (h, c), h

    return jax.lax.scan(step, (h, c), xp_t, reverse=reverse)


def _wavefront(params: Params, xl: jnp.ndarray, axis_name: str, n: int,
               reverse: bool):
    """One direction of the ring scan, inside shard_map.

    ``xl`` is the local (B, T_loc, I) time shard.  Device k is active at
    wavefront step k (forward) or n-1-k (backward); between steps the (h, c)
    boundary state hops one device along the ring.
    Returns local outputs (B, T_loc, H) and the replicated final (h, c).
    """
    idx = jax.lax.axis_index(axis_name)
    B = xl.shape[0]
    H = params["w_hh"].shape[0]
    # Hoisted input projection: fully parallel across time shards (MXU).
    xp = (jnp.matmul(xl, params["w_ih"], precision=R.DOT_PRECISION)
          + params["b_ih"] + params["b_hh"])
    xp_t = jnp.swapaxes(xp, 0, 1)                       # (T_loc, B, 4H)

    h0 = jax.lax.pcast(jnp.zeros((B, H), xl.dtype), axis_name, to="varying")
    c0 = jax.lax.pcast(jnp.zeros((B, H), xl.dtype), axis_name, to="varying")
    ys0 = jax.lax.pcast(jnp.zeros(xp_t.shape[:2] + (H,), xl.dtype),
                        axis_name, to="varying")

    if reverse:  # boundary state flows right -> left
        perm = [((i + 1) % n, i) for i in range(n)]
    else:
        perm = [(i, (i + 1) % n) for i in range(n)]

    def outer(k, carry):
        h, c, ys = carry
        my_turn = idx == (n - 1 - k if reverse else k)

        def run(op):
            h, c, _ = op
            (h2, c2), ys2 = _local_scan(params["w_hh"], xp_t, h, c, reverse)
            return h2, c2, ys2

        h, c, ys = jax.lax.cond(my_turn, run, lambda op: op, (h, c, ys))
        h = jax.lax.ppermute(h, axis_name, perm)
        c = jax.lax.ppermute(c, axis_name, perm)
        return h, c, ys

    h, c, ys = jax.lax.fori_loop(0, n, outer, (h0, c0, ys0))
    # After the last hop the final state sits on device 0 (forward) /
    # device n-1 (backward); broadcast it with a masked psum.
    owner = jnp.asarray(n - 1 if reverse else 0, idx.dtype)
    mask = (idx == owner).astype(xl.dtype)
    h = jax.lax.psum(h * mask, axis_name)
    c = jax.lax.psum(c * mask, axis_name)
    return jnp.swapaxes(ys, 0, 1), (h, c)


def ring_lstm_layer(params: Params, x: jnp.ndarray, mesh: Mesh,
                    axis_name: str = "data", reverse: bool = False):
    """Time-sharded exact LSTM layer over a global (B, T, I) array.

    Equivalent to :func:`autovc_tpu.ops.rnn.lstm_layer`; T must divide by the
    mesh axis size.  Returns outputs (B, T, H) sharded on the time axis and
    the replicated final (h, c).
    """
    n = mesh.shape[axis_name]
    assert x.shape[1] % n == 0, \
        f"sequence length {x.shape[1]} must divide mesh axis size {n}"
    f = jax.shard_map(
        lambda p, xl: _wavefront(p, xl, axis_name, n, reverse),
        mesh=mesh,
        in_specs=(P(), P(None, axis_name, None)),
        out_specs=(P(None, axis_name, None), (P(), P())),
    )
    return f(params, x)


def ring_bilstm_layer(layer: Params, x: jnp.ndarray, mesh: Mesh,
                      axis_name: str = "data") -> jnp.ndarray:
    """Bidirectional time-sharded layer with *concurrent* wavefronts.

    The forward pass starts at device 0 and the backward pass at device N-1
    in the same wavefront loop, so both directions' recurrent chains advance
    simultaneously from opposite ends of the ring (2x utilization vs
    sequential directions).  Matches
    ``ops.rnn.bilstm_stack([layer], x)``: output is [fwd, bwd] concatenated
    on the feature axis.
    """
    n = mesh.shape[axis_name]
    assert x.shape[1] % n == 0

    def local(fwd_p, bwd_p, xl):
        idx = jax.lax.axis_index(axis_name)
        B = xl.shape[0]
        H = fwd_p["w_hh"].shape[0]

        def hoist(p):
            xp = (jnp.matmul(xl, p["w_ih"], precision=R.DOT_PRECISION)
                  + p["b_ih"] + p["b_hh"])
            return jnp.swapaxes(xp, 0, 1)               # (T_loc, B, 4H)

        xp_f, xp_b = hoist(fwd_p), hoist(bwd_p)
        z = jax.lax.pcast(jnp.zeros((B, H), xl.dtype), axis_name,
                          to="varying")
        ys_shape = xp_f.shape[:2] + (H,)
        ys_z = jax.lax.pcast(jnp.zeros(ys_shape, xl.dtype), axis_name,
                             to="varying")
        carry = (z, z, ys_z,                             # fwd h, c, ys
                 z, z, ys_z)                             # bwd h, c, ys
        perm_f = [(i, (i + 1) % n) for i in range(n)]
        perm_b = [((i + 1) % n, i) for i in range(n)]

        def outer(k, carry):
            hf, cf, yf, hb, cb, yb = carry

            def run_f(op):
                h, c, _ = op
                (h2, c2), ys2 = _local_scan(fwd_p["w_hh"], xp_f, h, c, False)
                return h2, c2, ys2

            def run_b(op):
                h, c, _ = op
                (h2, c2), ys2 = _local_scan(bwd_p["w_hh"], xp_b, h, c, True)
                return h2, c2, ys2

            hf, cf, yf = jax.lax.cond(idx == k, run_f, lambda op: op,
                                      (hf, cf, yf))
            hb, cb, yb = jax.lax.cond(idx == n - 1 - k, run_b, lambda op: op,
                                      (hb, cb, yb))
            hf = jax.lax.ppermute(hf, axis_name, perm_f)
            cf = jax.lax.ppermute(cf, axis_name, perm_f)
            hb = jax.lax.ppermute(hb, axis_name, perm_b)
            cb = jax.lax.ppermute(cb, axis_name, perm_b)
            return hf, cf, yf, hb, cb, yb

        _, _, yf, _, _, yb = jax.lax.fori_loop(0, n, outer, carry)
        out = jnp.concatenate([yf, yb], axis=-1)         # (T_loc, B, 2H)
        return jnp.swapaxes(out, 0, 1)

    f = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(None, axis_name, None)),
        out_specs=P(None, axis_name, None),
    )
    return f(layer["fwd"], layer["bwd"], x)


def ring_bilstm_stack(params: Sequence[Params], x: jnp.ndarray, mesh: Mesh,
                      axis_name: str = "data") -> jnp.ndarray:
    """Multi-layer time-sharded BLSTM (the AE encoder's recurrence,
    reference autovc/auto_encoder/encoder.py:51, scaled to sequences beyond
    one chip).  Layer l+1's data-parallel input projection overlaps layer
    l's tail wavefront under XLA's async scheduling."""
    for layer in params:
        x = ring_bilstm_layer(layer, x, mesh, axis_name)
    return x


def ring_lstm_stack(params: Sequence[Params], x: jnp.ndarray, mesh: Mesh,
                    axis_name: str = "data") -> jnp.ndarray:
    """Multi-layer unidirectional time-sharded LSTM (the AE decoder's
    recurrences, reference autovc/auto_encoder/decoder.py:37,53)."""
    for layer in params:
        x, _ = ring_lstm_layer(layer, x, mesh, axis_name)
    return x


@functools.partial(jax.jit, static_argnames=("cfg", "mesh", "axis_name",
                                             "precision"))
def ring_autovc_infer(params: Params, x: jnp.ndarray, c_org: jnp.ndarray,
                      c_trg: jnp.ndarray, cfg, mesh: Mesh,
                      axis_name: str = "data",
                      precision: str = "f32") -> jnp.ndarray:
    """EXACT sequence-parallel AutoVC conversion over the UNCHUNKED mel.

    The whole generator runs with its time axis sharded over the mesh: the
    conv stacks lower under GSPMD (XLA inserts the halo exchanges), and
    every recurrence runs as a ppermute ring wavefront
    (:func:`ring_bilstm_stack` for the encoder BLSTM — reference
    encoder.py:51 — and :func:`ring_lstm_stack` for the two decoder LSTMs,
    decoder.py:37-53).  Unlike the reference's overlapped-chunk strategy
    (spectrogram.py:248-311 + the nanmean merge), the result is bitwise the
    single-device ``autoencoder.infer`` output for the same input — no
    boundary approximation — while activations are split N ways, so audio
    N× longer than one chip's HBM fits.

    Args:
      x: (B, n_mels, T) mel with T divisible by the mesh axis size.
    Returns: (B, n_mels, T) converted postnet mel.
    """
    from autovc_tpu.models import autoencoder as AEm
    from autovc_tpu.ops import conv as C
    from autovc_tpu.ops import precision as PREC
    from jax.sharding import NamedSharding

    n = mesh.shape[axis_name]
    B, n_mels, T = x.shape
    if T % n:
        raise ValueError(
            f"ring SP needs the mel frame count ({T}) divisible by the "
            f"mesh axis size ({n}); pad or trim the input")
    tshard = NamedSharding(mesh, P(None, None, axis_name))

    with PREC.compute(PREC.resolve(precision)):
        x = jax.lax.with_sharding_constraint(x, tshard)
        enc = params["encoder"]
        h = jnp.concatenate(
            [x, jnp.broadcast_to(c_org[:, :, None],
                                 (*c_org.shape, T))], axis=1)
        for p in enc["convs"]:
            h, _ = C.conv_bn(p, h, 5, train=False, activation=jax.nn.relu)
        h = jnp.swapaxes(h, 1, 2)                      # (B, T, 512)
        out = ring_bilstm_stack(enc["blstm"], h, mesh, axis_name)
        dim_neck = cfg.dim_neck
        out_f, out_b = out[..., :dim_neck], out[..., dim_neck:]
        codes_fwd = out_f[:, cfg.freq - 1::cfg.freq, :]
        codes_bwd = out_b[:, ::cfg.freq, :]

        up = AEm.upsample_codes(codes_fwd, codes_bwd, cfg.freq, T)
        dec_in = jnp.concatenate(
            [up, jnp.broadcast_to(c_trg[:, None, :],
                                  (B, T, c_trg.shape[-1]))], axis=-1)
        dec_in = jax.lax.with_sharding_constraint(
            dec_in, NamedSharding(mesh, P(None, axis_name, None)))
        dec = params["decoder"]
        h = ring_lstm_stack(dec["lstm1"], dec_in, mesh, axis_name)
        h = jnp.swapaxes(h, 1, 2)
        for p in dec["convs"]:
            h, _ = C.conv_bn(p, h, 5, train=False, activation=jax.nn.relu)
        h = jnp.swapaxes(h, 1, 2)
        h = ring_lstm_stack(dec["lstm2"], h, mesh, axis_name)
        mel_dec = jnp.swapaxes(C.linear(dec["proj"], h), 1, 2)

        r = mel_dec
        post = params["postnet"]["convs"]
        for i, p in enumerate(post):
            act = jnp.tanh if i < len(post) - 1 else None
            r, _ = C.conv_bn(p, r, 5, train=False, activation=act)
        return mel_dec + r
