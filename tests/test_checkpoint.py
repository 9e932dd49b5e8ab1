"""Checkpoint container tests: v2 zip format round-trip, optax-state
structure restore, legacy v1 pickle shim, torch-zip disambiguation, async
writes."""
import os
import pickle
import zipfile

import jax
import numpy as np
import optax
import pytest

from autovc_tpu.utils import checkpoint as ck


def _payload():
    rng = np.random.default_rng(0)
    params = {"encoder": {"convs": [{"w": rng.random((4, 3, 5),
                                                     ).astype(np.float32),
                                     "b": rng.random(4).astype(np.float32)}],
                          "blstm": [{"fwd": {"w_ih": rng.random((3, 8)
                                                                ).astype(np.float32)}}]}}
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = tx.update(params, tx.init(params), params)[1]
    return {"step": 7, "params": params, "opt_state": opt_state,
            "speakers": {"hilde": rng.random(8).astype(np.float32)},
            "note": None, "scale": 0.5}, tx


def test_v2_roundtrip_exact(tmp_path):
    payload, tx = _payload()
    path = str(tmp_path / "m.ckpt")
    ck.save_checkpoint(path, payload)

    # container is a plain zip with a manifest — no pickle anywhere
    with zipfile.ZipFile(path) as zf:
        assert "manifest.json" in zf.namelist()

    blob = ck.load_checkpoint(path)
    assert blob["step"] == 7
    assert blob["note"] is None and blob["scale"] == 0.5
    for got, want in zip(jax.tree_util.tree_leaves(blob["params"]),
                         jax.tree_util.tree_leaves(payload["params"])):
        np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(blob["speakers"]["hilde"],
                                  payload["speakers"]["hilde"])

    # optax state regains its exact namedtuple structure through restore_like
    target = tx.init(payload["params"])
    restored = ck.restore_like(target, blob["opt_state"])
    assert jax.tree_util.tree_structure(restored) \
        == jax.tree_util.tree_structure(target)
    for got, want in zip(jax.tree_util.tree_leaves(restored),
                         jax.tree_util.tree_leaves(payload["opt_state"])):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_v2_bfloat16_leaves(tmp_path):
    import jax.numpy as jnp
    path = str(tmp_path / "m.ckpt")
    arr = jnp.arange(6, dtype=jnp.bfloat16).reshape(2, 3) * 0.25
    ck.save_checkpoint(path, {"params": {"w": arr}})
    blob = ck.load_checkpoint(path)
    assert blob["params"]["w"].dtype.name == "bfloat16"
    np.testing.assert_array_equal(np.asarray(blob["params"]["w"], np.float32),
                                  np.asarray(arr, np.float32))


def test_v1_pickle_shim(tmp_path):
    path = str(tmp_path / "legacy.ckpt")
    legacy = {"format_version": 1, "step": 3,
              "params": {"w": np.ones((2, 2), np.float32)}}
    with open(path, "wb") as f:
        pickle.dump(legacy, f, protocol=4)
    # the pickle path is opt-in (pickle.load of untrusted bytes is code
    # execution): without allow_v1 the loader refuses
    with pytest.raises(ValueError):
        ck.load_checkpoint(path)
    blob = ck.load_checkpoint(path, allow_v1=True)
    assert blob["step"] == 3
    np.testing.assert_array_equal(blob["params"]["w"], np.ones((2, 2)))


def test_torch_zip_not_mistaken_for_v2(tmp_path):
    # a torch-style zip (pickle payload, no manifest) must be routed to the
    # torch converter, and our own .ckpt zip must NOT be
    torch_like = str(tmp_path / "ref_model")     # no suffix: magic only
    with zipfile.ZipFile(torch_like, "w") as zf:
        zf.writestr("archive/data.pkl", b"\x80\x02")
    assert ck._is_torch_checkpoint(torch_like)

    ours = str(tmp_path / "native_model")        # no suffix: magic only
    ck.save_checkpoint(ours, {"step": 1, "params": {}})
    assert not ck._is_torch_checkpoint(ours)
    assert ck.load_checkpoint(ours)["step"] == 1

    with pytest.raises(ValueError):
        ck.load_checkpoint(torch_like)


def test_async_save(tmp_path):
    payload, _ = _payload()
    path = str(tmp_path / "async.ckpt")
    ck.save_checkpoint(path, payload, block=False)
    ck.wait_for_saves()
    assert os.path.exists(path)
    assert ck.load_checkpoint(path)["step"] == 7

    # background errors surface on the wait
    bad_dir = str(tmp_path / "f.ckpt")
    open(bad_dir, "w").close()
    ck.save_checkpoint(bad_dir + "/x.ckpt", payload, block=False)
    with pytest.raises(Exception):
        ck.wait_for_saves()


def test_rejects_unserialisable_leaf(tmp_path):
    with pytest.raises(TypeError):
        ck.save_checkpoint(str(tmp_path / "x.ckpt"), {"fn": lambda: 0})
