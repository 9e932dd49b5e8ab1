"""Test configuration: force an 8-device CPU mesh so sharding/collective tests
run without TPU hardware (the TPU-native analogue of multi-node testing —
SURVEY.md §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the shell pre-sets a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# A sitecustomize hook registers the TPU PJRT plugin and pins the platform at
# interpreter start, so the env var alone is not enough here.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


SAMPLES_DIR = "/root/reference/data/samples"


@pytest.fixture(scope="session", autouse=True)
def _isolate_cwd(tmp_path_factory):
    """Run the whole suite from a temp cwd so repo-relative writes
    (``logs/``, ``results/``, ``models/``) never mutate the repository."""
    cwd = os.getcwd()
    os.chdir(tmp_path_factory.mktemp("cwd"))
    yield
    os.chdir(cwd)


@pytest.fixture(scope="session")
def sample_wav():
    """A short real utterance at 22050 Hz (auto-encoder rate)."""
    from autovc_tpu.audio import io
    wav, sr = io.load_wav(os.path.join(SAMPLES_DIR, "hilde_1.wav"), sr=22050)
    assert sr == 22050
    return wav


@pytest.fixture(scope="session")
def sample_wav_16k():
    """Same utterance at 16 kHz (speaker-encoder rate)."""
    from autovc_tpu.audio import io
    wav, sr = io.load_wav(os.path.join(SAMPLES_DIR, "hilde_1.wav"), sr=16000)
    assert sr == 16000
    return wav


@pytest.fixture()
def rng():
    return np.random.default_rng(0)
