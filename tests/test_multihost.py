"""Multi-process (multi-host analogue) test: two local processes join one
jax.distributed cluster and run a DP-sharded train step over the union of
their devices — SURVEY.md §4's 'multi-node without a real cluster'."""
import os

import pytest

from autovc_tpu.utils.launcher import launch_local_multiprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_dp_step():
    results = launch_local_multiprocess(
        os.path.join(REPO, "scripts", "multihost_smoke.py"),
        num_processes=2, devices_per_process=2, timeout=360)
    assert all(rc == 0 for rc, _ in results), results
    combined = "\n".join(out for _, out in results)
    assert "MULTIHOST_OK" in combined
    assert "procs=2" in combined and "devices=4" in combined
