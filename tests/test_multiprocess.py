"""Multi-host training path: 2 processes × 4 virtual CPU devices run one
real shard_map train step over a global mesh and agree on the result
(SURVEY §2.9 TPU-native multi-host; reference ``train_mi_multimodal.py:27-49``)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # two full CPU-mesh train-step compiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_dryrun():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env["DRYRUN_MP_PORT"] = "45893"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "dryrun_multiprocess.py")],
        capture_output=True, text=True, timeout=1800, env=env)
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-2000:]
    assert "MULTIPROCESS_DRYRUN OK" in out.stdout, out.stdout[-3000:]
