"""Real fault injection (SURVEY.md §4(c) / VERDICT round-1 item 9): SIGKILL
an SfM worker PROCESS mid-run, then resume from its last on-disk checkpoint
and reproduce the uninterrupted trajectory.

Unlike test_elastic (which constructs the truncated state), this test kills
an actual OS process between BA windows — exercising atomic checkpoint
writes and cold-process resume, the same path a respawned host takes after
`jax.distributed` re-initialization."""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from akaze_tpu.core.config import RansacConfig, SfmConfig
from akaze_tpu.sfm.checkpoint import load_checkpoint
from akaze_tpu.sfm.incremental import run_incremental
from tests.test_sfm import _synthetic_sequence

_WORKER = """
import sys, time
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from akaze_tpu.core.config import RansacConfig, SfmConfig
from akaze_tpu.sfm.incremental import run_incremental
from tests.test_sfm import _synthetic_sequence

obs, gt, _ = _synthetic_sequence(K=14, noise=5e-4, seed=7)

def pace(k_end, poses, n_points):
    # Mark progress so the parent knows a checkpoint landed, then give it a
    # window to deliver SIGKILL mid-run.
    print(f"WINDOW {{k_end}}", flush=True)
    time.sleep(0.8)

run_incremental(
    obs, 14, SfmConfig(ba_iterations=6),
    RansacConfig(num_iterations=128, inlier_threshold=5e-3),
    ba_every=3, checkpoint_path=sys.argv[1], on_window=pace,
)
print("DONE", flush=True)
"""


def test_sigkill_and_resume(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = tmp_path / "map.npz"
    proc = subprocess.Popen(
        [sys.executable, "-u", "-c", _WORKER.format(repo=repo), str(ckpt)],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=repo,
    )
    # Wait for at least one completed window (checkpoint on disk), then kill
    # the process hard while it is still mid-run.
    first_window = None
    deadline = time.time() + 300
    while time.time() < deadline:
        line = proc.stdout.readline()
        if not line:
            break
        if line.startswith("WINDOW"):
            first_window = int(line.split()[1])
            break
        if line.startswith("DONE"):
            pytest.fail("worker finished before it could be killed")
    assert first_window is not None, "worker produced no window before exit"
    proc.kill()  # SIGKILL — no cleanup, no atexit
    proc.wait(timeout=60)
    assert proc.returncode == -signal.SIGKILL

    ckpt_state = load_checkpoint(ckpt)
    assert 0 < ckpt_state.next_keyframe < 14  # genuinely mid-run

    # Resume in THIS process from the dead worker's checkpoint.
    obs, gt, _ = _synthetic_sequence(K=14, noise=5e-4, seed=7)
    scfg = SfmConfig(ba_iterations=6)
    rcfg = RansacConfig(num_iterations=128, inlier_threshold=5e-3)
    resumed = run_incremental(
        obs, 14, scfg, rcfg, ba_every=3, resume=ckpt_state
    )
    full = run_incremental(obs, 14, scfg, rcfg, ba_every=3)
    np.testing.assert_allclose(resumed.poses, full.poses, atol=5e-2)
