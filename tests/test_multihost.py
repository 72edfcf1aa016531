"""Multi-host bring-up: two localhost processes over jax.distributed (CPU,
Gloo collectives) run the DP trainer through the real CLI to completion —
the VERDICT #5 'launchable program' requirement, simulated without hardware."""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_multihost(tmp_path, num_procs: int, episodes: int,
                   timeout: int = 600):
    port = _free_port()
    env = dict(os.environ)
    # one CPU device per process: the global mesh is then exactly num_procs
    # devices, one per "host" (the conftest's 8-device forcing must not leak).
    env["XLA_FLAGS"] = ""
    env.pop("JAX_PLATFORMS", None)

    common = [
        sys.executable, str(REPO / "train.py"), "train",
        "--platform", "cpu",
        "--coordinator-address", f"127.0.0.1:{port}",
        "--num-processes", str(num_procs),
        "--mesh-data", str(num_procs),
        "--steps", "2", "--episodes", str(episodes),
        "--batch-size", str(2 * num_procs),
        "--scan-cap", "48", "-H", "16", "--num-layers", "1",
        "--warmup-steps", "1", "--points", "0.1", "--mono", "1.0",
        "--upsample-ratio", "0.25", "--print-freq", "1",
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--log-dir", str(tmp_path / "logs"),
    ]
    procs = [
        subprocess.Popen(common + ["--process-id", str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, cwd=str(REPO))
        for i in range(num_procs)
    ]
    outs = [p.communicate(timeout=timeout)[0].decode() for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"process {i} failed:\n{outs[i][-3000:]}"

    # only process 0 logs and checkpoints
    assert (tmp_path / "ck" / "train_state.npz").exists()
    logs = list((tmp_path / "logs").glob("train_mlp_*.jsonl"))
    assert len(logs) == 1, logs
    rows = [json.loads(l) for l in logs[0].read_text().splitlines()]
    step_rows = [r for r in rows if "avg_score" in r]
    assert len(step_rows) == 2
    assert step_rows[0]["samples"] > 0
    for i in range(1, num_procs):
        assert "process 0" not in outs[i]  # non-main ranks stayed quiet
    manifest = json.loads((tmp_path / "ck" / "train_state.json").read_text())
    assert manifest["train_step"] == 1


def test_two_process_localhost_training(tmp_path):
    _run_multihost(tmp_path, num_procs=2, episodes=4)


def test_eight_process_localhost_training(tmp_path):
    """8 localhost processes — the same process count as the driver's
    dryrun_multichip(8) mesh, so process-count-dependent bugs (fold_in
    fan-out, divisibility gates, logging gates) are exercised at the dryrun
    width (VERDICT r3 item 8). Tiny shapes; slow only in process spin-up."""
    _run_multihost(tmp_path, num_procs=8, episodes=8, timeout=900)
