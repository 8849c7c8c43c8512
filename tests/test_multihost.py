"""Multi-host data feed: 2-process CPU cluster driving shard_batch's
jax.make_array_from_process_local_data branch (VERDICT round-1 item #5;
SURVEY §2.9 multi-host plan)."""

import os
import socket
import subprocess
import sys

WORKER = os.path.join(os.path.dirname(__file__), "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_shard_batch_and_checkpoint(tmp_path):
    """Feed + collective + orbax save/restore of sharded state, 2 processes
    (the checkpoint leg is round-2 VERDICT item #9)."""
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # workers set their own device count
    env["JAX_PLATFORMS"] = "cpu"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    run_dir = str(tmp_path / "run")
    procs = [subprocess.Popen([sys.executable, WORKER, str(pid), port,
                               run_dir],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env,
                              cwd=root)
             for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"worker {pid}: ok" in out
        assert "ckpt=roundtrip" in out
    assert os.path.isdir(os.path.join(run_dir, "models", "model_multihost"))
