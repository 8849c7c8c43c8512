"""Rehearsal of the paper-parity harness (scripts/paper_parity.py) on
synthetic stand-ins + a locally-exported torch replica checkpoint — proving
the one-command flow (unpack -> import .pt -> evaluation protocol -> table)
works end-to-end before the real assets exist (VERDICT round 3 #3)."""

import io
import json
import os
import pickle
import subprocess
import sys
import tarfile

import numpy as np
import torch

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(REPO, "scripts"))

# Deliberately UNMARKED (runs in the quick tier, ~20 s with the persistent
# compile cache): this rehearsal is the one artifact that must work the day
# the real ShapeNet assets appear, so it runs on every `-m "not slow"`
# invocation and cannot silently rot (VERDICT r4 #8).


def test_unpack_archive_layouts(tmp_path, monkeypatch):
    """tar.xz with the reference layout unpacks to data/<subdir>; nested
    layouts are probed; plain dirs pass through."""
    import paper_parity

    monkeypatch.chdir(tmp_path)
    payload = pickle.dumps({"fake": True})
    arch = tmp_path / "ShapeNet1D.tar.xz"
    with tarfile.open(arch, "w:xz") as tf:
        info = tarfile.TarInfo("ShapeNet1D/val_data.pkl")
        info.size = len(payload)
        tf.addfile(info, io.BytesIO(payload))
    dest = paper_parity.unpack_archive(str(arch), "shapenet_1d")
    assert os.path.exists(os.path.join(dest, "val_data.pkl"))
    # second call: idempotent skip
    assert paper_parity.unpack_archive(str(arch), "shapenet_1d") == dest
    # plain dir passes through
    assert paper_parity.unpack_archive(dest, "shapenet_1d") == dest


def test_parity_harness_end_to_end(tmp_path, monkeypatch):
    """Export a full-size reference-layout CNPShapeNet1D replica .pt, then
    run the harness against the synthetic split: it must import the
    checkpoint, run the deterministic sweep, emit paper_parity.json, and
    apply the tolerance gate (exit 0 inside, 1 outside)."""
    from tests.test_torch_import import TorchSmallCNP
    from wmfml_tpu.data.synthetic import ensure_dataset

    data_root = ensure_dataset("shapenet_1d", os.path.join(REPO,
                                                           "data_synth"))
    ckpt = tmp_path / "best_test_model.pt"
    torch.save(TorchSmallCNP(dim_r=100).state_dict(), str(ckpt))

    monkeypatch.chdir(tmp_path)
    import paper_parity

    argv = ["--task", "shapenet_1d", "--method", "CNPShapeNet1D",
            "--checkpoint", str(ckpt), "--data-path",
            os.path.join(REPO, data_root),
            "--val-iters", "1", "--max-ctx", "3",
            "--paper-value", "90.0", "--tolerance-pct", "99.0",
            "--agg-mode", "max",
            "tasks_per_batch=2", "data_size=small", "device=cpu",
            "dim_r=100", "query_num=4"]
    rc = paper_parity.main(argv)
    assert rc == 0

    # the json artifact exists under the run dir and carries the comparison
    runs = []
    for root, _dirs, files in os.walk(tmp_path):
        if "paper_parity.json" in files:
            runs.append(os.path.join(root, "paper_parity.json"))
    assert runs, "paper_parity.json not written"
    result = json.load(open(runs[0]))
    assert result["within_tolerance"]
    assert len(result["per_ctx"]) == 3
    assert np.isfinite(result["per_ctx"]).all()
    # a fresh (untrained) replica's angular error sits near chance (~90 deg)
    assert 10.0 < result["mean"] < 180.0

    # tolerance gate: an absurd paper value must fail the run
    argv_fail = [a for a in argv]
    argv_fail[argv_fail.index("--paper-value") + 1] = "1.0"
    argv_fail[argv_fail.index("--tolerance-pct") + 1] = "1.0"
    assert paper_parity.main(argv_fail) == 1
