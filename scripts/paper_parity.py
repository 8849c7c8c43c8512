#!/usr/bin/env python
"""One-command paper-parity validation harness.

The real data archives and pretrained checkpoints are git-LFS pointers /
Google-Drive downloads unavailable in this environment
(/root/reference/README.md:26-40), so paper-table parity cannot be measured
here — but the moment the assets exist, THIS is the single command:

    python scripts/paper_parity.py \
        --task shapenet_1d --method ANPShapeNet1D \
        --checkpoint path/to/best_test_model.pt \
        --archive path/to/ShapeNet1D.tar.xz \
        --paper-value <paper table number> [--tolerance-pct 1.0]

What it does (the reference evaluation.py protocol,
evaluator/model_evaluator.py:95-122):
  1. unpacks --archive into data/<reference subdir>/ (idempotent; skips if
     the probe file already exists; plain directories also accepted),
  2. imports the torch .pt through the checkpoint importer matrix
     (wmfml_tpu/ckpt/torch_import.py — all 24 reference methods),
  3. runs the deterministic loss-vs-ctx sweep (ctx 1..max, val_iters
     batches per point, split RNG reseeded to 42),
  4. prints the per-ctx table plus the summary metric (mean test loss over
     all ctx counts, and the max-ctx point), compares against
     --paper-value, and exits 1 if outside --tolerance-pct.

Rehearsed end-to-end on synthetic stand-ins + a locally-exported torch
replica checkpoint by tests/test_paper_parity.py — known-working mechanics,
only the assets are missing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tarfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# built-in eval configs per (task, method) mirroring cfg/evaluation/*.yaml;
# anything can be overridden from the command line
EVAL_CFGS = {
    ("shapenet_1d", "ANPShapeNet1D"): "cfg/evaluation/ANP_ShapeNet1D.yaml",
    ("shapenet_3d", "ANP"): "cfg/evaluation/ANP_ShapeNet3D.yaml",
    ("distractor", "CNPDistractor"): "cfg/evaluation/CNP_max_Distractor.yaml",
    ("distractor", "FCLCNPDistractor"):
        "cfg/evaluation/CNP_FCL_max_Distractor.yaml",
}

METRIC_NAMES = {
    "shapenet_1d": "angular error (deg)",
    "shapenet_3d": "quaternion L1",
    "distractor": "pixel error",
    "pascal_1d": "MSE (x10 labels)",
}


def unpack_archive(archive: str, task: str) -> str:
    """Extract the reference data archive into data/<subdir>; return path."""
    from wmfml_tpu.data.factory import REFERENCE_SUBDIRS, _PROBE_FILES

    dest = os.path.join("data", REFERENCE_SUBDIRS[task])
    probe = os.path.join(dest, _PROBE_FILES[task])
    if os.path.isdir(archive):  # already-unpacked directory
        return archive
    if os.path.exists(probe):
        print(f"[paper_parity] {probe} already present; skipping unpack")
        return dest
    os.makedirs("data", exist_ok=True)
    print(f"[paper_parity] extracting {archive} -> data/ ...")
    with tarfile.open(archive) as tf:  # auto-detects xz/gz/bz2
        tf.extractall("data", filter="data")
    if not os.path.exists(probe):
        # archives may nest the split dir one level down — probe for it
        for root, _dirs, files in os.walk("data"):
            if _PROBE_FILES[task] in files and os.path.abspath(
                    root) != os.path.abspath(dest):
                print(f"[paper_parity] probe found under {root}")
                return root
        raise FileNotFoundError(
            f"after extraction, {probe} not found — archive layout "
            f"unexpected; unpack manually per /root/reference/README.md:26-37")
    return dest


def run(args) -> int:
    from wmfml_tpu.cli.evaluation_cli import evaluate
    from wmfml_tpu.configs import Config

    cfg_path = EVAL_CFGS.get((args.task, args.method))
    overrides = [f"method={args.method}", f"task={args.task}",
                 f"checkpoint={args.checkpoint}", "mode=evaluation",
                 f"val_iters={args.val_iters}",
                 f"max_ctx_num={args.max_ctx}"] + (args.overrides or [])
    if args.data_path:
        overrides.append(f"data_path={args.data_path}")
    if cfg_path and os.path.exists(cfg_path):
        config = Config(cfg_path, overrides=overrides)
    else:
        from wmfml_tpu.configs.config import _parse_override

        base = dict(
            method=args.method, task=args.task, aug_list=[], checkpoint="",
            agg_mode=args.agg_mode, img_agg=args.img_agg, loss_type="mse",
            tasks_per_batch=10, max_ctx_num=args.max_ctx,
            val_iters=args.val_iters, noise_scale=0.0, lr=1e-4,
            weight_decay=False, optimizer="Adam", bg_gen_freq=1000,
            val_freq=50, iterations=1, device="tpu", seed=2578,
            data_size="large", dim_w=64, n_hidden_units_r=[100, 100],
            dim_r=64, dim_z=64, mode="evaluation")
        for item in overrides:
            key, _, val = item.partition("=")
            base[key.strip()] = _parse_override(val.strip())
        config = Config.from_dict(base, make_dirs=True)
    val_losses, test_losses = evaluate(config)

    losses = test_losses if (args.split == "test" and len(test_losses)) \
        else val_losses
    losses = [float(x) for x in losses]
    metric = METRIC_NAMES.get(args.task, "loss")
    mean_all = sum(losses) / len(losses)
    at_max = losses[-1]
    print(f"\n=== paper parity: {args.method} / {args.task} "
          f"({args.split} split) ===")
    print(f"per-ctx {metric}: " + " ".join(f"{x:.4f}" for x in losses))
    print(f"mean over ctx 1..{len(losses)}: {mean_all:.4f}")
    print(f"at ctx={len(losses)}: {at_max:.4f}")
    result = {"method": args.method, "task": args.task, "split": args.split,
              "metric": metric, "per_ctx": losses, "mean": mean_all,
              "at_max_ctx": at_max}
    if args.paper_value is not None:
        ours = mean_all if args.compare == "mean" else at_max
        delta_pct = 100.0 * (ours - args.paper_value) / args.paper_value
        ok = abs(delta_pct) <= args.tolerance_pct
        print(f"paper value: {args.paper_value:.4f}  ours({args.compare}): "
              f"{ours:.4f}  delta: {delta_pct:+.2f}%  "
              f"[{'OK' if ok else 'OUTSIDE TOLERANCE'} "
              f"+/-{args.tolerance_pct}%]")
        result.update(paper_value=args.paper_value, delta_pct=delta_pct,
                      within_tolerance=ok)
    out_path = os.path.join(config.save_path, "paper_parity.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")
    if args.paper_value is not None and not result["within_tolerance"]:
        return 1
    return 0


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--task", required=True,
                   choices=["shapenet_1d", "shapenet_3d", "distractor",
                            "pascal_1d"])
    p.add_argument("--method", required=True)
    p.add_argument("--checkpoint", required=True,
                   help="reference .pt (imported) or orbax checkpoint dir")
    p.add_argument("--archive", default=None,
                   help="real data archive (tar.xz) or unpacked dir; "
                        "omit to use whatever data/ (or synthetic) resolves")
    p.add_argument("--data-path", default=None,
                   help="explicit data dir (overrides archive resolution)")
    p.add_argument("--paper-value", type=float, default=None,
                   help="the paper-table number to compare against "
                        "(arXiv 2203.04905 tables; metric per task)")
    p.add_argument("--tolerance-pct", type=float, default=1.0)
    p.add_argument("--compare", choices=["mean", "at_max_ctx"],
                   default="mean")
    p.add_argument("--split", choices=["test", "validation"], default="test")
    p.add_argument("--val-iters", type=int, default=10)
    p.add_argument("--max-ctx", type=int, default=25)
    p.add_argument("--agg-mode", default="attention")
    p.add_argument("--img-agg", default="")
    p.add_argument("overrides", nargs="*",
                   help="extra dotted config overrides (key=value)")
    args = p.parse_args(argv)

    if args.archive and not args.data_path:
        args.data_path = unpack_archive(args.archive, args.task)
    return run(args)


if __name__ == "__main__":
    sys.exit(main())
