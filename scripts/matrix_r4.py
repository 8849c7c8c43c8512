#!/usr/bin/env python
"""Round-4 learning-matrix completion (VERDICT round-3 #2).

Runs, serialized on the one TPU chip, the rows the matrix lacks:
  1. SingleTaskShapeNet1D DA+TA 20k train (the non-meta baseline family)
  2. the full refinement protocol on its best checkpoint (fine-tune per
     ctx 1..15, reference refinement.py:32-92) -> loss_vs_ctx.txt
  3. ANP + CNP DA+TA 20k controls on the SAME split + the evaluation-CLI
     loss-vs-ctx sweep, so the refinement baseline curve can sit next to
     the meta-learners' (the paper's central comparison)
  4. VanillaMAML Pascal1D (gradient-based family x its flagship task)
  5. ANPMRShapeNet3D (BBB family x 3D task, 240-item healthy split)

Each stage appends to matrix_r4.json as it lands so a crash loses nothing.

    python scripts/matrix_r4.py [--stages singletask,refine,anp,cnp,maml_pascal,anpmr3d]
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = "matrix_r4.json"


def _best(save_path):
    best = {}
    for split in ("validation", "test"):
        p = os.path.join(save_path, f"best_{split}_error.txt")
        if os.path.exists(p):
            txt = open(p).read().strip()
            try:
                best[split] = float(txt.rsplit(":", 1)[1])
            except (IndexError, ValueError):
                # never abort a finished 20k-iteration stage on a parse
                # problem — record the raw text instead (round-4 ADVICE)
                best[split] = {"unparsed": txt[:200]}
    return best


def _append(rec):
    results = []
    if os.path.exists(OUT):
        results = json.load(open(OUT))
    results.append(rec)
    with open(OUT, "w") as f:
        json.dump(results, f, indent=1)


def _train(cfg_path, overrides, tag):
    from wmfml_tpu.cli.train_cli import train
    from wmfml_tpu.configs import Config

    config = Config(cfg_path, overrides=overrides)
    t0 = time.time()
    train(config)
    rec = dict(stage=tag, cfg=cfg_path, overrides=overrides,
               wall_s=round(time.time() - t0, 1), best=_best(config.save_path),
               run_dir=config.save_path)
    _append(rec)
    print(f"[matrix_r4] {tag}: {rec['best']} ({rec['wall_s']}s)", flush=True)
    return config


FAST = ["steps_per_call=64", "compute_dtype=bfloat16",
        "val_freq=1000", "val_iters=10"]


def stage_singletask(state):
    cfg = _train("cfg/train/SingleTask_DA+TA_ShapeNet1D.yaml",
                 ["iterations=20000"] + FAST, "singletask_1d")
    state["singletask_ckpt"] = os.path.join(
        cfg.save_path, "models", "model_best_validation")


def stage_refine(state):
    from wmfml_tpu.cli.refinement_cli import refine
    from wmfml_tpu.configs import Config

    ckpt = state.get("singletask_ckpt")
    if not ckpt or not os.path.exists(ckpt):
        # fall back to the newest SingleTask run on disk
        import glob
        cands = sorted(glob.glob(
            "results/train/SingleTaskShapeNet1D/*/models/model_best_validation"))
        if not cands:
            raise RuntimeError("no SingleTask checkpoint for refinement")
        ckpt = cands[-1]
    config = Config("cfg/refinement/Refine_DA_ShapeNet1D.yaml", overrides=[
        f"checkpoint={ckpt}", "iterations=2000", "val_freq=100",
        "val_iters=10", "max_ctx_num=15"])  # tasks_per_batch=1: ref protocol
    t0 = time.time()
    best_per_ctx = refine(config)
    rec = dict(stage="refinement_1d", checkpoint=ckpt,
               wall_s=round(time.time() - t0, 1),
               loss_vs_ctx=[round(float(x), 4) for x in best_per_ctx],
               run_dir=config.save_path)
    _append(rec)
    print(f"[matrix_r4] refinement: {rec['loss_vs_ctx']}", flush=True)
    state["refine_curve"] = rec["loss_vs_ctx"]


def _eval_curve(method, ckpt, tag, extra=()):
    """evaluation.py protocol: loss vs ctx 1..15 on the synthetic split."""
    from wmfml_tpu.cli.evaluation_cli import evaluate
    from wmfml_tpu.configs import Config

    config = Config("cfg/evaluation/ANP_ShapeNet1D.yaml", overrides=[
        f"method={method}", f"checkpoint={ckpt}", "max_ctx_num=15",
        "val_iters=10", "tasks_per_batch=10", "mode=evaluation",
        *extra])
    t0 = time.time()
    evaluate(config)
    curves = {}
    for split in ("val", "test"):
        p = os.path.join(config.save_path, f"{split}_losses.txt")
        if os.path.exists(p):
            import numpy as np
            arr = np.loadtxt(p)
            curves[split] = [round(float(x), 4) for x in arr[:, 1]]
    rec = dict(stage=tag, checkpoint=ckpt,
               wall_s=round(time.time() - t0, 1), curves=curves,
               run_dir=config.save_path)
    _append(rec)
    print(f"[matrix_r4] {tag}: test curve {curves.get('test')}", flush=True)


def stage_anp(state):
    cfg = _train("cfg/train/ANP_DA+TA_ShapeNet1D.yaml",
                 ["iterations=20000"] + FAST, "anp_1d")
    ckpt = os.path.join(cfg.save_path, "models", "model_best_validation")
    _eval_curve("ANPShapeNet1D", ckpt, "anp_1d_curve")


def stage_cnp(state):
    cfg = _train("cfg/train/CNP_DA+TA_ShapeNet1D.yaml",
                 ["iterations=20000"] + FAST, "cnp_1d")
    ckpt = os.path.join(cfg.save_path, "models", "model_best_validation")
    # no CNP ShapeNet1D eval YAML ships (the reference's evaluation set has
    # none either) — derive the arch keys from the train config instead of
    # hand-patching, so drift in the train YAML can't desync the eval
    _eval_curve("CNPShapeNet1D", ckpt, "cnp_1d_curve",
                extra=[f"agg_mode={cfg.agg_mode}", f"dim_r={cfg.dim_r}"])


def stage_maml_pascal(state):
    _train("cfg/train/MAML_Pascal1D.yaml",
           ["iterations=10000", "steps_per_call=4", "compute_dtype=bfloat16",
            "val_freq=500", "val_iters=10"], "vanillamaml_pascal1d")


def stage_anpmr3d(state):
    _train("cfg/train/ANPMR_ShapeNet3D.yaml",
           ["iterations=20000"] + FAST, "anpmr_3d")


STAGES = dict(singletask=stage_singletask, refine=stage_refine,
              anp=stage_anp, cnp=stage_cnp,
              maml_pascal=stage_maml_pascal, anpmr3d=stage_anpmr3d)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stages", default=",".join(STAGES))
    args = p.parse_args()
    state = {}
    for name in args.stages.split(","):
        print(f"[matrix_r4] === stage {name} ===", flush=True)
        try:
            STAGES[name](state)
        except Exception:
            traceback.print_exc()
            _append(dict(stage=name, error=traceback.format_exc()[-2000:]))
    print("[matrix_r4] done")


if __name__ == "__main__":
    main()
