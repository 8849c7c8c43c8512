"""Refinement CLI (reference refinement.py — shipped broken; see
wmfml_tpu.data.refinement).

For each ctx count 1..max_ctx_num: freeze one task, fine-tune a pre-trained
SingleTask model on its context points, track best test loss; writes
``loss_vs_ctx.txt`` so evaluation plots can overlay the refinement baseline.
"""

from __future__ import annotations

import numpy as np

from wmfml_tpu.cli.common import apply_prng_impl, parse_args, seed_everything
from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.data.refinement import RefinementSampler
from wmfml_tpu.eval.evaluator import ModelEvaluator
from wmfml_tpu.models.registry import build_model


def refine(config: Config):
    seed_everything(config.seed)
    apply_prng_impl(config)
    base = build_data(config, mode="eval")
    model = build_model(config)
    best_per_ctx = []
    for ctx_num in range(1, config.max_ctx_num + 1):
        data = RefinementSampler(base, ctx_num=ctx_num, seed=42, source="test")
        config.query_num = data.task_qry_x.shape[0]
        evaluator = ModelEvaluator(model, config, data)
        best, step = evaluator.refine()
        config.logger.info(
            f"ctx_num={ctx_num}: best test loss {best:.4f} at iter {step}")
        best_per_ctx.append(best)
    np.savetxt(f"{config.save_path}/loss_vs_ctx.txt",
               np.asarray(best_per_ctx), fmt="%1.4f")
    return best_per_ctx


def main(argv=None):
    args = parse_args("single-task refinement")
    config = Config(args.config, overrides=args.overrides)
    if not config.mode or config.mode == "train":
        config.mode = "refinement"
    refine(config)


if __name__ == "__main__":
    main()
