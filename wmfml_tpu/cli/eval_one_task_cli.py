"""Single-task evaluation CLI (reference eval_one_task.py — which crashes on
a missing import in the shipped tree; implemented as intended here).

Evaluates a trained model on ONE frozen task across ctx counts, to compare
against per-task refinement.
"""

from __future__ import annotations

from wmfml_tpu.cli.common import apply_prng_impl, parse_args, seed_everything
from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.data.refinement import RefinementSampler
from wmfml_tpu.eval.evaluator import ModelEvaluator
from wmfml_tpu.models.registry import build_model


def evaluate(config: Config):
    seed_everything(config.seed)
    apply_prng_impl(config)
    base = build_data(config, mode="eval")
    data = RefinementSampler(base, ctx_num=config.max_ctx_num, seed=42,
                             source="test")
    config.query_num = data.task_qry_x.shape[0]
    model = build_model(config)
    evaluator = ModelEvaluator(model, config, data)
    return evaluator.evaluate_one_task()


def main(argv=None):
    args = parse_args("single-task evaluation")
    config = Config(args.config, overrides=args.overrides)
    if not config.mode or config.mode == "train":
        config.mode = "eval_one_task"
    evaluate(config)


if __name__ == "__main__":
    main()
