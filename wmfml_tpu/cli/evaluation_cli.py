"""Statistical evaluation CLI (reference evaluation.py).

Loss vs context count over ctx in 1..max_ctx_num, val_iters deterministic
batches per point; writes {val,test}_losses.txt + loss_vs_ctx_num.png.
"""

from __future__ import annotations

from wmfml_tpu.cli.common import apply_prng_impl, parse_args, seed_everything
from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.eval.evaluator import ModelEvaluator
from wmfml_tpu.models.registry import build_model


def evaluate(config: Config):
    seed_everything(config.seed)
    apply_prng_impl(config)
    data = build_data(config, mode="eval")
    # eval mode uses all views as queries where the dataset defines it
    config.query_num = getattr(data, "query_num", config.query_num)
    model = build_model(config)
    evaluator = ModelEvaluator(model, config, data)
    return evaluator.evaluate()


def main(argv=None):
    args = parse_args("statistical evaluation")
    config = Config(args.config, overrides=args.overrides)
    if not config.mode or config.mode == "train":
        config.mode = "evaluation"
    evaluate(config)


if __name__ == "__main__":
    main()
