#!/usr/bin/env python
"""Qualitative evaluation entry point (reference evaluate_and_plot_distractor.py)."""
from wmfml_tpu.cli.common import parse_args
from wmfml_tpu.configs import Config
from wmfml_tpu.eval.plotting import evaluate_and_plot

if __name__ == "__main__":
    args = parse_args("evaluate and plot (distractor)")
    config = Config(args.config, overrides=args.overrides)
    if not config.mode or config.mode == "train":
        config.mode = "eval_and_plot"
    evaluate_and_plot(config, ctx_num=min(15, config.max_ctx_num))
