"""Evaluation protocol determinism: two sweeps produce identical losses."""

import numpy as np

from tests.test_eval_cli import eval_cfg
from wmfml_tpu.data.factory import build_data
from wmfml_tpu.eval.evaluator import ModelEvaluator
from wmfml_tpu.models.registry import build_model


def test_validate_iter_repeatable(tmp_path, monkeypatch):
    import os

    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    cfg = eval_cfg(tmp_path)
    data = build_data(cfg, mode="eval")
    cfg.query_num = getattr(data, "query_num", cfg.query_num)
    model = build_model(cfg)
    ev = ModelEvaluator(model, cfg, data)
    l1, s1 = ev._validate_iter("test", 2)
    l2, s2 = ev._validate_iter("test", 2)
    assert l1 == l2 and s1 == s2  # rng reseeded to 42 per sweep
    l3, _ = ev._validate_iter("test", 3)
    assert l3 != l1  # different ctx count -> different stream/metric
