"""Dataset factory: config -> episodic sampler (reference train.py:60-88).

Data root resolution: ``config.data_path`` if set, else ``./data/<subdir>``
(the reference layout), else a procedurally generated synthetic dataset under
``./data_synth/<subdir>`` (the real assets are git-LFS pointers; see
wmfml_tpu.data.synthetic). ``config.synthetic_data: true`` forces synthetic.
"""

from __future__ import annotations

import os

from wmfml_tpu.data.pascal_1d import Pascal1D
from wmfml_tpu.data.shapenet_1d import ShapeNet1D
from wmfml_tpu.data.shapenet_3d import ShapeNet3DData
from wmfml_tpu.data.shapenet_distractor import ShapeNetDistractor
from wmfml_tpu.data.synthetic import ensure_dataset

REFERENCE_SUBDIRS = {
    "shapenet_1d": "ShapeNet1D",
    "shapenet_3d": "ShapeNet3D_azi180ele30",
    "distractor": "distractor",
    "pascal_1d": "Pascal1D",
}

_PROBE_FILES = {
    "shapenet_1d": "val_data.pkl",
    "shapenet_3d": "shapenet3d_azi180ele30_train.pkl",
    "distractor": "04530566_multi.npy",
    "pascal_1d": "train_data_ins.pkl",
}


def resolve_data_path(config) -> str:
    task = config.task
    if config.data_path:
        return config.data_path
    real = os.path.join("data", REFERENCE_SUBDIRS[task])
    if not config.synthetic_data and os.path.exists(
            os.path.join(real, _PROBE_FILES[task])):
        return real
    config.logger.info(
        f"real {task} data not found under {real}; using synthetic dataset")
    return ensure_dataset(task, "data_synth")


def build_data(config, mode: str = "train", test_categ=None):
    """Instantiate the sampler for config.task (reference train.py:60-88).

    ``test_categ``: distractor-only — restrict the test split to the given
    categories (the reference plot script evaluates only '04530566',
    evaluate_and_plot_distractor.py:44)."""
    path = resolve_data_path(config)
    task = config.task
    common = dict(img_size=config.img_size, seed=42,
                  aug=config.aug_list, max_ctx=config.max_ctx_num)
    if task == "shapenet_1d":
        return ShapeNet1D(path, data_size=config.data_size,
                          query_num=config.query_num, **common)
    if task == "shapenet_3d":
        return ShapeNet3DData(path, num_instances_per_item=30, mode=mode,
                              query_num=config.query_num, **common)
    if task == "distractor":
        return ShapeNetDistractor(
            path, num_instances_per_item=36, mode=mode,
            load_test_categ_only=(mode == "eval"),
            test_categ=test_categ,
            query_num=config.query_num, **common)
    if task == "pascal_1d":
        return Pascal1D(path, query_num=config.query_num, **common)
    raise NameError(f"task {task!r} is not implemented in this experiments!")
