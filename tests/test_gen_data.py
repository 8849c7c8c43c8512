"""ShapeNet3D one-off dataset builder (dataset/shapenet_3d.py:269-283)."""

import os
import pickle

from wmfml_tpu.configs import Config
from wmfml_tpu.data.factory import build_data


def test_generate_and_save_data_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(os.path.join(os.path.dirname(__file__), ".."))
    cfg = Config.from_dict(dict(
        method="CondNeuralProcess", task="shapenet_3d", agg_mode="mean",
        img_agg="reshape", tasks_per_batch=2, max_ctx_num=3, query_num=4,
        lr=1e-3, seed=0, synthetic_data=True), make_dirs=False)
    data = build_data(cfg, mode="train")
    out = str(tmp_path / "built")
    data.generate_and_save_data(out)
    for name in ("train", "val", "test"):
        with open(os.path.join(out,
                               f"shapenet3d_azi180ele30_{name}.pkl"),
                  "rb") as f:
            p = pickle.load(f)
        assert sorted(p) == ["Q", "images", "item_indices"]
        assert (p["images"].shape[0] == p["item_indices"].shape[0]
                == p["Q"].shape[0])
        assert p["images"].shape[1:] == (64, 64, 4)
    # the dumped layout reloads through our own loader
    from wmfml_tpu.data.shapenet_3d import ShapeNet3DData

    reload_root = str(tmp_path / "built")
    import numpy as np
    import shutil

    shutil.copy(os.path.join("data_synth", "ShapeNet3D_azi180ele30",
                             "bg_images.npy")
                if os.path.exists(os.path.join(
                    "data_synth", "ShapeNet3D_azi180ele30", "bg_images.npy"))
                else os.path.join("data_synth", "bg_images.npy"),
                os.path.join(reload_root, "bg_images.npy"))
    d2 = ShapeNet3DData(reload_root, cfg.img_size, seed=0, max_ctx=3,
                        query_num=4)
    b = d2.get_batch("train", 2, 3)
    assert np.isfinite(b["qry_y"]).all()
