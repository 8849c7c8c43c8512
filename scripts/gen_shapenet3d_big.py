#!/usr/bin/env python
"""Generate the 240-item synthetic ShapeNet3D split (learning-evidence aid).

The default synthetic split (data_synth/, 30 train items) is sized to mirror
the reference's small pickles for loader/byte-compat tests — but 30 items
meta-overfit (train 0.14 vs val 0.63 quat L1): novel-shape pose needs more
item diversity to be learnable. This 240/40/40 split is the one behind the
below-floor ANP-3D result in RESULTS.md ("dataset-size effect, not a model
defect"). Train against it with:

    python train.py --config cfg/train/ANP_DA+TA_ShapeNet3D.yaml \
        data_path=data_synth_big/shapenet_3d iterations=20000 val_freq=2000
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wmfml_tpu.data.synthetic import generate_shapenet3d  # noqa: E402

if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "data_synth_big/shapenet_3d"
    t0 = time.time()
    generate_shapenet3d(root, seed=1, items_train=240, items_val=40,
                        items_test=40, views=30)
    with open(os.path.join(root, ".complete"), "w") as f:
        f.write("ok")
    print(f"{root}: 240/40/40 items x 30 views in {time.time() - t0:.1f}s")
