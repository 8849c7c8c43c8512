#!/usr/bin/env python
"""Generate the synthetic ShapeNet3D split (default: the healthy 240/40/40).

240/40/40 is the generator default everywhere (wmfml_tpu/data/synthetic.py)
since the 30-item split meta-overfits (train 0.14 vs val 0.63 quat L1 —
RESULTS.md round 3). Pass --small for the 30/8/8 loader/byte-compat smoke
split.

    python scripts/gen_shapenet3d.py [root] [--small]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wmfml_tpu.data.synthetic import generate_shapenet3d  # noqa: E402

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--small"]
    small = "--small" in sys.argv[1:]
    root = args[0] if args else "data_synth/ShapeNet3D_azi180ele30"
    t0 = time.time()
    generate_shapenet3d(root, seed=1, small=small)
    with open(os.path.join(root, ".complete"), "w") as f:
        f.write("ok")
    sizes = "30/8/8" if small else "240/40/40"
    print(f"{root}: {sizes} items x 30 views in {time.time() - t0:.1f}s")
