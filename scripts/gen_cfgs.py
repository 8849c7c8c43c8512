#!/usr/bin/env python
"""Regenerate cfg/ from the reference YAML schema (hyperparameters are data,
not code: this re-dumps the key/value pairs in canonical yaml form).

Run: python scripts/gen_cfgs.py [/path/to/reference]
"""

import os
import sys

import yaml

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(__file__), "..", "cfg")


def convert(src, dst):
    with open(src, "rb") as f:
        cfg = yaml.safe_load(f)
    # drop the torch device string; placement is owned by the mesh
    cfg["device"] = "tpu"
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    with open(dst, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=True, default_flow_style=False)


def main():
    n = 0
    for root, _, files in os.walk(os.path.join(REF, "cfg")):
        for name in files:
            if not name.endswith(".yaml"):
                continue
            src = os.path.join(root, name)
            rel = os.path.relpath(src, os.path.join(REF, "cfg"))
            convert(src, os.path.join(OUT, rel))
            n += 1
    print(f"wrote {n} config files to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
