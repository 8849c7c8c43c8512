#!/usr/bin/env python
"""Headline-throughput harvest (round-2 VERDICT #2).

Sweeps the measured-headroom knobs on the flagship ANP ShapeNet1D DA+TA
workload, reusing bench.py's AOT-compiled fetch-synced harness:
  * steps_per_call 16 / 32 / 64 (dispatch amortization)
  * rbg PRNG (faster counter-based key derivation for aug/dropout masks)
  * fused vs exact-random-order augmentation pipeline
  * reference batch T=10 vs chip-saturating T=40 (RESULTS.md scaling data)

Usage: python scripts/headline_sweep.py [--rbg] [--quick]
(rbg must be chosen at process start — run once with and once without.)
"""

import argparse
import json
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rbg", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--calls", type=int, default=20)
    args = ap.parse_args()

    if args.rbg:
        import jax

        jax.config.update("jax_default_prng_impl", "rbg")

    sys.path.insert(0, ".")
    import bench

    cases = {
        "t10_k16_fused": dict(steps_per_call=16, aug_random_order=False),
        "t10_k32_fused": dict(steps_per_call=32, aug_random_order=False),
        "t10_k64_fused": dict(steps_per_call=64, aug_random_order=False),
        "t10_k32_exact_order": dict(steps_per_call=32,
                                    aug_random_order=True),
        "t40_k16_fused": dict(steps_per_call=16, aug_random_order=False,
                              tasks_per_batch=40),
        "t40_k32_fused": dict(steps_per_call=32, aug_random_order=False,
                              tasks_per_batch=40),
    }
    if args.quick:
        cases = {k: v for k, v in list(cases.items())[:2]}

    tag = "rbg" if args.rbg else "threefry"
    for name, kw in cases.items():
        cfg = bench.base_cfg(**kw)
        try:
            row = bench.run_workload(name, cfg, calls=args.calls)
        except Exception as e:
            row = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"case": f"{name}_{tag}", **row}), flush=True)


if __name__ == "__main__":
    main()
