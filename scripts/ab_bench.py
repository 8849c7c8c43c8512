#!/usr/bin/env python
"""Window-robust A/B benchmark: interleaved round-robin over variants.

The axon platform has degraded-EXECUTION windows (same compiled program:
2.3 ms vs 63 ms hours apart), so numbers from different runs are not
comparable. This harness AOT-compiles every variant up front, then times
them round-robin — each pass samples all variants inside the same weather —
and reports per-variant medians and the per-pass ratios.

Usage:
  python scripts/ab_bench.py                # default variant set
  python scripts/ab_bench.py --passes 7
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--calls", type=int, default=6)
    ap.add_argument("--variants-json", default=None,
                    help='override variant set, e.g. \'{"k16": {"steps_per_call": 16}}\'')
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import jax

    import bench

    variants = {
        "exact_default": dict(),
        "fused_order": dict(aug_random_order=False),
        "no_data_aug": dict(aug_list=["task_aug"]),
        "t40_fused": dict(aug_random_order=False, tasks_per_batch=40,
                          steps_per_call=16),
    }
    if args.variants_json:
        variants = json.loads(args.variants_json)

    compiled = {}
    key = jax.random.PRNGKey(7)
    for name, kw in variants.items():
        cfg = bench.base_cfg(**kw)
        step, state, K = bench.build_step(cfg)
        arrays = step._arrays()
        c = step._jitted.lower(state, arrays, key).compile()
        st, m = c(state, arrays, key)       # warmup
        _ = float(m["loss"])
        compiled[name] = (c, st, arrays, K, cfg.tasks_per_batch)
        print(f"compiled {name}", flush=True)

    samples = {n: [] for n in variants}
    for p in range(args.passes):
        for name, (c, st, arrays, K, tpb) in compiled.items():
            t0 = time.perf_counter()
            for i in range(args.calls):
                st, m = c(st, arrays, jax.random.fold_in(key, 1000 * p + i))
            _ = float(m["loss"])
            dt = time.perf_counter() - t0
            ms_step = 1000 * dt / (args.calls * K)
            samples[name].append(ms_step)
            compiled[name] = (c, st, arrays, K, tpb)
        print(f"pass {p}: " + "  ".join(
            f"{n}={samples[n][-1]:.2f}ms" for n in variants), flush=True)

    out = {}
    for name, (c, st, arrays, K, tpb) in compiled.items():
        med = sorted(samples[name])[len(samples[name]) // 2]
        out[name] = {"ms_per_step_median": round(med, 3),
                     "tasks_per_sec": round(tpb / med * 1000, 1),
                     "samples": [round(s, 2) for s in samples[name]]}
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
