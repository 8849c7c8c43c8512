#!/usr/bin/env python
"""Same-window A/B: exact random-order augmentation vs fused perf pipeline.

VERDICT round-3 #4 asks for the exact-aug tax after composing adjacent
CropAndPad+Affine draws: run the two ANP-1D DA+TA headline variants
interleaved (round-robin timed passes in ONE process, median-of-passes) so
platform weather cancels. Prints one JSON line.

    python scripts/aug_ab.py [passes] [calls_per_pass]
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    calls = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    import jax

    from bench import base_cfg, build_step

    variants = {
        "exact_random_order": base_cfg(aug_random_order=True),
        "fused_fixed_order": base_cfg(aug_random_order=False),
    }
    steps = {}
    for name, cfg in variants.items():
        step, state, K = build_step(cfg)
        arrays = step._arrays()
        compiled = step._jitted.lower(state, arrays,
                                      jax.random.PRNGKey(0)).compile()
        # warmup with fetch sync
        for i in range(2):
            state, m = compiled(state, arrays, jax.random.PRNGKey(i))
        _ = float(m["loss"])
        steps[name] = dict(compiled=compiled, state=state, arrays=arrays,
                           K=K, times=[], cfg=cfg)
        print(f"[aug_ab] compiled {name}", flush=True)

    key = jax.random.PRNGKey(7)
    for p in range(passes):
        for name, s in steps.items():
            t0 = time.perf_counter()
            st = s["state"]
            for i in range(calls):
                st, m = s["compiled"](st, s["arrays"],
                                      jax.random.fold_in(key, p * 100 + i))
            _ = float(m["loss"])  # honest sync (RESULTS.md)
            s["state"] = st
            dt = time.perf_counter() - t0
            s["times"].append(dt / (calls * s["K"]) * 1000)  # ms/step
        print(f"[aug_ab] pass {p}: " + " ".join(
            f"{n}={s['times'][-1]:.3f}ms" for n, s in steps.items()),
            flush=True)

    out = {}
    for name, s in steps.items():
        med = statistics.median(s["times"])
        out[name] = {
            "ms_per_step": round(med, 3),
            "tasks_per_sec": round(
                s["cfg"].tasks_per_batch / med * 1000, 1),
            "all_passes_ms": [round(t, 3) for t in s["times"]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
