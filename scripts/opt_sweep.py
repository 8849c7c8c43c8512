#!/usr/bin/env python
"""Same-window A/B over the two step-level costs the round-4 HBM profile
surfaced (hbm_profile.json, xprof op_profile over the real fused step):

  * optax.flatten machinery — the single biggest op in the ANP headline step
    is the flattened-optimizer retiling reshape (`optax/transforms/
    _layouts.py:56`: f32[488874]{T(1024)} -> f32[244437,2]{T(8,128)}, 17.4%
    of device time at 5 GB/s) plus the grad concatenate. The flatten wrap
    was adopted in round 3 from an interleaved A/B in a degraded window.
  * max-pool backward — flax nn.max_pool's select-and-scatter is 5.4% of
    the step; the slice+maximum form (nn/encoders.py:max_pool_2x2) has an
    elementwise backward but measured SLOWER on this step in round 2.

Variants are compiled once and timed round-robin (median of passes) so
platform weather cancels:

    python scripts/opt_sweep.py [passes] [calls_per_pass]
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
        "base_flatten_window": base_cfg(),
        "noflatten_window": base_cfg(flatten_opt=False),
        "flatten_slicepool": base_cfg(pool_impl="slice"),
        "noflatten_slicepool": base_cfg(flatten_opt=False, pool_impl="slice"),
    }
    steps = {}
    for name, cfg in variants.items():
        step, state, K = build_step(cfg)
        arrays = step._arrays()
        compiled = step._jitted.lower(state, arrays,
                                      jax.random.PRNGKey(0)).compile()
        for i in range(2):
            state, m = compiled(state, arrays, jax.random.PRNGKey(i))
        _ = float(m["loss"])
        steps[name] = dict(compiled=compiled, state=state, arrays=arrays,
                           K=K, times=[], cfg=cfg)
        print(f"[opt_sweep] compiled {name}", flush=True)

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
            s["times"].append(dt / (calls * s["K"]) * 1000)
        print(f"[opt_sweep] pass {p}: " + " ".join(
            f"{n}={s['times'][-1]:.3f}ms" for n, s in steps.items()),
            flush=True)

    out = {}
    for name, s in steps.items():
        med = statistics.median(s["times"])
        out[name] = {
            "ms_per_step": round(med, 3),
            "tasks_per_sec": round(s["cfg"].tasks_per_batch / med * 1000, 1),
            "all_passes_ms": [round(t, 3) for t in s["times"]],
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
