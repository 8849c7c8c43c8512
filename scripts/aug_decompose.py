#!/usr/bin/env python
"""Decompose the exact-aug tax: which stage costs the 1.3 ms/step?

Times build_augmenter variants ALONE (jit, R chained applications per call,
fetch-synced, interleaved round-robin) on the headline batch shape
[300, 128, 128, 1] so the warp/dropout/switch contributions separate:

  exact_enum    current exact path (6 fused permutation branches, composed warps)
  exact_chain   old exact path (per-step batch-wide lax.switch chain)
  exact_fixed   exact ops, fixed order, no switch (2 warps + sampled dropout)
  geo_exactdrop fused single-warp geometry + EXACT sampled-size dropout
  perf          fused geometry + fixed-grid dropout (the perf pipeline)

    python scripts/aug_decompose.py [passes] [reps_per_jit]
"""

import json
import statistics
import sys
import time

sys.path.insert(0, ".")


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import jax
    import jax.numpy as jnp

    from wmfml_tpu.aug import image_aug as ia

    task = "shapenet_1d"
    exact_ops = list(ia.PIPELINES[task])
    perf_ops = list(ia.FUSED_PIPELINES[task])

    variants = {}
    variants["exact_enum"] = ia.build_augmenter(task, random_order=True)
    # old path: force the per-step switch chain by passing ops beyond the
    # enumeration budget check via a temporary cutoff
    old = ia._ENUM_MAX
    ia._ENUM_MAX = 0
    variants["exact_chain"] = ia.build_augmenter(task, random_order=True)
    ia._ENUM_MAX = old
    variants["exact_fixed"] = ia.build_augmenter(
        task, random_order=False, ops=exact_ops)
    variants["geo_exactdrop"] = ia.build_augmenter(
        task, random_order=False, ops=[ia.geometric, ia._DROP])
    variants["perf"] = ia.build_augmenter(
        task, random_order=False, ops=perf_ops)

    imgs = (jax.random.uniform(jax.random.PRNGKey(0), (300, 128, 128, 1),
                               jnp.bfloat16))

    def chained(aug):
        def run(key, x):
            def body(c, i):
                k, x = c
                k, sub = jax.random.split(k)
                return (k, aug(sub, x)), ()
            (key, x), _ = jax.lax.scan(body, (key, x), jnp.arange(reps))
            return x
        return jax.jit(run)

    jitted = {}
    for name, aug in variants.items():
        f = chained(aug)
        y = f(jax.random.PRNGKey(1), imgs)
        _ = float(jnp.float32(y).sum())  # warmup + honest sync
        jitted[name] = dict(f=f, times=[])
        print(f"[aug_decompose] compiled {name}", flush=True)

    for p in range(passes):
        for name, s in jitted.items():
            t0 = time.perf_counter()
            y = s["f"](jax.random.PRNGKey(100 + p), imgs)
            _ = float(jnp.float32(y).sum())
            s["times"].append((time.perf_counter() - t0) / reps * 1000)
        print(f"[aug_decompose] pass {p}: " + " ".join(
            f"{n}={s['times'][-1]:.3f}ms" for n, s in jitted.items()),
            flush=True)

    out = {n: round(statistics.median(s["times"]), 3)
           for n, s in jitted.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
