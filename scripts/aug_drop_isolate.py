#!/usr/bin/env python
"""Isolate the sampled-size CoarseDropout cost (follow-up to aug_decompose).

Times geometric + <one drop variant> on [300,128,128,1] bf16, interleaved.

    python scripts/aug_drop_isolate.py [passes] [reps]
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

    def no_op(key, img):
        return img

    variants = {
        "none": [ia.geometric],
        "fine_dropout": [ia.geometric, ia.sometimes(ia.dropout)],
        "coarse_exact": [ia.geometric, ia.sometimes(ia.coarse_dropout)],
        "coarse_fixed": [ia.geometric, ia.sometimes(ia.coarse_dropout_fixed)],
        "oneof_exact": [ia.geometric, ia._DROP],
        "oneof_fixed": [ia.geometric, ia._DROP_FIXED],
    }

    imgs = jax.random.uniform(jax.random.PRNGKey(0), (300, 128, 128, 1),
                              jnp.bfloat16)

    def chained(ops):
        aug = ia.build_augmenter("shapenet_1d", random_order=False, ops=ops)

        def run(key, x):
            def body(c, i):
                k, x = c
                k, sub = jax.random.split(k)
                return (k, aug(sub, x)), ()
            (key, x), _ = jax.lax.scan(body, (key, x), jnp.arange(reps))
            return x
        return jax.jit(run)

    jitted = {}
    for name, ops in variants.items():
        f = chained(ops)
        y = f(jax.random.PRNGKey(1), imgs)
        _ = float(jnp.float32(y).sum())
        jitted[name] = dict(f=f, times=[])
        print(f"[isolate] compiled {name}", flush=True)

    for p in range(passes):
        for name, s in jitted.items():
            t0 = time.perf_counter()
            y = s["f"](jax.random.PRNGKey(100 + p), imgs)
            _ = float(jnp.float32(y).sum())
            s["times"].append((time.perf_counter() - t0) / reps * 1000)
        print(f"[isolate] pass {p}: " + " ".join(
            f"{n}={s['times'][-1]:.3f}" for n, s in jitted.items()),
            flush=True)

    print(json.dumps({n: round(statistics.median(s["times"]), 3)
                      for n, s in jitted.items()}))


if __name__ == "__main__":
    main()
