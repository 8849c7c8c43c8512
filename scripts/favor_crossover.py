#!/usr/bin/env python
"""FAVOR+ implementation shoot-out: XLA einsum form vs fused Pallas kernel.

Round-2 VERDICT #6: find the (N_ctx, dim, batch) crossover where the fused
kernel starts winning, auto-enable it there — or cut it with the write-up.

Measures BOTH forward-only and fwd+bwd (training is the hot path) over a
grid spanning production sizes (B = tasks*heads = 80, N = 15..30, d = 256)
up to long-context regimes the reference's Performer exists for.

Timing fetches a result scalar — on this platform block_until_ready returns
before remote execution completes (RESULTS.md "Measurement integrity").

Usage: python scripts/favor_crossover.py [--quick]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    _ = float(jnp.sum(out))  # warmup + compile, fetch-synced
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--json-out", default=None)
    args = p.parse_args()

    from wmfml_tpu.nn.attention import (favor_attention,
                                        gaussian_orthogonal_random_matrix)
    from wmfml_tpu.ops.favor_pallas import favor_attention_pallas

    key = jax.random.PRNGKey(0)

    grid = [
        # (B, Nq, Nk, d)  — B = tasks*heads
        (80, 15, 15, 256),    # production ANP ShapeNet1D/3D
        (80, 30, 30, 256),    # max_ctx 30 eval sweep
        (80, 128, 128, 256),
        (80, 512, 512, 256),
        (16, 1024, 1024, 256),
        (16, 4096, 4096, 256),
        (80, 128, 128, 64),
        (16, 2048, 2048, 64),
    ]
    if args.quick:
        grid = grid[:3]

    rows = []
    for (b, nq, nk, d) in grid:
        import math

        m = int(d * math.log(d))
        kq, kk, kv, kp = jax.random.split(jax.random.fold_in(key, b * nq), 4)
        q = jax.random.normal(kq, (b, nq, d), jnp.float32)
        k = jax.random.normal(kk, (b, nk, d), jnp.float32)
        v = jax.random.normal(kv, (b, nk, d), jnp.float32)
        proj = gaussian_orthogonal_random_matrix(kp, m, d)
        mask = jnp.ones((b, nk), bool)

        xla_fwd = jax.jit(lambda q, k, v: favor_attention(q, k, v, proj, None))
        pal_fwd = jax.jit(
            lambda q, k, v: favor_attention_pallas(q, k, v, proj, mask))

        def loss_xla(q, k, v):
            return jnp.sum(favor_attention(q, k, v, proj, None) ** 2)

        def loss_pal(q, k, v):
            return jnp.sum(favor_attention_pallas(q, k, v, proj, mask) ** 2)

        xla_bwd = jax.jit(jax.grad(loss_xla, argnums=(0, 1, 2)))
        pal_bwd = jax.jit(jax.grad(loss_pal, argnums=(0, 1, 2)))

        row = {"B": b, "Nq": nq, "Nk": nk, "d": d, "m": m}
        try:
            row["xla_fwd_ms"] = round(time_fn(xla_fwd, q, k, v), 3)
            row["pallas_fwd_ms"] = round(time_fn(pal_fwd, q, k, v), 3)
            row["xla_bwd_ms"] = round(
                time_fn(lambda *a: xla_bwd(*a)[0], q, k, v), 3)
            row["pallas_bwd_ms"] = round(
                time_fn(lambda *a: pal_bwd(*a)[0], q, k, v), 3)
            row["pallas_wins_fwd"] = row["pallas_fwd_ms"] < row["xla_fwd_ms"]
            row["pallas_wins_bwd"] = row["pallas_bwd_ms"] < row["xla_bwd_ms"]
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"[:300]
        rows.append(row)
        print(json.dumps(row), flush=True)

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
