#!/usr/bin/env python
"""Megakernel attempt #2 (round-2 VERDICT #3): Mosaic-compatible conv block.

The round-2 fused-encoder kernel died on Mosaic layout limits (>2-D strided
slices, scatter, 6-D reshapes). This formulation keeps EVERY tensor 2-D:

  * images live as [N*H*W, C] (rows = flattened pixels, lanes = channels);
  * a 3x3 same-pad conv = 9x { pltpu.roll along rows + static validity mask
    from broadcasted_iota + [P, Cin] @ [Cin, Cout] MXU matmul };
  * batch-norm = column reductions; relu = elementwise — all VPU.

Decision experiment: time the per-task-weights 4-layer features block of
MAMLRegressor (models/maml.py:100-114; T tasks, N images, 14x14, 64ch)
forward — Pallas megakernel vs XLA's native vmapped convs. The megakernel
path only makes sense if this FORWARD wins big: the full inner-step-in-VMEM
vision additionally needs hand-written backward + differentiable
VJP-of-VJP kernels (second-order MAML), each of which must be at least as
efficient. If forward cannot beat XLA here, the item closes as a measured
negative result.

Usage:
  python scripts/proto_maml_pallas_conv.py --interpret   # CPU parity check
  python scripts/proto_maml_pallas_conv.py               # TPU timing
"""

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

TAPS = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]


def features_block_kernel(x_ref, w_ref, g_ref, out_ref, *, n, h, w, c,
                          layers):
    """One task's 4-layer conv+BN+relu block, fully VMEM-resident.

    x_ref   [1, P, c]        P = n*h*w, input already at c lanes (layer-0
                             1->c lift is done outside: it is 0.4% of FLOPs)
    w_ref   [1, layers*9*c, c]   per-task stacked tap weights
    g_ref   [1, 2*layers, c]     BN scale/bias per layer
    out_ref [1, P, c]
    """
    p = n * h * w
    x = x_ref[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    py = (pos // w) % h
    px = pos % w

    for layer in range(layers):
        acc = jnp.zeros_like(x, dtype=jnp.float32)
        for t, (dy, dx) in enumerate(TAPS):
            shift = dy * w + dx
            xs = pltpu_roll(x, -shift)
            valid = ((py + dy >= 0) & (py + dy < h)
                     & (px + dx >= 0) & (px + dx < w))
            xs = jnp.where(valid, xs, 0.0)
            wt = w_ref[0, (layer * 9 + t) * c:(layer * 9 + t + 1) * c, :]
            acc = acc + jnp.dot(xs, wt, preferred_element_type=jnp.float32)
        # batch statistics over all P rows (full-mask case)
        mean = jnp.mean(acc, axis=0, keepdims=True)
        var = jnp.maximum(
            jnp.mean(acc * acc, axis=0, keepdims=True) - mean * mean, 0.0)
        scale = g_ref[0, 2 * layer:2 * layer + 1, :]
        bias = g_ref[0, 2 * layer + 1:2 * layer + 2, :]
        x = jnp.maximum(
            (acc - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias,
            0.0).astype(x.dtype)
    out_ref[0] = x


def pltpu_roll(arr, shift):
    """Static circular shift along rows.

    Two strategies (PROTO_ROLL env): "concat" = static slices + concat
    (any dtype); "rotate" = tpu.dynamic_rotate (32-bit only — Mosaic
    rejects bf16 with "Rotate with non-32-bit data")."""
    import os

    p = arr.shape[0]
    # semantics of pltpu.roll(shift=k): result[i] = arr[(i - k) % P];
    # concat([arr[s:], arr[:s]]) gives result[i] = arr[(i + s) % P]
    s = (-shift) % p
    if s == 0:
        return arr
    if os.environ.get("PROTO_ROLL", "concat") == "rotate":
        from jax.experimental.pallas import tpu as pltpu

        return pltpu.roll(arr, shift=shift % p, axis=0)
    return jnp.concatenate([arr[s:], arr[:s]], axis=0)


def features_block_pallas(x, weights, gammas, *, n, h, w, c, layers=3,
                          interpret=False):
    """x [T, P, c]; weights [T, layers*9*c, c]; gammas [T, 2*layers, c]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t_num, p, _ = x.shape
    kernel = functools.partial(features_block_kernel, n=n, h=h, w=w, c=c,
                               layers=layers)
    del pltpu  # per-block windowing stages blocks into VMEM automatically;
    # an explicit memory_space=VMEM would force WHOLE operands resident
    # (measured: 24.95M > 16M scoped-vmem limit at T=10)
    return pl.pallas_call(
        kernel,
        grid=(t_num,),
        in_specs=[
            pl.BlockSpec((1, p, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, layers * 9 * c, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 2 * layers, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, p, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((t_num, p, c), x.dtype),
        interpret=interpret,
    )(x, weights, gammas)


def features_block_xla(x, weights, gammas, *, n, h, w, c, layers=3):
    """Reference forward: per-task conv3x3 s1 + BN + relu, XLA native.

    x [T, N, H, W, C]; weights [T, layers, 3, 3, C, C]; gammas
    [T, 2*layers, C]."""

    def one_task(xt, wt, gt):
        ht = xt
        for layer in range(layers):
            ht = jax.lax.conv_general_dilated(
                ht, wt[layer], window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            mean = jnp.mean(ht, axis=(0, 1, 2))
            var = jnp.maximum(
                jnp.mean(ht * ht, axis=(0, 1, 2)) - mean * mean, 0.0)
            ht = ((ht - mean) * jax.lax.rsqrt(var + 1e-5)
                  * gt[2 * layer] + gt[2 * layer + 1])
            ht = jnp.maximum(ht, 0.0)
        return ht

    return jax.vmap(one_task)(x, weights, gammas)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--tasks", type=int, default=10)
    ap.add_argument("--n", type=int, default=15)
    ap.add_argument("--layers", type=int, default=3)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default=None,
                    help="bfloat16 on TPU by default (this backend stages "
                         "whole pallas operands in VMEM; f32 at T=10 "
                         "overflows the 16M scoped limit)")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    t_num, n, h, w, c = args.tasks, args.n, 14, 14, 64
    layers = args.layers
    dtype = jnp.dtype(args.dtype) if args.dtype else (
        jnp.float32 if args.interpret else jnp.bfloat16)
    rng = np.random.RandomState(0)
    x5 = jnp.asarray(rng.rand(t_num, n, h, w, c), dtype) - 0.5
    wts5 = jnp.asarray(
        rng.rand(t_num, layers, 3, 3, c, c), dtype) * 0.05 - 0.025
    gam = jnp.asarray(rng.rand(t_num, 2 * layers, c), dtype)

    # 2-D layout for the kernel: [T, P, C] and tap-stacked weights
    x2 = x5.reshape(t_num, n * h * w, c)
    # weights [T, L, 3, 3, Cin, Cout] -> [T, L*9*Cin, Cout], tap-major
    w2 = wts5.reshape(t_num, layers, 9, c, c).reshape(
        t_num, layers * 9 * c, c)

    pallas_fn = jax.jit(functools.partial(
        features_block_pallas, n=n, h=h, w=w, c=c, layers=layers,
        interpret=args.interpret))
    xla_fn = jax.jit(functools.partial(
        features_block_xla, n=n, h=h, w=w, c=c, layers=layers))

    want = xla_fn(x5, wts5, gam).astype(jnp.float32)
    got = pallas_fn(x2, w2, gam).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(got.reshape(want.shape) - want)))
    rel = err / float(jnp.max(jnp.abs(want)))
    print(f"parity: max abs err {err:.3e} (rel {rel:.3e})")
    assert rel < (1e-3 if dtype == jnp.float32 else 3e-2), \
        "kernel does not match XLA forward"

    if args.interpret:
        print("interpret-mode parity OK; run on TPU for timing")
        return

    def timed(fn, *a):
        out = fn(*a)
        _ = float(jnp.sum(out))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        _ = float(jnp.sum(out))
        return (time.perf_counter() - t0) / args.iters * 1000

    ms_x = timed(xla_fn, x5, wts5, gam)
    ms_p = timed(pallas_fn, x2, w2, gam)
    flops = t_num * layers * n * h * w * c * c * 9 * 2
    print(f"XLA    forward: {ms_x:.3f} ms  "
          f"({flops / ms_x / 1e9:.1f} TFLOP/s)")
    print(f"Pallas forward: {ms_p:.3f} ms  "
          f"({flops / ms_p / 1e9:.1f} TFLOP/s)")
    print(f"speedup: {ms_x / ms_p:.2f}x")


if __name__ == "__main__":
    main()
