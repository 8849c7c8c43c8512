"""Fused Pallas TPU kernel for the literature conv encoder — NEGATIVE RESULT.

Committed once for the record, removed in the next commit (see RESULTS.md
"Pallas fused-encoder attempt"). One kernel computes the whole encoder
(networks/CNPShapeNet1D.py:46-56: conv3x3 s2 (1->32) / relu / conv3x3 s2
(32->48) / relu / maxpool2 / conv3x3 s2 (48->64) / relu / flatten / linear)
for a block of images per grid step, keeping every intermediate in VMEM.
Convs are shift-and-matmul: out = sum_{dy,dx} shift(x) @ W[dy,dx].

Status: parity-tested in interpreter mode (rel err 3e-3 vs the XLA chain at
bf16) but NOT compilable by Mosaic on v5e in this environment:
  * >2-D strided slices are unsupported ("Only 2D gather is supported");
  * `.at[].set` interior padding lowers to scatter (unimplemented) —
    worked around with concatenation;
  * the 6-D phase-decomposition reshape that replaces the strided slices
    crashes the remote Mosaic compiler (HTTP 500, no diagnostics).
Measured context: XLA's native conv chain does 320 images in 0.71 ms fwd
(~3x off speed-of-light), and a pure-XLA tap-matmul reformulation of the
same structure is 4.8x slower — the fusion upside did not justify fighting
the compiler.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# encoder channel plan (fixed by the reference architecture)
C0, C1, C2 = 32, 48, 64


def _tap_fn(xp, out_hw):
    """Stride-2 3x3 taps via phase decomposition (Mosaic supports only 2-D
    strided gathers, so stride-2 slicing is rewritten as reshape + size-1
    select + contiguous slice): xp [B, 2*out_hw+2, 2*out_hw+2, C]."""
    b, hp2, _, c = xp.shape
    hp = hp2 // 2                        # out_hw + 1
    xr = xp.reshape(b, hp, 2, hp, 2, c)

    def tap(dy, dx):
        return xr[:, dy // 2:dy // 2 + out_hw, dy % 2,
                  dx // 2:dx // 2 + out_hw, dx % 2, :]

    return tap


def _pad1(x):
    """Zero-pad H and W by 1 via concatenation (Mosaic lowers .at[].set of
    interior regions to scatter, which is unimplemented on TPU)."""
    b, h, w, c = x.shape
    zr = jnp.zeros((b, 1, w, c), x.dtype)
    x = jnp.concatenate([zr, x, zr], axis=1)
    zc = jnp.zeros((b, h + 2, 1, c), x.dtype)
    return jnp.concatenate([zc, x, zc], axis=2)


def _fwd_kernel(xp_ref, w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                wf_ref, bf_ref, out_ref, *, block: int, img: int):
    f32 = jnp.float32
    h0_hw = img // 2                     # 64
    h1_hw = img // 4                     # 32
    p_hw = img // 8                      # 16
    h2_hw = img // 16                    # 8
    xp = xp_ref[:]                                        # [B, img+2, img+2, 1]

    # conv0: C_in=1 -> broadcast multiply-add (VPU), f32 accum
    tap0 = _tap_fn(xp, h0_hw)
    acc0 = jnp.zeros((block, h0_hw, h0_hw, C0), f32)
    for dy in range(3):
        for dx in range(3):
            t = tap0(dy, dx)[..., 0]                      # [B, 64, 64]
            w = w0_ref[dy, dx, 0, :].astype(f32)          # [32]
            acc0 += t.astype(f32)[..., None] * w
    h0 = jnp.maximum(acc0 + b0_ref[:].astype(f32), 0.0).astype(jnp.bfloat16)

    # conv1: 9 x [B*32*32, 32] @ [32, 48]
    h0p = _pad1(h0)
    tap1 = _tap_fn(h0p, h1_hw)
    acc1 = jnp.zeros((block * h1_hw * h1_hw, C1), f32)
    for dy in range(3):
        for dx in range(3):
            t = tap1(dy, dx).reshape(-1, C0)
            acc1 += jnp.dot(t, w1_ref[dy, dx], preferred_element_type=f32)
    h1 = jnp.maximum(acc1 + b1_ref[:].astype(f32), 0.0)
    h1 = h1.reshape(block, h1_hw, h1_hw, C1).astype(jnp.bfloat16)

    # maxpool 2x2 via the same phase decomposition
    h1r = h1.reshape(block, p_hw, 2, p_hw, 2, C1)
    p = jnp.maximum(jnp.maximum(h1r[:, :, 0, :, 0, :], h1r[:, :, 0, :, 1, :]),
                    jnp.maximum(h1r[:, :, 1, :, 0, :], h1r[:, :, 1, :, 1, :]))

    # conv2: 9 x [B*8*8, 48] @ [48, 64]
    pp = _pad1(p)
    tap2 = _tap_fn(pp, h2_hw)
    acc2 = jnp.zeros((block * h2_hw * h2_hw, C2), f32)
    for dy in range(3):
        for dx in range(3):
            t = tap2(dy, dx).reshape(-1, C1)
            acc2 += jnp.dot(t, w2_ref[dy, dx], preferred_element_type=f32)
    h2 = jnp.maximum(acc2 + b2_ref[:].astype(f32), 0.0)

    # flatten (HWC) + fc
    flat = h2.reshape(block, h2_hw * h2_hw * C2).astype(jnp.bfloat16)
    out = jnp.dot(flat, wf_ref[:], preferred_element_type=f32)
    out_ref[:] = (out + bf_ref[:].astype(f32)).astype(out_ref.dtype)


def encoder_fwd(x, w0, b0, w1, b1, w2, b2, wf, bf, *, block: int = 8,
                interpret: bool = False):
    """x [N, img, img, 1] -> [N, dim_w]. N is padded to a block multiple."""
    n, img = x.shape[0], x.shape[1]
    dim_w = wf.shape[-1]
    n_pad = -n % block
    if n_pad:
        x = jnp.concatenate([x, jnp.zeros((n_pad,) + x.shape[1:], x.dtype)])
    xp = jnp.pad(x.astype(jnp.bfloat16),
                 ((0, 0), (1, 1), (1, 1), (0, 0)))
    grid = (xp.shape[0] // block,)
    bf16 = jnp.bfloat16
    weights = [w0.astype(bf16), b0.astype(bf16), w1.astype(bf16),
               b1.astype(bf16), w2.astype(bf16), b2.astype(bf16),
               wf.astype(bf16), bf.astype(bf16)]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]
    out = pl.pallas_call(
        partial(_fwd_kernel, block=block, img=img),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], dim_w), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec((block, img + 2, img + 2, 1),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((block, dim_w), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, *weights)
    return out[:n]


def encoder_fwd_reference(x, w0, b0, w1, b1, w2, b2, wf, bf):
    """Same math in plain jnp (for parity tests)."""
    f32 = jnp.float32
    h = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16), w0.astype(jnp.bfloat16), (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    h = jnp.maximum(h + b0, 0).astype(jnp.bfloat16)
    h = jax.lax.conv_general_dilated(
        h, w1.astype(jnp.bfloat16), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    h = jnp.maximum(h + b1, 0).astype(jnp.bfloat16)
    h = jnp.maximum(jnp.maximum(h[:, 0::2, 0::2], h[:, 0::2, 1::2]),
                    jnp.maximum(h[:, 1::2, 0::2], h[:, 1::2, 1::2]))
    h = jax.lax.conv_general_dilated(
        h, w2.astype(jnp.bfloat16), (2, 2), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=f32)
    h = jnp.maximum(h + b2, 0).astype(jnp.bfloat16)
    flat = h.reshape(h.shape[0], -1)
    return (jnp.dot(flat, wf.astype(jnp.bfloat16),
                    preferred_element_type=f32) + bf).astype(f32)
