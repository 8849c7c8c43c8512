"""Image encoder trunks (flax.linen, NHWC — TPU native layout).

Two trunks from the reference, re-designed channel-last so XLA lays convs on
the MXU without layout transposes:

  * ``LiteratureEncoder`` — the "literature" conv stack used by the
    ShapeNet1D / Pascal1D / MAML families
    (`networks/CNPShapeNet1D.py:46-56`):
    conv3x3 s2 (C->32) / conv3x3 s2 (32->48) / maxpool2 / conv3x3 s2 (48->64)
    / flatten / linear(->dim_w), ReLU between convs.

  * ``ResNetTrunk`` — conv5x5 s2 (C->64) + four no-batchnorm BasicBlock
    stages, each 64ch stride 2 (`networks/ResNet.py:121-153`,
    `networks/models.py:63-117`), followed by a pixel aggregation chosen by
    ``img_agg``: mean -> global average pool (64 features), max/baco ->
    adaptive 2x2 max pool (256 features), reshape -> flatten.

Both operate on flat [B, H, W, C] batches; callers reshape [T, N, ...].
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wmfml_tpu.nn.init import kaiming_out_normal, torch_bias_init, torch_kernel_init
from wmfml_tpu.nn.mlp import Dense


def adaptive_max_pool(x: jnp.ndarray, out_hw: int = 2) -> jnp.ndarray:
    """AdaptiveMaxPool2d((2,2)) for even input sizes (all sizes used here)."""
    b, h, w, c = x.shape
    assert h % out_hw == 0 and w % out_hw == 0, (h, w)
    x = x.reshape(b, out_hw, h // out_hw, out_hw, w // out_hw, c)
    return jnp.max(x, axis=(2, 4))


def max_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    """MaxPool2d(2) as strided slices + elementwise maximum.

    XLA's reduce-window lowering for this shape measured ~3 ms per call on
    v5e inside the second-order MAML inner loop (22% of the whole outer
    step, RESULTS.md round 2); four slices + three maximums are pure VPU
    work, and the backward is comparison masks instead of select-and-scatter.
    Measured the other way on the first-order CNP/ANP step (2.31 -> 2.56
    ms/step), so callers choose per context via ``pool_impl``.
    """
    h, w = x.shape[1] // 2 * 2, x.shape[2] // 2 * 2
    x = x[:, :h, :w]   # floor semantics for odd dims, like reduce-window
    a = jnp.maximum(x[:, 0::2, 0::2], x[:, 0::2, 1::2])
    b = jnp.maximum(x[:, 1::2, 0::2], x[:, 1::2, 1::2])
    return jnp.maximum(a, b)


@jax.custom_vjp
def _max_pool2_hybrid(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _max_pool2_hybrid_fwd(x):
    y = nn.max_pool(x, (2, 2), strides=(2, 2))
    return y, (x, y)


def _max_pool2_hybrid_bwd(res, g):
    # grad to the FIRST max element in window raster order (matches the
    # select-and-scatter lowering and torch MaxPool2d): elementwise
    # comparisons against the broadcast window max + a first-occurrence
    # mask — all VPU work, no select-and-scatter op
    x, y = res
    b, h, w, c = x.shape
    xw = x[:, : y.shape[1] * 2, : y.shape[2] * 2]
    xw = xw.reshape(b, y.shape[1], 2, y.shape[2], 2, c)
    eq = xw == y[:, :, None, :, None, :]
    # raster order within the 2x2 window: (0,0), (0,1), (1,0), (1,1)
    e00, e01 = eq[:, :, 0, :, 0], eq[:, :, 0, :, 1]
    e10, e11 = eq[:, :, 1, :, 0], eq[:, :, 1, :, 1]
    m00 = e00
    m01 = e01 & ~e00
    m10 = e10 & ~(e00 | e01)
    m11 = e11 & ~(e00 | e01 | e10)
    first = jnp.stack(
        [jnp.stack([m00, m01], axis=3), jnp.stack([m10, m11], axis=3)],
        axis=2)                                    # [b, h2, 2, w2, 2, c]
    gx = jnp.where(first, g[:, :, None, :, None, :], 0).astype(x.dtype)
    gx = gx.reshape(b, y.shape[1] * 2, y.shape[2] * 2, c)
    if gx.shape[1] != h or gx.shape[2] != w:       # odd dims: pad the floor
        gx = jnp.pad(gx, ((0, 0), (0, h - gx.shape[1]),
                          (0, w - gx.shape[2]), (0, 0)))
    return (gx,)


_max_pool2_hybrid.defvjp(_max_pool2_hybrid_fwd, _max_pool2_hybrid_bwd)


def max_pool2(x: jnp.ndarray, impl: str = "window") -> jnp.ndarray:
    """2x2/stride-2 max pool; impl='slice' for loops XLA lowers badly
    (second-order MAML), 'hybrid' for reduce-window forward + mask-based
    backward (no select-and-scatter), 'window' (reduce-window) elsewhere."""
    if impl == "slice":
        return max_pool_2x2(x)
    if impl == "hybrid":
        return _max_pool2_hybrid(x)
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def _conv3x3_s2(x, w):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(x, w, (2, 2), [(1, 1), (1, 1)],
                                        dimension_numbers=dn)


@jax.custom_vjp
def conv3x3_s2_phase(x, w):
    """3x3/stride-2/pad-1 NHWC conv whose input-gradient is computed as ONE
    2x2 stride-1 conv over the output grads + depth-to-space, instead of
    XLA's input-dilated convolution.

    The dilated form materializes the zero-interleaved grads (a [B, 2Ho,
    2Wo, Co] intermediate) and contracts over a sparse 3x3 window; measured
    at 239 us/step / 55% HBM BW as the single hottest fusion of the
    headline backward (results/profiles/roofline_exact.json, fusion.4739).
    The phase form exploits p = 2i + kh - 1: output parity (a, b) selects a
    fixed subset of kernel taps, so all four parities come out of one dense
    conv with a [2, 2, Co, 4*Ci] kernel assembled from W's taps (contraction
    2*2*Co, MXU-friendly), followed by a pixel-shuffle. Validated equal to
    the XLA VJP to fp roundoff (tests/test_conv_phase.py).
    """
    return _conv3x3_s2(x, w)


def _conv3x3_s2_phase_fwd(x, w):
    return _conv3x3_s2(x, w), (x, w)


def _conv3x3_s2_phase_bwd(res, g):
    x, w = res
    b, hh, ww, ci = x.shape
    _, ho, wo, co = g.shape

    # dw: conv is linear in w — transpose the linear map, no forward re-run
    dw = jax.linear_transpose(lambda w_: _conv3x3_s2(x, w_), w)(g)[0]

    if hh != 2 * ho or ww != 2 * wo:
        # odd spatial dims: fall back to XLA's dilated-conv input grad
        dx = jax.linear_transpose(lambda x_: _conv3x3_s2(x_, w), x)(g)[0]
        return dx, dw

    # phase kernel K[di, dj, co, phase, ci]: output position (2i+a, 2j+b)
    # reads gpad[i+di, j+dj] against tap W[kh, kw] where (a: di=0 -> kh=1)
    # for even parity and (di=0 -> kh=2, di=1 -> kh=0) for odd parity
    # (p = 2i' + kh - 1 solved for i'), same for columns
    z = jnp.zeros((co, ci), w.dtype)
    t = lambda kh, kw: jnp.transpose(w[kh, kw])          # [Ci,Co] -> [Co,Ci]
    k00 = jnp.stack([t(1, 1), t(1, 2), t(2, 1), t(2, 2)], 1)
    k01 = jnp.stack([z, t(1, 0), z, t(2, 0)], 1)
    k10 = jnp.stack([z, z, t(0, 1), t(0, 2)], 1)
    k11 = jnp.stack([z, z, z, t(0, 0)], 1)
    kern = jnp.stack([jnp.stack([k00, k01], 0),
                      jnp.stack([k10, k11], 0)], 0)      # [2,2,Co,4,Ci]
    kern = kern.reshape(2, 2, co, 4 * ci)

    gpad = jnp.pad(g, ((0, 0), (0, 1), (0, 1), (0, 0)))
    dn = jax.lax.conv_dimension_numbers(gpad.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ph = jax.lax.conv_general_dilated(gpad, kern, (1, 1), "VALID",
                                      dimension_numbers=dn)
    dx = ph.reshape(b, ho, wo, 2, 2, ci).transpose(0, 1, 3, 2, 4, 5)
    dx = dx.reshape(b, hh, ww, ci).astype(x.dtype)
    return dx, dw


conv3x3_s2_phase.defvjp(_conv3x3_s2_phase_fwd, _conv3x3_s2_phase_bwd)


class Conv3x3S2(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), strides=2, pad 1) with a
    selectable input-gradient lowering; parameter pytree ("kernel",
    "bias") and init match nn.Conv exactly."""

    features: int
    kernel_init: object
    bias_init: object
    dtype: Optional[jnp.dtype] = None
    grad_impl: str = "phase"          # "phase" | "xla"

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (3, 3, x.shape[-1], self.features))
        bias = self.param("bias", self.bias_init, (self.features,))
        if self.dtype is not None:
            x, kernel = x.astype(self.dtype), kernel.astype(self.dtype)
        op = conv3x3_s2_phase if self.grad_impl == "phase" else _conv3x3_s2
        y = op(x, kernel)
        return y + bias.astype(y.dtype)


class _ConvParams(nn.Module):
    """Declares an nn.Conv-compatible (kernel, bias) pair without running
    the conv — lets alternative stem lowerings keep the exact state-dict
    keys/shapes of the stock conv stack."""

    kernel_shape: tuple
    kernel_init: object
    bias_init: object
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.kernel_shape)
        if not self.use_bias:
            return k, None
        b = self.param("bias", self.bias_init, (self.kernel_shape[-1],))
        return k, b


def _s2d(x):
    """Space-to-depth factor 2, channel order c' = (dh*2 + dw)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def _s2d_stem(x, w0, b0, w1, b1, dtype, phase_pool=False):
    """conv0(s2) + relu + conv1(s2) computed in phase (space-to-depth)
    layout — numerically identical to the stock stack (fp-roundoff),
    kernels rearranged from the SAME stored [3,3,Ci,Co] params.

    ``phase_pool=True`` additionally folds the 2x2/stride-2 max pool that
    follows the stem into the layout: conv1 emits the PHASE layout of the
    H/8 grid (a 3x3 stride-2 conv with 4*C1 output channel blocks), so the
    pool's non-overlapping 2x2 windows are exactly the 4 phase blocks and
    the pool becomes an elementwise 4-way maximum — no reduce-window
    forward, no select-and-scatter backward (115 us at 63% BW in the
    round-5 roofline), and the pool gradient lands directly in the phase
    layout conv1's backward consumes. Tie-breaking on exact float ties
    differs from select-and-scatter (maximum-chain select, as in
    pool_impl='slice'), but post-relu ties at 0 carry no gradient anyway
    (relu'(0) = 0 kills both routings) and non-zero float ties have
    measure zero — gradient equality is covered by tests/test_s2d_stem.py.

    Why: in phase layout conv1 is a stride-1 2x2 conv over 4*C0 channels
    (contraction 2*2*4*32 = 512 vs 288, no strided windows), and — the real
    prize — its input-gradient transposes to another PLAIN stride-1 conv:
    no input dilation, no pixel-shuffle, and the gradient lands directly in
    the layout conv0's weight-grad consumes. The stock lowering's dilated
    backward was the hottest fusion of the headline step (239 us at 55% BW,
    results/profiles/roofline_exact.json).

    Output phase (a,b) of conv0 maps tap kh to window index th = a + (kh>0)
    and input phase dh = (kh+1) mod 2 (p = 2i + a, x row 2p + kh - 1 =
    2m + dh solved for m); conv1's tap kh maps to (di, a) in
    {(0,1)->0, (1,0)->1, (1,1)->2} with (0,0) empty. Validated equal to the
    stock stack in tests/test_s2d_stem.py.
    """
    from jax import lax

    ci = x.shape[-1]
    c0 = w0.shape[-1]
    if dtype is not None:
        x, w0, w1 = x.astype(dtype), w0.astype(dtype), w1.astype(dtype)
        b0, b1 = b0.astype(dtype), b1.astype(dtype)

    z = _s2d(x)                                       # [B, H/2, W/2, 4*Ci]
    k0 = jnp.zeros((3, 3, 4 * ci, 4 * c0), w0.dtype)
    for a in (0, 1):
        for kh in (0, 1, 2):
            th, dh = a + (1 if kh else 0), (kh + 1) % 2
            for b_ in (0, 1):
                for kw in (0, 1, 2):
                    tw, dw = b_ + (1 if kw else 0), (kw + 1) % 2
                    k0 = k0.at[th, tw,
                               (dh * 2 + dw) * ci:(dh * 2 + dw + 1) * ci,
                               (a * 2 + b_) * c0:(a * 2 + b_ + 1) * c0
                               ].add(w0[kh, kw])
    dn = lax.conv_dimension_numbers(z.shape, k0.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    a0 = lax.conv_general_dilated(z, k0, (2, 2), [(1, 0), (1, 0)],
                                  dimension_numbers=dn)
    a0 = nn.relu(a0 + jnp.tile(b0, 4))                # [B, H/4, W/4, 4*C0]

    c1 = w1.shape[-1]
    if phase_pool:
        # conv1 emits the phase layout of the H/8 grid: output pixel
        # p = 2o + a reads m = p + off (off = di - 1), tap t = a + off + 1
        kp = jnp.zeros((3, 3, 4 * c0, 4 * c1), w1.dtype)
        tap = {(-1, 1): 0, (0, 0): 1, (0, 1): 2}      # (off, dh) -> kh
        for a in (0, 1):
            for (oh, dh), kh in tap.items():
                th = a + oh + 1
                for b_ in (0, 1):
                    for (ow, dw), kw in tap.items():
                        tw = b_ + ow + 1
                        kp = kp.at[th, tw,
                                   (dh * 2 + dw) * c0:(dh * 2 + dw + 1) * c0,
                                   (a * 2 + b_) * c1:(a * 2 + b_ + 1) * c1
                                   ].add(w1[kh, kw])
        dn = lax.conv_dimension_numbers(a0.shape, kp.shape,
                                        ("NHWC", "HWIO", "NHWC"))
        a1 = lax.conv_general_dilated(a0, kp, (2, 2), [(1, 0), (1, 0)],
                                      dimension_numbers=dn)
        a1 = nn.relu(a1 + jnp.tile(b1, 4))            # [B, H/8, W/8, 4*C1]
        # 2x2/s2 max pool == elementwise max over the 4 phase blocks
        return jnp.maximum(
            jnp.maximum(a1[..., :c1], a1[..., c1:2 * c1]),
            jnp.maximum(a1[..., 2 * c1:3 * c1], a1[..., 3 * c1:]))

    k1 = jnp.zeros((2, 2, 4 * c0, c1), w1.dtype)
    tap = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (di, a), kh in tap.items():
        for (dj, b_), kw in tap.items():
            k1 = k1.at[di, dj,
                       (a * 2 + b_) * c0:(a * 2 + b_ + 1) * c0, :
                       ].add(w1[kh, kw])
    dn = lax.conv_dimension_numbers(a0.shape, k1.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    a1 = lax.conv_general_dilated(a0, k1, (1, 1), [(1, 0), (1, 0)],
                                  dimension_numbers=dn)
    return nn.relu(a1 + b1)                           # [B, H/4, W/4, C1]


class _TrunkBlockParams(nn.Module):
    """Parameter-only twin of BasicBlockNoBN(stride=2) — same param paths
    (conv1/conv2/downsample kernels, no biases) so the s2d trunk stem keeps
    the exact state-dict of the stock block."""

    planes: int

    @nn.compact
    def __call__(self):
        p = self.planes
        wa, _ = _ConvParams((3, 3, p, p), kaiming_out_normal, None,
                            use_bias=False, name="conv1")()
        wb, _ = _ConvParams((3, 3, p, p), kaiming_out_normal, None,
                            use_bias=False, name="conv2")()
        ws, _ = _ConvParams((1, 1, p, p), kaiming_out_normal, None,
                            use_bias=False, name="downsample")()
        return wa, wb, ws


def _s2d_trunk_stem(x, wc, bc, wa, wb, ws, dtype):
    """ResNetTrunk conv1(5x5 s2) + relu + BasicBlock layer1 (3x3 s2 →
    relu → 3x3 s1, +1x1-s2 skip) computed in phase (space-to-depth)
    layout — numerically identical to the stock stack on the SAME stored
    parameters (see _s2d_stem for the derivation style; golden + gradient
    tested in tests/test_s2d_trunk.py).

    Mapping for the 5x5 stride-2 conv consuming s2d input and emitting
    phase-major output: output pixel row p = 2i + a reads input rows
    r = 4i + 2a + kh − 2; in s2d coords r = 2m + dh gives dh = kh mod 2
    and tap offset m − 2i = a + (kh − 2 − dh)/2 ∈ [−1, 2] → a 4x4
    stride-2 conv with padding (1,1). layer1's 3x3 s2 conv consumes the
    phase layout via the {(0,1), (1,0), (1,1)} 2x2 tap map (as in
    _s2d_stem), so its input-gradient is a PLAIN stride-1 conv — no input
    dilation at the trunk's largest (H/2) resolution, the analog of the
    headline win for the literature stem. The 1x1-s2 skip reads phase
    block (0,0) = the first C0 channels.

    Why it can win: the trunk runs TWICE per LargeCNP step (ctx+qry
    encoder megabatch + NPDecoder query trunk), and layer1's dilated
    input-grad is the largest backward conv in the 3D/Distractor programs
    (ref workload: networks/models.py:120-192, networks/ResNet.py:121-153).
    """
    from jax import lax

    ci = x.shape[-1]
    c0 = wc.shape[-1]                                   # 64
    if dtype is not None:
        x = x.astype(dtype)
        wc, wa, wb, ws = (t.astype(dtype) for t in (wc, wa, wb, ws))
        bc = bc.astype(dtype)

    z = _s2d(x)                                         # [B, H/2, W/2, 4Ci]
    k0 = jnp.zeros((4, 4, 4 * ci, 4 * c0), wc.dtype)
    for a in (0, 1):
        for kh in range(5):
            dh = kh % 2
            th = a + (kh - 2 - dh) // 2 + 1
            for b_ in (0, 1):
                for kw in range(5):
                    dw = kw % 2
                    tw = b_ + (kw - 2 - dw) // 2 + 1
                    k0 = k0.at[th, tw,
                               (dh * 2 + dw) * ci:(dh * 2 + dw + 1) * ci,
                               (a * 2 + b_) * c0:(a * 2 + b_ + 1) * c0
                               ].add(wc[kh, kw])
    dn = lax.conv_dimension_numbers(z.shape, k0.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    a1 = lax.conv_general_dilated(z, k0, (2, 2), [(1, 1), (1, 1)],
                                  dimension_numbers=dn)
    a1 = nn.relu(a1 + jnp.tile(bc, 4))                  # [B, H/4, W/4, 4*C0]

    k1 = jnp.zeros((2, 2, 4 * c0, c0), wa.dtype)
    tap = {(0, 1): 0, (1, 0): 1, (1, 1): 2}
    for (di, a), kh in tap.items():
        for (dj, b_), kw in tap.items():
            k1 = k1.at[di, dj,
                       (a * 2 + b_) * c0:(a * 2 + b_ + 1) * c0, :
                       ].add(wa[kh, kw])
    dn = lax.conv_dimension_numbers(a1.shape, k1.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    h = nn.relu(lax.conv_general_dilated(a1, k1, (1, 1), [(1, 0), (1, 0)],
                                         dimension_numbers=dn))
    dn = lax.conv_dimension_numbers(h.shape, wb.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    out = lax.conv_general_dilated(h, wb, (1, 1), [(1, 1), (1, 1)],
                                   dimension_numbers=dn)
    skip_in = a1[..., :c0]                              # phase (0,0) block
    dn = lax.conv_dimension_numbers(skip_in.shape, ws.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    skip = lax.conv_general_dilated(skip_in, ws, (1, 1), [(0, 0), (0, 0)],
                                    dimension_numbers=dn)
    return nn.relu(out + skip)                          # [B, H/4, W/4, C0]


class LiteratureEncoder(nn.Module):
    """Conv stack -> dim_w feature per image."""

    dim_w: int
    dtype: Optional[jnp.dtype] = None
    pool_impl: str = "window"
    conv_bwd: str = "xla"             # conv1 input-grad lowering (see
    # conv3x3_s2_phase); conv0's input-grad is dead (images are leaves) and
    # conv2's is tiny (16x16), so only conv1 gets the choice
    stem_impl: str = "conv"           # "s2d" = phase-layout conv0+conv1
    # (_s2d_stem); "s2dp" also folds the max pool into the layout as an
    # elementwise 4-way maximum; same params, different lowering

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        c_in = x.shape[-1]
        if (self.stem_impl in ("s2d", "s2dp") and x.shape[1] % 4 == 0
                and x.shape[2] % 4 == 0):
            w0, b0 = _ConvParams((3, 3, c_in, 32), torch_kernel_init,
                                 torch_bias_init(c_in * 9), name="conv0")()
            w1, b1 = _ConvParams((3, 3, 32, 48), torch_kernel_init,
                                 torch_bias_init(32 * 9), name="conv1")()
            phase_pool = (self.stem_impl == "s2dp" and x.shape[1] % 8 == 0
                          and x.shape[2] % 8 == 0)
            x = _s2d_stem(x, w0, b0, w1, b1, self.dtype,
                          phase_pool=phase_pool)
            if not phase_pool:
                x = max_pool2(x, self.pool_impl)
            x = nn.Conv(64, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(48 * 9), dtype=self.dtype,
                        name="conv2")(x)
            x = nn.relu(x)
            x = x.reshape(x.shape[0], -1)
            x = Dense(self.dim_w, dtype=self.dtype, name="fc")(x)
            return x
        x = nn.Conv(32, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(c_in * 9), dtype=self.dtype,
                    name="conv0")(x)
        x = nn.relu(x)
        if self.conv_bwd == "phase":
            x = Conv3x3S2(48, kernel_init=torch_kernel_init,
                          bias_init=torch_bias_init(32 * 9),
                          dtype=self.dtype, name="conv1")(x)
        else:
            x = nn.Conv(48, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(32 * 9), dtype=self.dtype,
                        name="conv1")(x)
        x = nn.relu(x)
        x = max_pool2(x, self.pool_impl)
        x = nn.Conv(64, (3, 3), strides=2, padding=[(1, 1), (1, 1)],
                    kernel_init=torch_kernel_init,
                    bias_init=torch_bias_init(48 * 9), dtype=self.dtype,
                    name="conv2")(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)  # 128x128 input -> 64*8*8 = 4096
        x = Dense(self.dim_w, dtype=self.dtype, name="fc")(x)
        return x


class BasicBlockNoBN(nn.Module):
    """ResNet BasicBlock with batchnorm elided (as the reference comments it out)."""

    planes: int
    stride: int = 1
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=kaiming_out_normal, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=1,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=kaiming_out_normal, dtype=self.dtype,
                      name="conv2")(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=kaiming_out_normal,
                               dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """ResNet Bottleneck (networks/ResNet.py:77-119) — 1x1 -> 3x3 -> 1x1
    with expansion 4.

    Unlike BasicBlock (whose batchnorms the reference comments out,
    ResNet.py:51-54), Bottleneck KEEPS its three BatchNorms; they run in
    training mode (batch statistics) in the reference, reproduced here as
    batch-statistics normalization with learnable scale/bias. The block is
    reachable from no shipped reference config (only `ResNet(BasicBlock,
    ...)` is ever constructed, networks/models.py:76); ported for surface
    parity, construction-tested in tests/test_models_np.py."""

    planes: int
    stride: int = 1
    base_width: int = 64
    dtype: Optional[jnp.dtype] = None
    expansion: int = 4

    def _bn(self, x, idx):
        c = x.shape[-1]
        scale = self.param(f"bn{idx}_scale", nn.initializers.ones, (c,))
        bias = self.param(f"bn{idx}_bias", nn.initializers.zeros, (c,))
        f32 = jnp.float32
        mean = jnp.mean(x, axis=(0, 1, 2), dtype=f32)
        var = jnp.maximum(
            jnp.mean(jnp.square(x), axis=(0, 1, 2), dtype=f32)
            - jnp.square(mean), 0.0)
        y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(
            var + 1e-5).astype(x.dtype)
        return y * scale.astype(x.dtype) + bias.astype(x.dtype)

    @nn.compact
    def __call__(self, x):
        width = int(self.planes * (self.base_width / 64.0))
        identity = x
        out = nn.Conv(width, (1, 1), strides=1, use_bias=False,
                      kernel_init=kaiming_out_normal, dtype=self.dtype,
                      name="conv1")(x)
        out = nn.relu(self._bn(out, 1))
        out = nn.Conv(width, (3, 3), strides=self.stride,
                      padding=[(1, 1), (1, 1)], use_bias=False,
                      kernel_init=kaiming_out_normal, dtype=self.dtype,
                      name="conv2")(out)
        out = nn.relu(self._bn(out, 2))
        out = nn.Conv(self.planes * self.expansion, (1, 1), strides=1,
                      use_bias=False, kernel_init=kaiming_out_normal,
                      dtype=self.dtype, name="conv3")(out)
        out = self._bn(out, 3)
        if self.stride != 1 or x.shape[-1] != self.planes * self.expansion:
            identity = nn.Conv(self.planes * self.expansion, (1, 1),
                               strides=self.stride, use_bias=False,
                               kernel_init=kaiming_out_normal,
                               dtype=self.dtype, name="downsample")(x)
        return nn.relu(out + identity)


def load_pretrained_resnet(variables, state_dict_numpy):
    """Map a torchvision-style ResNet state_dict onto ResNetTrunk variables.

    The reference's own pretrained branch (networks/ResNet.py:171-185)
    downloads resnet18 weights and calls strict ``load_state_dict`` — which
    CRASHES against its modified architecture (conv1/bn1 deleted, all
    stages 64-ch, batchnorms removed), so no working run ever used it.
    This hook is the honest TPU-side equivalent: given an already-loaded
    numpy state_dict (no egress here — pass a local file through
    ``wmfml_tpu.ckpt.torch_import.state_dict_to_numpy``), copy every
    compatible ``layerN.0.convM.weight`` into the trunk (OIHW -> HWIO) and
    report what was skipped. Returns (new_variables, skipped_keys)."""
    import numpy as np

    params = jax.tree_util.tree_map(lambda a: a, variables["params"])
    skipped = []
    for key, val in state_dict_numpy.items():
        parts = key.split(".")
        # torchvision: layer{i}.{block}.conv{j}.weight
        if (len(parts) == 4 and parts[0].startswith("layer")
                and parts[2].startswith("conv") and parts[3] == "weight"
                and parts[1] == "0"):
            layer, conv = parts[0], parts[2]
            tgt = params.get(layer, {})
            if conv in tgt and tgt[conv]["kernel"].shape == tuple(
                    np.transpose(val, (2, 3, 1, 0)).shape):
                tgt[conv]["kernel"] = jnp.asarray(
                    np.transpose(val, (2, 3, 1, 0)))
                continue
        skipped.append(key)
    return {**variables, "params": params}, skipped


class ResNetTrunk(nn.Module):
    """conv5x5 s2 + 4 stride-2 BasicBlock stages + img_agg pooling.

    img_agg: 'mean' -> 64 features; 'max'/'baco' -> 256; 'reshape' -> C*H*W.
    """

    img_agg: str = "max"
    dtype: Optional[jnp.dtype] = None
    trunk_stem: str = "conv"          # "s2d" = phase-layout conv1+layer1
    # (_s2d_trunk_stem); same stored params, different lowering

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        c_in = x.shape[-1]
        if (self.trunk_stem == "s2d" and x.shape[1] % 4 == 0
                and x.shape[2] % 4 == 0):
            wc, bc = _ConvParams((5, 5, c_in, 64), torch_kernel_init,
                                 torch_bias_init(c_in * 25), name="conv1")()
            wa, wb, ws = _TrunkBlockParams(planes=64, name="layer1")()
            x = _s2d_trunk_stem(x, wc, bc, wa, wb, ws, self.dtype)
            start = 1
        else:
            x = nn.Conv(64, (5, 5), strides=2, padding=[(2, 2), (2, 2)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(c_in * 25),
                        dtype=self.dtype, name="conv1")(x)
            x = nn.relu(x)
            start = 0
        for i in range(start, 4):
            x = BasicBlockNoBN(planes=64, stride=2, dtype=self.dtype,
                               name=f"layer{i + 1}")(x)
        if self.img_agg == "mean":
            x = jnp.mean(x, axis=(1, 2))
        elif self.img_agg in ("max", "baco"):
            x = adaptive_max_pool(x, 2)
        elif self.img_agg == "reshape":
            pass
        else:
            raise ValueError(f"img_agg {self.img_agg!r} not in mean/max/baco/reshape")
        return x.reshape(x.shape[0], -1)


def trunk_feature_dim(img_agg: str, img_hw: int) -> int:
    """Output feature count of ResNetTrunk for a square input of side img_hw."""
    final_hw = img_hw // 32  # conv s2 + 4 stages s2
    if img_agg == "mean":
        return 64
    if img_agg in ("max", "baco"):
        return 64 * 4
    if img_agg == "reshape":
        return 64 * final_hw * final_hw
    raise ValueError(img_agg)
