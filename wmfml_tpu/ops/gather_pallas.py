"""Pallas row-gather kernel (episode assembly on device).

XLA lowers big advanced-indexing gathers of image rows to a slow elementwise
gather (~2 GB/s effective on v5e for 16 KB rows). This kernel uses
PrefetchScalarGridSpec: the index vector is prefetched to SMEM and drives the
input BlockSpec's index_map, so Pallas's pipeline emitter turns the whole
thing into double-buffered HBM->HBM row DMAs — bandwidth-bound, not
gather-bound.

x [N, H, W] any dtype, idx [M] int32 -> out [M, H, W] with out[i] = x[idx[i]].
Callers flatten trailing image dims into (H, W) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _copy_kernel(idx_ref, x_ref, o_ref):
    # idx_ref is scalar-prefetch (drives the BlockSpec); block is one row
    o_ref[...] = x_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(x: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """out[i] = x[idx[i]] via index-mapped block DMA."""
    n, h, w = x.shape
    m = idx.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i, idx_ref: (idx_ref[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i, idx_ref: (i, 0, 0)),
    )
    return pl.pallas_call(
        _copy_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, h, w), x.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), x)


def gather_images(data: jnp.ndarray, flat_idx: jnp.ndarray,
                  interpret: bool = False) -> jnp.ndarray:
    """Gather images by flat row index.

    data [N, H, W, C] (or any [N, ...]); flat_idx [...] int; returns
    [*flat_idx.shape, H, W, C]. Trailing dims are fused into a 2-D tile for
    the kernel and restored after.
    """
    n = data.shape[0]
    inner = data.shape[1:]
    h = inner[0]
    w = 1
    for d in inner[1:]:
        w *= d
    x2 = data.reshape(n, h, w)
    idx = flat_idx.reshape(-1)
    out = gather_rows(x2, idx, interpret=interpret)
    return out.reshape(flat_idx.shape + inner)
