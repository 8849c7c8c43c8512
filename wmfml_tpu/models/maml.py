"""MAML regressor networks (per-task functional forward).

Reference architecture (networks/MAMLShapeNet1D.py:89-114, VanillaMAML.py):
literature conv encoder -> dim_w(=196) feature reshaped to a 14x14x1 "image"
-> 4 conv blocks (3x3 s1, batchnorm with batch statistics, ReLU) -> global
average pool -> linear regressor (+Tanh for ShapeNet1D).

MAMLMR variants (networks/MAMLMR.py:50-63,114-128) replace the encoder with a
Bayes-by-Backprop stack that is *excluded from inner-loop adaptation* (it is
a plain nn.Sequential in the reference, invisible to torchmeta) and return
its KL.

TPU design: the module maps ONE task's image stack [N, H, W, C] -> ([N, Dy],
kl); the trainer vmaps it over tasks and runs the inner loop as lax.scan —
replacing the reference's serial per-task Python loop
(trainer/maml_trainer.py:129-170). ``adaptable_param_filter`` tells the
trainer which parameter subtrees the inner loop updates (torchmeta adapts
only MetaModule params: conv/linear weights, NOT batchnorm scale/bias).

Batchnorm uses batch statistics at train AND eval (momentum=1,
track_running_stats=False in the reference), computed mask-aware over the
task's real context rows.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from wmfml_tpu.nn.init import torch_bias_init, torch_kernel_init

from wmfml_tpu.nn.bbb import BBBLiteratureEncoder
from wmfml_tpu.nn.encoders import LiteratureEncoder
from wmfml_tpu.nn.mlp import Dense


def masked_batch_norm(x, mask, scale=None, bias=None, eps: float = 1e-5):
    """BatchNorm2d over (N, H, W) using only mask==True rows of N.

    x [N, H, W, C]; mask [N] or None; scale/bias [C] or None (no affine).

    Single-pass statistics (E[x^2] - E[x]^2, f32 accumulation): the
    two-pass mean-then-centered-variance form costs a second full read of x
    and was 27% of the MMAML outer step on v5e (multiply_reduce fusions);
    both sums here fuse into one traversal.

    Precision caveat: the one-pass form cancels catastrophically when
    |mean| >> std. Post-conv activations here are zero-ish mean and the f32
    accumulation + clamp-to-0 bound the damage — parity tests pass at
    rtol=2e-5 vs the two-pass form (tests/test_mmaml.py). If drift appears
    on deeper/bf16 stacks, subtract a per-channel shift (e.g. the first
    element) before accumulating.
    """
    f32 = jnp.float32
    if mask is None:
        denom = f32(x.shape[0] * x.shape[1] * x.shape[2])
        s1 = jnp.sum(x, axis=(0, 1, 2), dtype=f32)
        s2 = jnp.sum(jnp.square(x), axis=(0, 1, 2), dtype=f32)
    else:
        m = mask[:, None, None, None].astype(x.dtype)
        denom = jnp.maximum(
            jnp.sum(m, dtype=f32) * x.shape[1] * x.shape[2], 1.0)
        s1 = jnp.sum(x * m, axis=(0, 1, 2), dtype=f32)
        s2 = jnp.sum(jnp.square(x) * m, axis=(0, 1, 2), dtype=f32)
    mean = s1 / denom
    var = jnp.maximum(s2 / denom - jnp.square(mean), 0.0)
    y = (x - mean.astype(x.dtype)) * jax.lax.rsqrt(var + eps).astype(x.dtype)
    if scale is None:
        assert bias is None, "pass both scale and bias, or neither"
        return y
    return y * scale + bias


class MAMLRegressor(nn.Module):
    dim_w: int = 196
    dim_hidden: int = 64
    output_dim: int = 2
    tanh_out: bool = True
    bbb_encoder: bool = False
    dtype: Optional[jnp.dtype] = None
    pool_impl: str = "slice"   # measured: reduce-window lowers pathologically
    # inside the second-order inner loop (22% of the outer step, RESULTS.md
    # round 2); 'hybrid' is the A/B alternative (nn/encoders.py:max_pool2)
    stem_impl: str = "conv"    # "s2d" = phase-layout conv0+conv1 lowering
    # (nn/encoders.py:_s2d_stem); identical math/params, BBB path unaffected

    @nn.compact
    def __call__(self, x, mask=None):
        """x [N, H, W, C] (one task) -> ([N, output_dim], kl)."""
        kl = 0.0
        # pool_impl="slice": reduce-window lowers pathologically inside the
        # second-order inner loop (22% of the outer step, RESULTS.md round 2)
        if self.bbb_encoder:
            w, kl = BBBLiteratureEncoder(dim_w=self.dim_w, dtype=self.dtype,
                                         pool_impl=self.pool_impl,
                                         name="encoder_w")(x)
        else:
            w = LiteratureEncoder(dim_w=self.dim_w, dtype=self.dtype,
                                  pool_impl=self.pool_impl,
                                  stem_impl=self.stem_impl,
                                  name="encoder_w")(x)
        side = int(self.dim_w ** 0.5)
        h = w.reshape(-1, side, side, 1)
        for i in range(4):
            c_in = h.shape[-1]
            h = nn.Conv(self.dim_hidden, (3, 3), strides=1,
                        padding=[(1, 1), (1, 1)],
                        kernel_init=torch_kernel_init,
                        bias_init=torch_bias_init(c_in * 9),
                        dtype=self.dtype, name=f"features_{i + 1}_conv")(h)
            scale = self.param(f"features_{i + 1}_bn_scale",
                               nn.initializers.ones, (self.dim_hidden,))
            bias = self.param(f"features_{i + 1}_bn_bias",
                              nn.initializers.zeros, (self.dim_hidden,))
            h = masked_batch_norm(h, mask, scale.astype(h.dtype),
                                  bias.astype(h.dtype))
            h = nn.relu(h)
        h = jnp.mean(h, axis=(1, 2))                      # AdaptiveAvgPool(1)
        out = Dense(self.output_dim, dtype=self.dtype, name="regressor")(h)
        if self.tanh_out:
            out = jnp.tanh(out)
        return out, kl

    def adaptable_param_filter(self) -> Callable[[tuple], bool]:
        """Predicate over flattened param paths: True = inner-loop adapted."""
        bbb = self.bbb_encoder

        def adaptable(path: tuple) -> bool:
            name = path[0]
            if name == "encoder_w":
                return not bbb        # BBB encoder frozen in the inner loop
            if name.endswith("_conv") or name == "regressor":
                return True
            if "_bn_" in name:
                return False          # batchnorm scale/bias not meta-adapted
            return True

        return adaptable
