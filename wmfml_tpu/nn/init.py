"""Parameter initializers reproducing the reference's (torch) init statistics.

The reference fixes init by seeding torch at module construction
(e.g. `networks/CNPShapeNet1D.py:43`); exact bit-parity across frameworks is
impossible, so we target the same *distributions*:

  * torch nn.Linear / nn.Conv2d default: W ~ U(+/- 1/sqrt(fan_in)),
    b ~ U(+/- 1/sqrt(fan_in))  (kaiming_uniform with a=sqrt(5)).
  * reference ResNet convs: kaiming_normal(mode='fan_out', relu)
    => N(0, sqrt(2/fan_out))   (`networks/ResNet.py:155-157`).
  * AttnLinear: W ~ N(0, fan_in^-0.5), default torch bias
    (`networks/models.py:195-199`).
"""

from __future__ import annotations

import numpy as np
from jax import random
import jax.numpy as jnp
from jax.nn.initializers import variance_scaling

# U(+/- 1/sqrt(fan_in)): variance_scaling uniform with scale 1/3 gives
# bound = sqrt(3 * scale / fan_in) = 1/sqrt(fan_in).
torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")

# kaiming_normal(fan_out, relu): std = sqrt(2 / fan_out)
kaiming_out_normal = variance_scaling(2.0, "fan_out", "truncated_normal")


def attn_kernel_init(key, shape, dtype=jnp.float32):
    """N(0, fan_in^-0.5) as in the reference AttnLinear."""
    fan_in = shape[0]
    return random.normal(key, shape, dtype) * (fan_in ** -0.5)


def torch_bias_init(fan_in: int):
    """torch default bias: U(+/- 1/sqrt(fan_in)). fan_in of the layer's input."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init
