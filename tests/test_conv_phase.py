"""conv3x3_s2_phase: value and both gradients match the stock XLA conv.

The phase decomposition computes the stride-2 conv's input gradient as one
dense 2x2 conv + pixel-shuffle (nn/encoders.py:conv3x3_s2_phase) instead of
XLA's input-dilated convolution — the math must be identical.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmfml_tpu.nn.encoders import _conv3x3_s2, conv3x3_s2_phase


@pytest.mark.parametrize("hw,ci,co", [((16, 16), 3, 8), ((10, 14), 4, 6),
                                      ((9, 9), 2, 5)])
def test_phase_vjp_matches_xla(hw, ci, co):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, *hw, ci), jnp.float32)
    w = jnp.asarray(rng.randn(3, 3, ci, co), jnp.float32)
    g_np = None

    y_ref = _conv3x3_s2(x, w)
    y = conv3x3_s2_phase(x, w)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))

    g = jnp.asarray(rng.randn(*y.shape), jnp.float32)
    del g_np

    def pull(f):
        _, vjp = jax.vjp(f, x, w)
        return vjp(g)

    dx_ref, dw_ref = pull(_conv3x3_s2)
    dx, dw = pull(conv3x3_s2_phase)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw), np.asarray(dw_ref),
                               rtol=1e-5, atol=1e-4)


def test_encoder_grads_equal_across_conv_bwd():
    from wmfml_tpu.nn.encoders import LiteratureEncoder

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(4, 32, 32, 1), jnp.float32)
    grads = {}
    for impl in ("xla", "phase"):
        mod = LiteratureEncoder(dim_w=16, conv_bwd=impl)
        v = mod.init(jax.random.PRNGKey(0), x)

        def loss(params):
            return jnp.sum(mod.apply({"params": params}, x) ** 2)
        grads[impl] = jax.grad(loss)(v["params"])
    ka = jax.tree_util.tree_leaves(grads["xla"])
    kb = jax.tree_util.tree_leaves(grads["phase"])
    for a, b in zip(ka, kb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
