"""max_pool2 lowering variants agree in value and gradient.

Three impls exist for perf reasons (nn/encoders.py:max_pool2): 'window'
(XLA reduce-window + select-and-scatter backward), 'slice' (strided slices,
for second-order MAML), and 'hybrid' (reduce-window forward + mask-based
custom VJP). Reference semantics: torch MaxPool2d(2)
(`networks/CNPShapeNet1D.py:46-56`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wmfml_tpu.nn.encoders import max_pool2

IMPLS = ["window", "slice", "hybrid"]


def _rand(shape, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("hw", [(8, 8), (7, 9)])
def test_forward_matches_window(impl, hw):
    x = _rand((3, *hw, 5))
    ref = max_pool2(x, "window")
    got = max_pool2(x, impl)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("hw", [(8, 8), (7, 9)])
def test_grad_matches_window_no_ties(impl, hw):
    # distinct values => the argmax is unique, all impls must route the
    # cotangent to the same element
    x = _rand((2, *hw, 4), seed=1)
    gref = jax.grad(lambda v: jnp.sum(max_pool2(v, "window") ** 2))(x)
    got = jax.grad(lambda v: jnp.sum(max_pool2(v, impl) ** 2))(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(gref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("impl", IMPLS)
def test_grad_ties_conserve_mass_and_pick_one(impl):
    # constant input: every 2x2 window is a 4-way tie. Cotangent mass must
    # be conserved per window in every impl. 'window'/'hybrid' give the full
    # cotangent to one element (torch semantics); 'slice' composes
    # jnp.maximum so ties split fractionally — both conserve mass.
    x = jnp.ones((1, 4, 4, 1), jnp.float32)
    g = jax.grad(lambda v: jnp.sum(max_pool2(v, impl)))(x)
    g = np.asarray(g).reshape(2, 2, 2, 2)          # [h2, 2, w2, 2]
    per_window = g.sum(axis=(1, 3))
    np.testing.assert_allclose(per_window, np.ones((2, 2)), rtol=1e-6)
    if impl != "slice":
        assert set(np.unique(g)) <= {0.0, 1.0}


def test_hybrid_grad_first_in_raster_order():
    # tie between (0,1) and (1,0): window backward (select-and-scatter GE)
    # and torch give it to the first in raster order, (0,1)
    x = jnp.array([[[[0.0], [5.0]],
                    [[5.0], [1.0]]]], jnp.float32)  # [1,2,2,1]
    for impl in ("window", "hybrid"):
        g = np.asarray(jax.grad(
            lambda v: jnp.sum(max_pool2(v, impl)))(x)).reshape(2, 2)
        np.testing.assert_array_equal(g, [[0.0, 1.0], [0.0, 0.0]])
