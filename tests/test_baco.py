"""BaCO aggregation vs a literal torch oracle of the reference closed form."""

import numpy as np
import pytest

from wmfml_tpu.ops.setops import baco, masked_max, masked_mean

torch = pytest.importorskip("torch")

rng = np.random.RandomState(9)


def torch_baco(mu, r_sigma):
    """Reference math (networks/CondNeuralProcess.py:59-75), fresh in torch."""
    mu = torch.as_tensor(mu)
    r_sigma = torch.as_tensor(r_sigma)
    t, _, d = mu.shape
    mu_z = torch.zeros(t, d)
    sigma_z = torch.ones(t, d)
    v = mu - mu_z[:, None, :]
    sigma_inv = 1.0 / r_sigma
    sigma_z = 1.0 / (1.0 / sigma_z + sigma_inv.sum(1))
    mu_z = mu_z + sigma_z * (sigma_inv * v).sum(1)
    return mu_z.numpy(), sigma_z.numpy()


def test_baco_matches_reference_closed_form():
    mu = rng.randn(3, 7, 16).astype(np.float32)
    var = (0.1 + rng.rand(3, 7, 16)).astype(np.float32)
    got_mu, got_sig = baco(mu, var)
    want_mu, want_sig = torch_baco(mu, var)
    np.testing.assert_allclose(np.asarray(got_mu), want_mu, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sig), want_sig, rtol=1e-5)


def test_masked_baco_equals_sliced():
    mu = rng.randn(2, 6, 8).astype(np.float32)
    var = (0.1 + rng.rand(2, 6, 8)).astype(np.float32)
    mask = np.zeros((2, 6), bool)
    mask[:, :4] = True
    got_mu, got_sig = baco(mu, var, mask)
    want_mu, want_sig = baco(mu[:, :4], var[:, :4])
    np.testing.assert_allclose(np.asarray(got_mu), np.asarray(want_mu),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_sig), np.asarray(want_sig),
                               rtol=1e-5)


def test_masked_mean_max_equal_sliced():
    x = rng.randn(2, 6, 5).astype(np.float32)
    mask = np.zeros((2, 6), bool)
    mask[:, :3] = True
    np.testing.assert_allclose(np.asarray(masked_mean(x, mask)),
                               x[:, :3].mean(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(masked_max(x, mask)),
                               x[:, :3].max(1), rtol=1e-6)
