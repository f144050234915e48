"""Pallas fused soft-argmax vs the jnp reference (interpreter mode on CPU).

Numerical parity of the forward and exact gradient parity through the
custom VJP (which routes the backward through the reference implementation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepgraphpose_tpu.ops.pallas.softargmax_kernel import softargmax_2d_pallas
from deepgraphpose_tpu.ops.softargmax import softargmax_2d


@pytest.mark.parametrize("hw", [(16, 16), (23, 31)])
@pytest.mark.parametrize("gauss_len", [0.0, 1.0, 2.0])
def test_forward_matches_reference(rng, hw, gauss_len):
    t, c = 3, 4
    h, w = hw
    x = jnp.asarray(rng.standard_normal((t, h, w, c)) * 3, jnp.float32)
    mu_ref, _ = softargmax_2d(x, gamma=1.0, gauss_len=gauss_len)
    mu_pl = softargmax_2d_pallas(x, 1.0, gauss_len, 1.0, True)
    np.testing.assert_allclose(np.asarray(mu_pl), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_gamma(rng):
    x = jnp.asarray(rng.standard_normal((2, 12, 20, 3)), jnp.float32)
    mu_ref, _ = softargmax_2d(x, gamma=2.5, gauss_len=1.0)
    mu_pl = softargmax_2d_pallas(x, 2.5, 1.0, 1.0, True)
    np.testing.assert_allclose(np.asarray(mu_pl), np.asarray(mu_ref),
                               rtol=1e-5, atol=1e-5)


def test_peak_localization(rng):
    """A strong peak must decode to (approximately) its location."""
    h, w = 24, 32
    x = np.zeros((1, h, w, 1), np.float32)
    x[0, 7, 21, 0] = 30.0
    mu = softargmax_2d_pallas(jnp.asarray(x), 1.0, 1.0, 1.0, True)
    np.testing.assert_allclose(np.asarray(mu)[0, 0], [7.0, 21.0], atol=0.05)


def test_gradient_matches_reference(rng):
    x = jnp.asarray(rng.standard_normal((2, 10, 14, 3)), jnp.float32)

    def loss_pl(s):
        mu = softargmax_2d_pallas(s, 1.0, 1.0, 1.0, True)
        return jnp.sum(mu ** 2)

    def loss_ref(s):
        mu, _ = softargmax_2d(s, gamma=1.0, gauss_len=1.0)
        return jnp.sum(mu ** 2)

    g_pl = jax.grad(loss_pl)(x)
    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.linalg.norm(g_ref)) > 0
