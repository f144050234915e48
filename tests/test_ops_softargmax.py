"""Unit tests for the soft-argmax op against a numpy re-implementation."""

import numpy as np
import jax.numpy as jnp

from deepgraphpose_tpu.ops.softargmax import (
    gaussian_kernel_1d, gaussian_smooth_2d, softargmax_2d, coords_to_pixels)


def np_softargmax(scmap, gamma, gauss_len):
    """Literal numpy transcription of the reference semantics
    (fitdgp_util.py:342-402): softmax -> zero-pad gaussian blur ->
    renormalize -> expectation."""
    t, h, w, c = scmap.shape
    x = scmap * gamma
    x = x.reshape(t, h * w, c)
    x = np.exp(x - x.max(axis=1, keepdims=True))
    x = x / x.sum(axis=1, keepdims=True)
    probs = x.reshape(t, h, w, c)

    radius = int(gauss_len)
    if radius > 0:
        k1 = np.arange(-radius, radius + 1, dtype=np.float64)
        k1 = np.exp(-0.5 * (k1 / gauss_len) ** 2)
        k1 /= k1.sum()
        k2 = np.outer(k1, k1)
        pad = np.pad(probs, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
        out = np.zeros_like(probs)
        for dt in range(t):
            for dc in range(c):
                for i in range(h):
                    for j in range(w):
                        out[dt, i, j, dc] = np.sum(
                            pad[dt, i:i + 2 * radius + 1,
                                j:j + 2 * radius + 1, dc] * k2)
        probs = out
    probs = probs / (probs.sum(axis=(1, 2), keepdims=True) + 1e-100)

    rows = np.arange(h).reshape(1, h, 1, 1)
    cols = np.arange(w).reshape(1, 1, w, 1)
    mu_r = (probs * rows).sum(axis=(1, 2))
    mu_c = (probs * cols).sum(axis=(1, 2))
    return np.stack([mu_r, mu_c], axis=-1), probs


def test_gaussian_kernel_matches_scipy_logic():
    k = np.asarray(gaussian_kernel_1d(2.0, truncate=1.0))
    assert k.shape == (5,)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    assert k[2] == k.max()


def test_softargmax_matches_numpy(rng):
    scmap = rng.normal(size=(2, 9, 11, 3)).astype(np.float32) * 3
    mu, probs = softargmax_2d(jnp.asarray(scmap), gamma=1.0, gauss_len=2.0)
    mu_np, probs_np = np_softargmax(scmap.astype(np.float64), 1.0, 2.0)
    # float32 two-pass separable conv vs float64 direct 2-D conv
    np.testing.assert_allclose(np.asarray(mu), mu_np, rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(probs), probs_np, rtol=5e-3, atol=1e-4)


def test_softargmax_peaked_map_recovers_location():
    h, w = 32, 24
    scmap = np.full((1, h, w, 1), -10.0, np.float32)
    scmap[0, 20, 7, 0] = 10.0
    mu, _ = softargmax_2d(jnp.asarray(scmap), gamma=1.0, gauss_len=1.0)
    np.testing.assert_allclose(np.asarray(mu)[0, 0], [20.0, 7.0], atol=0.1)


def test_gauss_len_below_one_is_identity_smoothing(rng):
    # radius = int(0.5) = 0 -> no smoothing applied
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    y = gaussian_smooth_2d(x, 0.5)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_coords_to_pixels_stride_offset():
    mu = jnp.asarray([[[2.0, 3.0]]])
    px = coords_to_pixels(mu, 8.0)
    np.testing.assert_allclose(np.asarray(px), [[[20.0, 28.0]]])
