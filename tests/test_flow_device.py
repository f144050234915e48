"""On-device pyramidal Lucas-Kanade flow (ops/flow_device.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from deepgraphpose_tpu.ops.flow_device import flow_magnitude_device


def _moving_blobs(t=3, h=96, w=112, shift=(4.0, 2.0), seed=0):
    """Smooth random texture translating by `shift` (dx, dy) per frame."""
    rng = np.random.default_rng(seed)
    big = rng.uniform(0, 255, (h // 8 + 6, w // 8 + 6))
    import cv2

    tex = cv2.resize(big, ((w // 8 + 6) * 8, (h // 8 + 6) * 8),
                     interpolation=cv2.INTER_CUBIC)
    frames = np.zeros((t, h, w, 3), np.uint8)
    for i in range(t):
        ox = int(round(8 + i * shift[0]))
        oy = int(round(8 + i * shift[1]))
        crop = tex[oy:oy + h, ox:ox + w]
        frames[i] = np.clip(crop, 0, 255).astype(np.uint8)[..., None]
    return frames


def test_static_scene_is_near_zero():
    frames = _moving_blobs(shift=(0.0, 0.0))
    mag = np.asarray(flow_magnitude_device(jnp.asarray(frames)))
    assert mag.shape == (2, 96, 112)
    assert mag.mean() < 0.3


def test_translation_magnitude_recovered():
    """Content moving left by (dx, dy) -> flow magnitude ~ |dx| + |dy| in
    the interior (boundaries excluded)."""
    dx, dy = 4.0, 2.0
    frames = _moving_blobs(shift=(dx, dy))
    mag = np.asarray(flow_magnitude_device(jnp.asarray(frames)))
    interior = mag[:, 24:-24, 24:-24]
    want = dx + dy
    assert want * 0.6 < interior.mean() < want * 1.4, interior.mean()


def test_correlates_with_host_farneback():
    """Spatial agreement with the host (reference-semantics) Farneback
    magnitude on nonuniform motion."""
    cv2 = pytest.importorskip("cv2")
    del cv2
    from deepgraphpose_tpu.data.flow import flow_magnitude_sequence

    h, w = 96, 112
    rng = np.random.default_rng(1)
    base = rng.uniform(0, 255, (h // 8 + 4, w // 8 + 4))
    import cv2 as cv

    tex = cv.resize(base, (w + 32, h + 32), interpolation=cv.INTER_CUBIC)
    frames = np.zeros((2, h, w, 3), np.uint8)
    frames[0] = np.clip(tex[8:8 + h, 8:8 + w], 0, 255)[..., None]
    # right half moves by (5, 0), left half static
    moved = tex.copy()
    moved[:, (w + 32) // 2:] = np.roll(tex, 5, axis=1)[:, (w + 32) // 2:]
    frames[1] = np.clip(moved[8:8 + h, 8:8 + w], 0, 255)[..., None]

    dev = np.asarray(flow_magnitude_device(jnp.asarray(frames)))[0]
    host = flow_magnitude_sequence(frames)[0]
    a = dev[16:-16, 16:-16].ravel()
    b = host[16:-16, 16:-16].ravel()
    r = np.corrcoef(a, b)[0, 1]
    assert r > 0.5, r
    # moving half reads clearly higher than the static half on both
    assert dev[16:-16, 64:-16].mean() > 3 * max(dev[16:-16, 16:48].mean(),
                                                0.05)
