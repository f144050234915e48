"""On-device augmentation (ops/augment_device.py) semantics tests."""

import jax
import jax.numpy as jnp
import numpy as np

from deepgraphpose_tpu.ops.augment_device import (DeviceAugmentConfig,
                                                  augment_batch)


def _rand_batch(b=3, h=32, w=40, nj=4, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 255, (b, h, w, 3), dtype=np.uint8)
    coords = rng.uniform(2, [[w - 3, h - 3]], (b, nj, 2)).astype(np.float32)
    present = np.ones((b, nj), np.float32)
    return jnp.asarray(imgs), jnp.asarray(coords), jnp.asarray(present)


def test_identity_config_passthrough():
    imgs, coords, present = _rand_batch()
    cfg = DeviceAugmentConfig.jitter_only(1.0, 1.0)
    out, kp, pres = augment_batch(jax.random.PRNGKey(0), imgs, coords,
                                  present, cfg)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(imgs, np.float32), atol=1e-3)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(coords), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(pres), np.asarray(present))


def test_gate_zero_passthrough():
    imgs, coords, present = _rand_batch(b=4)
    cfg = DeviceAugmentConfig.reference(scale_jitter=(0.5, 2.0))
    gate = jnp.array([0.0, 0.0, 0.0, 0.0])
    out, kp, pres = augment_batch(jax.random.PRNGKey(1), imgs, coords,
                                  present, cfg, gate=gate)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(imgs, np.float32), atol=1e-3)
    np.testing.assert_allclose(np.asarray(kp), np.asarray(coords), atol=1e-3)


def test_flip_mirrors_image_and_coords():
    imgs, coords, present = _rand_batch(b=16)
    cfg = DeviceAugmentConfig(apply_prob=1.0, scale_jitter=(1.0, 1.0),
                              flip=True, rotate_deg=0.0, crop_pad_prob=0.0,
                              elastic_alpha=0.0, motion_blur=False,
                              dropout_frac=(0.0, 0.0), noise_scale=0.0)
    out, kp, _ = augment_batch(jax.random.PRNGKey(2), imgs, coords,
                               present, cfg)
    out = np.asarray(out)
    kp = np.asarray(kp)
    w = imgs.shape[2]
    n_flipped = 0
    for i in range(imgs.shape[0]):
        orig = np.asarray(imgs[i], np.float32)
        if np.allclose(out[i], orig, atol=0.51):
            np.testing.assert_allclose(kp[i], np.asarray(coords[i]),
                                       atol=1e-3)
        else:
            np.testing.assert_allclose(out[i], orig[:, ::-1], atol=0.51)
            np.testing.assert_allclose(kp[i, :, 0],
                                       (w - 1) - np.asarray(coords[i, :, 0]),
                                       atol=1e-2)
            n_flipped += 1
    assert 0 < n_flipped < imgs.shape[0]  # ~half, apply_prob*0.5


def test_scale_down_places_top_left_and_halves_coords():
    imgs, coords, present = _rand_batch(b=2, h=32, w=32)
    cfg = DeviceAugmentConfig.jitter_only(0.5, 0.5)
    out, kp, _ = augment_batch(jax.random.PRNGKey(3), imgs, coords,
                               present, cfg)
    out = np.asarray(out)
    # content shrinks into the top-left quadrant; bottom-right is empty
    assert np.abs(out[:, 20:, 20:]).max() < 1e-3
    assert np.abs(out[:, :14, :14]).sum() > 0
    np.testing.assert_allclose(np.asarray(kp), np.asarray(coords) * 0.5,
                               atol=0.5)


def test_rotation_preserves_center_distance():
    imgs, coords, present = _rand_batch(b=8, h=33, w=33)
    cfg = DeviceAugmentConfig(apply_prob=1.0, scale_jitter=(1.0, 1.0),
                              flip=False, rotate_deg=10.0, crop_pad_prob=0.0,
                              elastic_alpha=0.0, motion_blur=False,
                              dropout_frac=(0.0, 0.0), noise_scale=0.0)
    _, kp, _ = augment_batch(jax.random.PRNGKey(4), imgs, coords,
                             present, cfg)
    ctr = np.array([16.0, 16.0])
    d0 = np.linalg.norm(np.asarray(coords) - ctr, axis=-1)
    d1 = np.linalg.norm(np.asarray(kp) - ctr, axis=-1)
    np.testing.assert_allclose(d1, d0, atol=1e-2)
    # at least one sample actually rotated
    assert not np.allclose(np.asarray(kp), np.asarray(coords), atol=1e-3)


def test_out_of_canvas_joints_marked_absent():
    imgs, coords, present = _rand_batch(b=1, h=32, w=32, nj=2)
    coords = coords.at[0, 0].set(jnp.array([100.0, 5.0]))  # off-canvas
    cfg = DeviceAugmentConfig.jitter_only(1.0, 1.0)
    _, _, pres = augment_batch(jax.random.PRNGKey(5), imgs, coords,
                               present, cfg)
    assert float(pres[0, 0]) == 0.0
    assert float(pres[0, 1]) == 1.0


def test_reference_pipeline_smoke_jits():
    imgs, coords, present = _rand_batch(b=4, h=48, w=40)
    cfg = DeviceAugmentConfig.reference(scale_jitter=(0.75, 1.25))
    fn = jax.jit(lambda k, i, c, p: augment_batch(k, i, c, p, cfg))
    out, kp, pres = fn(jax.random.PRNGKey(6), imgs, coords, present)
    out = np.asarray(out)
    assert out.shape == imgs.shape
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 255.0
    assert np.all(np.isfinite(np.asarray(kp)))
    # different keys give different augmentations
    out2, _, _ = fn(jax.random.PRNGKey(7), imgs, coords, present)
    assert not np.allclose(out, np.asarray(out2))


def test_fast_warp_matches_gather_path():
    """The multi-pass stencil warp (fast_warp=True, the default) matches
    the one-shot per-pixel gather on smooth content: identical keypoint
    transforms (shared parameter draws) and close images (multi-pass
    resampling only softens edges)."""
    import dataclasses

    # smooth synthetic content: broad gaussian blobs
    b, h, w = 3, 40, 48
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.zeros((b, h, w, 3), np.float32)
    for i in range(b):
        cx, cy = 10 + 12 * i, 14 + 6 * i
        img[i] = (200 * np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                               / (2 * 8.0 ** 2)))[..., None]
    imgs = jnp.asarray(img)
    coords = jnp.asarray(
        np.stack([np.full((b,), 12.0), np.full((b,), 15.0)], -1)[:, None, :])
    present = jnp.ones((b, 1), np.float32)

    for elastic, mean_tol in ((0.0, 1.5), (5.0, 5.0)):
        # elastic measures its displacement in post-affine coords on the
        # fast path vs pre-affine on the gather path (documented); compare
        # strictly with it off, loosely with it on
        base = DeviceAugmentConfig(apply_prob=1.0, scale_jitter=(0.8, 1.2),
                                   flip=True, rotate_deg=10.0,
                                   crop_pad_prob=0.4, elastic_alpha=elastic,
                                   motion_blur=False,
                                   dropout_frac=(0.0, 0.0), noise_scale=0.0)
        outs = {}
        for fast in (True, False):
            cfg = dataclasses.replace(base, fast_warp=fast)
            outs[fast] = augment_batch(jax.random.PRNGKey(11), imgs, coords,
                                       present, cfg)
        # keypoints + presence: identical (same parameter draws, same math)
        np.testing.assert_allclose(np.asarray(outs[True][1]),
                                   np.asarray(outs[False][1]), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(outs[True][2]),
                                      np.asarray(outs[False][2]))
        a = np.asarray(outs[True][0])
        bimg = np.asarray(outs[False][0])
        # images: same warp up to resampling softness (peak intensity 200)
        assert np.mean(np.abs(a - bimg)) < mean_tol, \
            (elastic, np.mean(np.abs(a - bimg)))


def test_fast_warp_rotation_moves_content_with_coords():
    """Rotation-only fast warp: the content under a keypoint follows the
    keypoint (catches shear sign/composition errors)."""
    b, h, w = 4, 41, 41
    img = np.zeros((b, h, w, 3), np.float32)
    img[:, 8:13, 28:33] = 255.0              # blob away from the center
    coords = jnp.asarray(np.tile([[30.0, 10.0]], (b, 1))[:, None, :])
    present = jnp.ones((b, 1), np.float32)
    cfg = DeviceAugmentConfig(apply_prob=1.0, scale_jitter=(1.0, 1.0),
                              flip=False, rotate_deg=10.0,
                              crop_pad_prob=0.0, elastic_alpha=0.0,
                              motion_blur=False, dropout_frac=(0.0, 0.0),
                              noise_scale=0.0)
    out, kp, _ = augment_batch(jax.random.PRNGKey(3), jnp.asarray(img),
                               coords, present, cfg)
    out = np.asarray(out)
    kp = np.asarray(kp)
    rotated = False
    for i in range(b):
        x, y = kp[i, 0]
        if abs(x - 30.0) > 0.5 or abs(y - 10.0) > 0.5:
            rotated = True
        x0, x1 = int(max(x - 4, 0)), int(min(x + 5, w))
        y0, y1 = int(max(y - 4, 0)), int(min(y + 5, h))
        assert out[i, y0:y1, x0:x1].max() > 150, (i, x, y)
        # and the old location is (mostly) vacated when rotated
    assert rotated
