"""Augmentation keypoint bookkeeping (SURVEY 'hard parts': the flip/scale
coordinate transforms are easy to get silently wrong)."""

import numpy as np

from deepgraphpose_tpu.data.augment import Augmenter


class _Cfg:
    stride = 8.0


def _bright_dot_image(h, w, x, y):
    img = np.zeros((h, w, 3), np.float32)
    img[max(y - 1, 0):y + 2, max(x - 1, 0):x + 2] = 255.0
    return img


def test_flip_moves_keypoints_with_pixels():
    img = _bright_dot_image(32, 48, x=10, y=20)
    kps = np.array([[10.0, 20.0]])
    out, k = Augmenter._flip(img, kps)
    assert k[0, 0] == (48 - 1) - 10 and k[0, 1] == 20
    # the bright pixel moved to the keypoint's new location
    assert out[20, int(k[0, 0])].max() == 255.0


def test_rotate_keypoint_follows_content():
    img = _bright_dot_image(64, 64, x=45, y=20)
    kps = np.array([[45.0, 20.0]])
    out, k = Augmenter._rotate(img, kps, deg=10.0)
    x, y = int(round(k[0, 0])), int(round(k[0, 1]))
    # content around the transformed keypoint is still bright
    assert out[max(y - 2, 0):y + 3, max(x - 2, 0):x + 3].max() > 200


def test_crop_pad_keeps_keypoint_on_content(rng):
    aug = Augmenter(crop_pad_percent=(-0.3, -0.3))  # deterministic crop
    img = _bright_dot_image(40, 40, x=22, y=18)
    kps = np.array([[22.0, 18.0]])
    out, k = aug._crop_pad(img, kps, rng)
    assert out.shape == img.shape  # keep_size
    x, y = int(round(k[0, 0])), int(round(k[0, 1]))
    assert out[max(y - 3, 0):y + 4, max(x - 3, 0):x + 4].max() > 150

    aug2 = Augmenter(crop_pad_percent=(0.2, 0.2))   # deterministic pad
    out2, k2 = aug2._crop_pad(img, kps, rng)
    x2, y2 = int(round(k2[0, 0])), int(round(k2[0, 1]))
    assert out2[max(y2 - 3, 0):y2 + 4, max(x2 - 3, 0):x2 + 4].max() > 150


def test_photometric_ops_preserve_shape_and_range(rng):
    aug = Augmenter()
    img = rng.uniform(0, 255, (24, 24, 3)).astype(np.float32)
    for op in (aug._motion_blur, aug._coarse_dropout, aug._elastic,
               aug._noise):
        out = op(img, rng)
        assert out.shape == img.shape
        assert out.min() >= 0 and out.max() <= 255.5


def test_nan_keypoints_stay_nan(rng):
    aug = Augmenter(apply_prob=1.0, crop_pad_prob=1.0)
    img = rng.uniform(0, 255, (32, 32, 3)).astype(np.float32)
    kps = np.array([[10.0, 12.0], [np.nan, np.nan]])
    _, out = aug.augment_one(img, kps, rng)
    assert np.isnan(out[1]).all()
    assert np.isfinite(out[0]).all()


def test_batch_call_only_touches_visible_frames(rng):
    aug = Augmenter(apply_prob=1.0, crop_pad_prob=1.0)
    images = rng.uniform(0, 255, (3, 32, 32, 3)).astype(np.float32)
    coords = rng.uniform(0, 3, (3, 2, 2)).astype(np.float32)
    visible = np.array([True, False, True])
    out_imgs, out_rc = aug(images, coords, visible, _Cfg(), rng)
    np.testing.assert_array_equal(out_imgs[1], images[1])
    np.testing.assert_array_equal(out_rc[1], coords[1])
    assert not np.array_equal(out_imgs[0], images[0])


def test_roundtrip_rc_pixel_convention(rng):
    """With all geometric ops disabled, rc coords survive the pixel
    round-trip exactly."""
    aug = Augmenter(apply_prob=0.0, crop_pad_prob=0.0)
    images = rng.uniform(0, 255, (2, 16, 16, 3)).astype(np.float32)
    coords = rng.uniform(0, 1.9, (2, 2, 2)).astype(np.float32)
    _, out_rc = aug(images, coords, np.array([True, True]), _Cfg(), rng)
    np.testing.assert_allclose(out_rc, coords, atol=1e-6)
