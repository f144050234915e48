"""On-device (XLA) keypoint-aware augmentation.

TPU-first counterpart of ``data/augment.py``: when training images live in
HBM (``train/device_data.py`` pools), augmentation must run on device —
host-side cv2 would force a full-resolution H2D round trip every iteration
(the dominant cost on PCIe, catastrophic over a dev tunnel). Everything here
is branchless and static-shape so it compiles into the training step:

* one fused inverse-affine bilinear resample implements scale jitter /
  random crop / horizontal flip / rotation / crop-and-pad, with an optional
  elastic displacement field folded into the same gather;
* photometric ops (motion blur, coarse dropout, additive gaussian noise)
  follow as elementwise/small-stencil work XLA fuses away;
* keypoints are transformed by the forward affine; joints leaving the
  canvas are marked absent, matching the host pipeline.

Per-op application gates are Bernoulli draws blended into the *parameters*
(identity when off), so one compiled program serves every iteration.

Capability parity with the reference's imgaug pipeline (ref:
src/deepgraphpose/models/fitdgp_util.py:412-451: Fliplr, +/-10 deg rotate,
MotionBlur k=3, CoarseDropout (0,0.02)/(0.01,0.05), ElasticTransformation
sigma=5 alpha<=10, AdditiveGaussianNoise 0.01*255, CropAndPad (-0.3,0.1)
p=0.4) plus the default loader's scale jitter (ref:
pose_defaultdataset.py:132-135). Deviations — the first two shared with
data/augment.py's host implementation: elastic displacement does not move
keypoints (sub-pixel at the reference's settings); out-of-image samples
are zero-filled (cv2 BORDER_CONSTANT) rather than reflected; crop-and-pad
folds into the single geometric warp and therefore precedes the
photometric ops (the host applies it last), and additive noise is always
channel-shared (the host draws per-channel with p=0.5); crop-and-pad is
modeled as a single symmetric center scale, while imgaug's
CropAndPad(percent=(-0.3, 0.1)) samples each side independently by default
(anisotropic crop plus translation) — the device version draws one
percentage, so its crops are isotropic and centered.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class DeviceAugmentConfig:
    """Static augmentation parameters (hashable; closed over by jit)."""

    apply_prob: float = 0.8
    # geometric
    scale_jitter: tuple = (1.0, 1.0)   # (lo, up) relative to the canvas
    flip: bool = True
    rotate_deg: float = 10.0
    crop_pad_percent: tuple = (-0.3, 0.1)
    crop_pad_prob: float = 0.4
    elastic_alpha: float = 10.0
    elastic_cell: int = 12             # displacement-field grid spacing (px)
    # photometric
    motion_blur: bool = True
    dropout_frac: tuple = (0.0, 0.02)
    dropout_cell: int = 16             # static dropout grid spacing (px)
    noise_scale: float = 0.01 * 255.0
    # TPU-friendly multi-pass warp (row takes + bounded stencils) instead of
    # the one-shot per-pixel gather — ~10x faster on v5e at full Reaching
    # resolution (per-pixel gathers are the slowest primitive on TPU); the
    # image is resampled once per stage, so edges are marginally softer
    # than the single-gather path (irrelevant for augmentation).
    fast_warp: bool = True

    @classmethod
    def reference(cls, scale_jitter: tuple = (1.0, 1.0)):
        """The reference's step-2 pipeline settings (build_aug)."""
        return cls(scale_jitter=scale_jitter)

    @classmethod
    def jitter_only(cls, lo: float, up: float):
        """Step-0 default-loader semantics: scale jitter, nothing else
        (ref: pose_defaultdataset.py:132-135; no imgaug in fit_dlc)."""
        return cls(apply_prob=0.0, scale_jitter=(lo, up), flip=False,
                   rotate_deg=0.0, crop_pad_prob=0.0, elastic_alpha=0.0,
                   motion_blur=False, dropout_frac=(0.0, 0.0),
                   noise_scale=0.0)


def _affine_params(key, cfg: DeviceAugmentConfig, b: int, hw: tuple,
                   content_wh, gate):
    """Per-sample forward affine  p_out = A @ p + t  (pixel x,y coords).

    Composition (host order, data/augment.py augment_one): scale jitter with
    top-left placement / random crop, then flip and rotation about the
    canvas center, then crop-and-pad as a center scale.
    """
    h, w = hw
    ks = jax.random.split(key, 7)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0

    # --- scale jitter + random crop translation (step-0 semantics) ---
    lo, up = cfg.scale_jitter
    s = jax.random.uniform(ks[0], (b,), minval=lo, maxval=up)
    s = jnp.where(gate > 0, s, 1.0)
    # content scaled by s from the top-left corner; when it overflows the
    # canvas, crop a random window (translation in [W - s*w_c, 0])
    u = jax.random.uniform(ks[1], (b, 2))
    over = jnp.minimum(0.0, jnp.stack(
        [w - s * content_wh[:, 0], h - s * content_wh[:, 1]], axis=-1))
    t_crop = u * over

    # --- flip about the canvas center ---
    if cfg.flip:
        do_flip = (jax.random.uniform(ks[2], (b,)) < cfg.apply_prob * 0.5)
        fx = jnp.where(jnp.logical_and(do_flip, gate > 0), -1.0, 1.0)
    else:
        fx = jnp.ones((b,))

    # --- rotation about the canvas center ---
    ang = jax.random.uniform(ks[3], (b,), minval=-cfg.rotate_deg,
                             maxval=cfg.rotate_deg)
    do_rot = (jax.random.uniform(ks[4], (b,)) < cfg.apply_prob)
    ang = jnp.where(jnp.logical_and(do_rot, gate > 0), ang, 0.0)
    th = jnp.deg2rad(ang)
    c, sn = jnp.cos(th), jnp.sin(th)

    # --- crop-and-pad: center scale by 1/(1+pct), keep_size ---
    pct = jax.random.uniform(ks[5], (b,),
                             minval=cfg.crop_pad_percent[0],
                             maxval=cfg.crop_pad_percent[1])
    do_cp = (jax.random.uniform(ks[6], (b,)) < cfg.crop_pad_prob)
    sc = jnp.where(jnp.logical_and(do_cp, gate > 0),
                   1.0 / (1.0 + pct), 1.0)

    # forward affine: p1 = s*p + t_crop
    #                 p2 = center + Rot @ Flip @ (p1 - center)
    #                 p3 = center + sc * (p2 - center)
    # A = sc * Rot @ Flip * s ;  t follows by composing the offsets
    a11 = sc * c * fx * s
    a12 = sc * (-sn) * s
    a21 = sc * sn * fx * s
    a22 = sc * c * s
    A = jnp.stack([jnp.stack([a11, a12], -1),
                   jnp.stack([a21, a22], -1)], -2)        # (b, 2, 2)
    ctr = jnp.array([cx, cy])
    # offset: apply composition to t_crop and centers
    #   p2 = R F (s p + t_crop - ctr) + ctr ; p3 = sc (p2 - ctr) + ctr
    RF = jnp.stack([jnp.stack([c * fx, -sn], -1),
                    jnp.stack([sn * fx, c], -1)], -2)      # (b, 2, 2)
    t = sc[:, None] * jnp.einsum("bij,bj->bi", RF, t_crop - ctr) + ctr
    # decomposed form for the fast multi-pass warp: A = sigma * R(th) * F
    comps = dict(sigma=sc * s, fx=fx, th=th)
    return A, t, comps


def _inverse_affine(A, t):
    det = A[:, 0, 0] * A[:, 1, 1] - A[:, 0, 1] * A[:, 1, 0]
    det = jnp.where(jnp.abs(det) < 1e-8, 1e-8, det)
    inv = jnp.stack([
        jnp.stack([A[:, 1, 1], -A[:, 0, 1]], -1),
        jnp.stack([-A[:, 1, 0], A[:, 0, 0]], -1)], -2) / det[:, None, None]
    return inv, t


def _bilinear_gather(images, xs, ys):
    """Sample images (B,H,W,C) at float coords xs/ys (B,H,W); OOB -> 0.

    Four flattened ``jnp.take`` gathers — the TPU-friendly formulation (one
    big gather beats a vmapped per-pixel dynamic_slice by orders of
    magnitude; cf. infer/dynamic.py's whole-batch slice note).
    """
    b, h, w, ch = images.shape
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    valid = ((xs >= 0) & (xs <= w - 1) & (ys >= 0) & (ys <= h - 1))

    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)

    flat = images.reshape(b, h * w, ch)

    def take(yi, xi):
        idx = yi * w + xi                      # (B,H,W)
        return jnp.take_along_axis(
            flat, idx.reshape(b, h * w, 1), axis=1).reshape(b, h, w, ch)

    v00 = take(y0i, x0i)
    v01 = take(y0i, x1i)
    v10 = take(y1i, x0i)
    v11 = take(y1i, x1i)
    wx = wx[..., None]
    wy = wy[..., None]
    out = ((1 - wy) * ((1 - wx) * v00 + wx * v01)
           + wy * ((1 - wx) * v10 + wx * v11))
    return out * valid[..., None]


def _resample_rows(images, pos):
    """1-D bilinear resample along axis 1: out[b, r] = img[b, pos[b, r]].

    One flattened ``jnp.take`` of whole contiguous rows (W*C elements each)
    — the fast gather shape on TPU. OOB positions produce zeros.
    """
    b, h, w, c = images.shape
    n_out = pos.shape[1]
    p0 = jnp.floor(pos)
    f = (pos - p0)[..., None, None]
    valid0 = (p0 >= 0) & (p0 <= h - 1)
    valid1 = (p0 + 1 >= 0) & (p0 + 1 <= h - 1)
    i0 = jnp.clip(p0.astype(jnp.int32), 0, h - 1)
    i1 = jnp.clip(i0 + 1, 0, h - 1)
    flat = images.reshape(b * h, w * c)
    base = (jnp.arange(b, dtype=jnp.int32) * h)[:, None]
    r0 = jnp.take(flat, (base + i0).reshape(-1), axis=0).reshape(b, n_out, w, c)
    r1 = jnp.take(flat, (base + i1).reshape(-1), axis=0).reshape(b, n_out, w, c)
    return ((1 - f) * r0 * valid0[..., None, None]
            + f * r1 * valid1[..., None, None])


def _scale_flip_pass(images, pos_y, pos_x):
    """Separable resample: out[b, r, c] = img[b, pos_y[b,r], pos_x[b,c]]."""
    mid = _resample_rows(images, pos_y)
    mid = jnp.swapaxes(mid, 1, 2)
    mid = _resample_rows(mid, pos_x)
    return jnp.swapaxes(mid, 1, 2)


def _stencil_shear_x(img, off, k2: int, block: int = 8):
    """out[b, r, c] = img[b, r, c - off[b, r]] (bilinear), |off| <= k2.

    Bounded stencils: sums of shifted slices with per-row weights —
    streaming VPU work, no gathers. Large offsets use a two-level
    decomposition (whole-``block`` one-hot shift, then a small fractional
    stencil) so both the tap count and the compile-time graph stay at
    O(k2/block + block) instead of O(k2).
    """
    b, h, w, c = img.shape

    def small(img_, off_, kk):
        padded = jnp.pad(img_, ((0, 0), (0, 0), (kk + 1, kk + 1), (0, 0)))
        out = jnp.zeros_like(img_)
        for k in range(2 * kk + 2):
            wk = jnp.maximum(0.0, 1.0 - jnp.abs((k - kk - 1) + off_))
            out = out + wk[:, :, None, None] * padded[:, :, k:k + w, :]
        return out

    if k2 <= block:
        return small(img, off, k2)

    m = jnp.round(off / block)                 # whole-block shift count
    rem = off - m * block                      # |rem| <= block/2 + 0.5
    n_blocks = -(-k2 // block)
    padded = jnp.pad(img, ((0, 0), (0, 0),
                           (n_blocks * block,) * 2, (0, 0)))
    out = jnp.zeros_like(img)
    for j in range(-n_blocks, n_blocks + 1):
        # out1[r, c] = img[r, c - j*block] where m_r == j
        sel = (jnp.abs(m - j) < 0.5).astype(img.dtype)
        start = (n_blocks - j) * block
        out = out + sel[:, :, None, None] * padded[:, :, start:start + w, :]
    return small(out, rem, block // 2 + 1)


def _rotate_shears(images, th, k2x: int, k2y: int):
    """Rotate about the canvas center via the 3-shear (Paeth) decomposition:
    Shx(-tan(th/2)) . Shy(sin th) . Shx(-tan(th/2)). Each shear is a
    bounded stencil, so rotation costs streaming adds instead of gathers."""
    b, h, w, c = images.shape
    cy = (h - 1) / 2.0
    cx = (w - 1) / 2.0
    alpha = -jnp.tan(th / 2.0)            # (b,)
    beta = jnp.sin(th)
    rows = jnp.arange(h, dtype=jnp.float32) - cy
    cols = jnp.arange(w, dtype=jnp.float32) - cx
    off_x = alpha[:, None] * rows[None, :]           # (b, h)
    off_y = beta[:, None] * cols[None, :]            # (b, w)
    x1 = _stencil_shear_x(images, off_x, k2x)
    x1t = jnp.swapaxes(x1, 1, 2)
    yt = _stencil_shear_x(x1t, off_y, k2y)
    x2 = jnp.swapaxes(yt, 1, 2)
    return _stencil_shear_x(x2, off_x, k2x)


def _stencil_displace(img, d, k2: int, axis: int):
    """Sample img at position + d along axis (1=vertical, 2=horizontal):
    out[.., i, ..] = img[.., i + d, ..] bilinear, |d| <= k2. Bounded
    stencil with per-pixel triangle weights computed on the fly."""
    b, h, w, c = img.shape
    pad_cfg = [(0, 0), (0, 0), (0, 0), (0, 0)]
    pad_cfg[axis] = (k2 + 1, k2 + 1)
    padded = jnp.pad(img, pad_cfg)
    out = jnp.zeros_like(img)
    n = img.shape[axis]
    for k in range(2 * k2 + 2):
        wk = jnp.maximum(0.0, 1.0 - jnp.abs((k - k2 - 1) - d))  # (b, h, w)
        sl = [slice(None)] * 4
        sl[axis] = slice(k, k + n)
        out = out + wk[..., None] * padded[tuple(sl)]
    return out


def _fast_warp(images, comps, t, cfg: DeviceAugmentConfig, elastic):
    """Multi-pass TPU warp equal (up to per-stage resampling) to sampling
    at ``A^-1 (q - t) + elastic``:

      stage S: combined scale (sigma) + flip + translation — two row-take
               resamples (A = sigma R F with scalar sigma commuting past R);
      stage R: rotation about the center via 3 stencil shears;
      stage E: elastic displacement via 2 bounded per-pixel stencils
               (applied in output coords, i.e. the random field is drawn in
               the post-affine frame rather than the gather path's
               pre-affine frame — equivalent in distribution).
    """
    b, h, w, _ = images.shape
    ctr = jnp.array([(w - 1) / 2.0, (h - 1) / 2.0])
    sigma, fx, th = comps["sigma"], comps["fx"], comps["th"]

    # u0 = ctr - R^-1 ctr + R^-1 t  (so that stage_R(stage_S(I)) == A-warp)
    cth, sth = jnp.cos(-th), jnp.sin(-th)
    def rinv(v):                                        # (b, 2) -> (b, 2)
        return jnp.stack([cth * v[..., 0] - sth * v[..., 1],
                          sth * v[..., 0] + cth * v[..., 1]], -1)
    u0 = ctr - rinv(jnp.broadcast_to(ctr, (b, 2))) + rinv(t)

    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    pos_x = fx[:, None] * (xs[None, :] - u0[:, 0:1]) / sigma[:, None]
    pos_y = (ys[None, :] - u0[:, 1:2]) / sigma[:, None]
    out = _scale_flip_pass(images, pos_y, pos_x)

    if cfg.rotate_deg > 0:
        thm = np.deg2rad(cfg.rotate_deg)
        k2x = int(np.ceil(np.tan(thm / 2.0) * (h / 2.0))) + 1
        k2y = int(np.ceil(np.sin(thm) * (w / 2.0))) + 1
        out = _rotate_shears(out, th, k2x, k2y)

    if elastic is not None:
        k2e = int(np.ceil(cfg.elastic_alpha)) + 1
        out = _stencil_displace(out, elastic[..., 1], k2e, axis=1)
        out = _stencil_displace(out, elastic[..., 0], k2e, axis=2)
    return out


def _elastic_field(key, cfg: DeviceAugmentConfig, b: int, hw: tuple, gate):
    """Smooth per-sample displacement field (B,H,W,2), zero when gated off."""
    h, w = hw
    gh = max(2, -(-h // cfg.elastic_cell) + 1)
    gw = max(2, -(-w // cfg.elastic_cell) + 1)
    k1, k2, k3 = jax.random.split(key, 3)
    coarse = jax.random.uniform(k1, (b, gh, gw, 2), minval=-1.0, maxval=1.0)
    field = jax.image.resize(coarse, (b, h, w, 2), method="bilinear")
    alpha = jax.random.uniform(k2, (b,), minval=0.0,
                               maxval=cfg.elastic_alpha)
    on = (jax.random.uniform(k3, (b,)) < cfg.apply_prob)
    alpha = jnp.where(jnp.logical_and(on, gate > 0), alpha, 0.0)
    return field * alpha[:, None, None, None]


def _motion_blur(key, cfg: DeviceAugmentConfig, images, gate):
    """3x3 directional blur with a random angle, as 9 shifted adds."""
    b = images.shape[0]
    k1, k2 = jax.random.split(key)
    ang = jax.random.uniform(k1, (b,), minval=-90.0, maxval=90.0)
    on = (jax.random.uniform(k2, (b,)) < cfg.apply_prob)
    th = jnp.deg2rad(ang)
    dx, dy = jnp.cos(th), jnp.sin(th)
    # weight of cell offset o: on the line through the center along (dx,dy)
    offs = jnp.array([(oy, ox) for oy in (-1, 0, 1) for ox in (-1, 0, 1)],
                     jnp.float32)                                   # (9, 2)
    perp = jnp.abs(offs[None, :, 0] * dx[:, None]
                   - offs[None, :, 1] * dy[:, None])                # (b, 9)
    wgt = jnp.maximum(0.0, 1.0 - perp)
    wgt = wgt / jnp.sum(wgt, axis=1, keepdims=True)
    ident = jnp.zeros((9,)).at[4].set(1.0)
    wgt = jnp.where(jnp.logical_and(on, gate > 0)[:, None], wgt,
                    ident[None, :])
    padded = jnp.pad(images, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h, w = images.shape[1:3]
    out = jnp.zeros_like(images)
    for i, (oy, ox) in enumerate([(oy, ox) for oy in (-1, 0, 1)
                                  for ox in (-1, 0, 1)]):
        out = out + (wgt[:, i, None, None, None]
                     * padded[:, 1 + oy:h + 1 + oy, 1 + ox:w + 1 + ox, :])
    return out


def _coarse_dropout(key, cfg: DeviceAugmentConfig, images, gate):
    b, h, w, _ = images.shape
    gh = -(-h // cfg.dropout_cell)
    gw = -(-w // cfg.dropout_cell)
    k1, k2, k3 = jax.random.split(key, 3)
    frac = jax.random.uniform(k1, (b, 1, 1), minval=cfg.dropout_frac[0],
                              maxval=cfg.dropout_frac[1])
    on = (jax.random.uniform(k2, (b,)) < cfg.apply_prob)
    frac = jnp.where(jnp.logical_and(on, gate > 0)[:, None, None], frac, 0.0)
    keep = (jax.random.uniform(k3, (b, gh, gw)) >= frac)
    mask = jnp.repeat(jnp.repeat(keep, cfg.dropout_cell, axis=1),
                      cfg.dropout_cell, axis=2)[:, :h, :w]
    return images * mask[..., None]


def _noise(key, cfg: DeviceAugmentConfig, images, gate):
    b = images.shape[0]
    k1, k2, k3 = jax.random.split(key, 3)
    scale = jax.random.uniform(k1, (b,), minval=0.0, maxval=cfg.noise_scale)
    on = (jax.random.uniform(k2, (b,)) < cfg.apply_prob)
    scale = jnp.where(jnp.logical_and(on, gate > 0), scale, 0.0)
    n = jax.random.normal(k3, images.shape[:3] + (1,))
    return jnp.clip(images + scale[:, None, None, None] * n, 0.0, 255.0)


def augment_batch(key, images, coords_xy, present, cfg: DeviceAugmentConfig,
                  gate=None, content_wh=None):
    """Augment a batch entirely on device.

    Args:
      key: PRNG key.
      images: (B,H,W,3) uint8 or float32, [0,255].
      coords_xy: (B,nj,2) pixel (x,y) keypoints.
      present: (B,nj) bool/float visibility.
      cfg: static DeviceAugmentConfig.
      gate: optional (B,) {0,1} — samples with gate 0 pass through untouched
        (e.g. hidden frames: the reference augments visible frames only,
        ref: fitdgp.py:779).
      content_wh: optional (B,2) content (w,h) per canvas for the random
        crop bound; defaults to the full canvas.

    Returns (images_f32, coords_xy, present_f32).
    """
    b, h, w, _ = images.shape
    images = images.astype(jnp.float32)
    if gate is None:
        gate = jnp.ones((b,))
    gate = gate.astype(jnp.float32)
    if content_wh is None:
        content_wh = jnp.broadcast_to(
            jnp.array([float(w), float(h)]), (b, 2))

    k_aff, k_el, k_mb, k_do, k_no = jax.random.split(key, 5)
    A, t, comps = _affine_params(k_aff, cfg, b, (h, w), content_wh, gate)

    elastic = (_elastic_field(k_el, cfg, b, (h, w), gate)
               if cfg.elastic_alpha > 0 else None)
    if cfg.fast_warp:
        out = _fast_warp(images, comps, t, cfg, elastic)
    else:
        # one-shot per-pixel gather: src = A^-1 @ (dst - t) (+ elastic)
        Ainv, _ = _inverse_affine(A, t)
        ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                              jnp.arange(w, dtype=jnp.float32), indexing="ij")
        dst = jnp.stack([xs, ys], axis=-1)                     # (H,W,2)
        rel = dst[None] - t[:, None, None, :]                  # (B,H,W,2)
        src = jnp.einsum("bij,bhwj->bhwi", Ainv, rel)
        if elastic is not None:
            src = src + elastic
        out = _bilinear_gather(images, src[..., 0], src[..., 1])

    if cfg.motion_blur:
        out = _motion_blur(k_mb, cfg, out, gate)
    if cfg.dropout_frac[1] > 0:
        out = _coarse_dropout(k_do, cfg, out, gate)
    if cfg.noise_scale > 0:
        out = _noise(k_no, cfg, out, gate)

    # keypoints: forward affine; OOB -> absent
    kp = (jnp.einsum("bij,bnj->bni", A, coords_xy.astype(jnp.float32))
          + t[:, None, :])
    inb = ((kp[..., 0] >= 0) & (kp[..., 0] <= w - 1)
           & (kp[..., 1] >= 0) & (kp[..., 1] <= h - 1))
    present = present.astype(jnp.float32) * inb.astype(jnp.float32)
    return out, kp, present
