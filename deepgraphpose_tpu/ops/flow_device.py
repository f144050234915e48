"""On-device dense optical flow for the temporal clique.

TPU-native stand-in for the host-side Farneback pass (ref:
src/deepgraphpose/models/fitdgp_util.py:454-467 learn_wt; host
counterpart data/flow.py): a coarse-to-fine pyramidal Lucas-Kanade
estimator in pure JAX, so the wt > 0 temporal clique can train from
device-resident frame pools without a host round trip per iteration.

The clique consumes |fx| + |fy| averaged over boxes around joint pairs
(ops/cliques.py summed-area tables), so a smooth magnitude field is what
matters, not per-pixel exactness. Design choices for the MXU/VPU:

* flow is solved on a half-resolution pyramid (levels H/8 -> H/4 -> H/2)
  and the magnitude is upsampled to full resolution — box averaging
  downstream makes full-res solving pure waste;
* window sums use separable box filters (streaming VPU work);
* inter-level warps are bilinear gathers on the small pyramid levels
  only (the expensive full-res gather never happens).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GRAY = (0.299, 0.587, 0.114)  # cv2 RGB2GRAY weights (host-path parity)


def _box(x, k: int):
    """Separable (2k+1)-box mean over the last two axes of (..., H, W)."""
    w = 2 * k + 1
    h_in, w_in = x.shape[-2], x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 2) + [(k, k), (k, k)],
                 mode="edge")
    c = jnp.cumsum(xp, axis=-2)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(1, 0), (0, 0)])
    x = (jnp.take(c, jnp.arange(w, w + h_in), axis=-2)
         - jnp.take(c, jnp.arange(0, h_in), axis=-2))
    c = jnp.cumsum(x, axis=-1)
    c = jnp.pad(c, [(0, 0)] * (x.ndim - 2) + [(0, 0), (1, 0)])
    x = (jnp.take(c, jnp.arange(w, w + w_in), axis=-1)
         - jnp.take(c, jnp.arange(0, w_in), axis=-1))
    return x / (w * w)


def _down2(x):
    """2x average-pool (..., H, W) -> (..., H//2, W//2)."""
    h2, w2 = x.shape[-2] // 2, x.shape[-1] // 2
    x = x[..., : h2 * 2, : w2 * 2]
    x = x.reshape(*x.shape[:-2], h2, 2, w2, 2)
    return x.mean(axis=(-3, -1))


def _warp(img, u, v):
    """Bilinear warp img (B,H,W) by flow (u, v); only runs on pyramid
    levels (<= half resolution), never at full res."""
    b, h, w = img.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    sx = jnp.clip(xs[None] + u, 0.0, w - 1.0)
    sy = jnp.clip(ys[None] + v, 0.0, h - 1.0)
    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    flat = img.reshape(b, h * w)

    def take(yi, xi):
        return jnp.take_along_axis(flat, (yi * w + xi).reshape(b, -1),
                                   axis=1).reshape(b, h, w)

    return ((1 - fy) * ((1 - fx) * take(y0i, x0i) + fx * take(y0i, x1i))
            + fy * ((1 - fx) * take(y1i, x0i) + fx * take(y1i, x1i)))


def _grad_central(g, axis: int):
    """Edge-replicated central difference (no wrap-around at borders —
    jnp.roll would mix the opposite frame edge into border gradients)."""
    gp = jnp.pad(g, [(0, 0)] * (g.ndim + axis) + [(1, 1)]
                 + [(0, 0)] * (-axis - 1), mode="edge")
    n = g.shape[axis]
    fwd = jax.lax.slice_in_dim(gp, 2, n + 2, axis=axis)
    bwd = jax.lax.slice_in_dim(gp, 0, n, axis=axis)
    return (fwd - bwd) * 0.5


def _lk_refine(g0, g1w, u, v, win: int, eps: float):
    """One Lucas-Kanade increment on top of (u, v) (g1w pre-warped)."""
    ix = _grad_central(g0, -1)
    iy = _grad_central(g0, -2)
    it = g1w - g0
    sxx = _box(ix * ix, win) + eps
    syy = _box(iy * iy, win) + eps
    sxy = _box(ix * iy, win)
    sxt = _box(ix * it, win)
    syt = _box(iy * it, win)
    det = sxx * syy - sxy * sxy
    det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
    du = (-syy * sxt + sxy * syt) / det
    dv = (sxy * sxt - sxx * syt) / det
    # clamp increments: LK linearization is only valid for small motion
    lim = float(win)
    return u + jnp.clip(du, -lim, lim), v + jnp.clip(dv, -lim, lim)


def flow_magnitude_device(frames, levels: int = 3, win: int = 7,
                          iters: int = 2, eps: float = 1e-3):
    """(T, H, W, 3) uint8/float RGB -> (T-1, H, W) float32 |fx| + |fy|.

    Same contract as data/flow.py::flow_magnitude_sequence (ref:
    fitdgp_util.py:454-467), computed on device. Flow units are full-res
    pixels.
    """
    frames = frames.astype(jnp.float32)
    t = frames.shape[0]
    if t < 2:
        return jnp.zeros((0, frames.shape[1], frames.shape[2]), jnp.float32)
    gray = (frames[..., 0] * _GRAY[0] + frames[..., 1] * _GRAY[1]
            + frames[..., 2] * _GRAY[2])
    g0 = gray[:-1]
    g1 = gray[1:]

    # pyramid from half resolution down
    p0 = [_down2(g0)]
    p1 = [_down2(g1)]
    for _ in range(levels - 1):
        p0.append(_down2(p0[-1]))
        p1.append(_down2(p1[-1]))

    u = jnp.zeros_like(p0[-1])
    v = jnp.zeros_like(p0[-1])
    for lvl in range(levels - 1, -1, -1):
        a0, a1 = p0[lvl], p1[lvl]
        if u.shape != a0.shape:
            u = 2.0 * jax.image.resize(u, a0.shape, "bilinear")
            v = 2.0 * jax.image.resize(v, a0.shape, "bilinear")
        for _ in range(iters):
            a1w = _warp(a1, u, v)
            u, v = _lk_refine(a0, a1w, u, v, win, eps)

    mag = jnp.abs(u) + jnp.abs(v)
    # solved at half res: scale units and upsample to full res
    full = g0.shape[-2:]
    return 2.0 * jax.image.resize(mag, (t - 1, *full), "bilinear")
