"""Device-side target rasterization.

The reference rasterizes scoremap / location-refinement targets on the host
with per-pixel Python loops (ref: deeplabcut/pose_estimation_tensorflow/
dataset/pose_defaultdataset.py:220-266 compute_target_part_scoremap, and
src/deepgraphpose/dataset.py:246-271 coord2map) and builds Gaussian target
maps in-graph (ref: src/deepgraphpose/models/fitdgp.py:964-976).

TPU-first redesign: all targets are vectorized broadcasts over a static
(H, W) grid, computed *on device inside the jitted train step* directly from
keypoint coordinates — the host ships only (T, nj, 2) coords, cutting
host→device traffic and removing the Python rasterization bottleneck.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_target_maps(coords: jnp.ndarray, height: int, width: int,
                         lengthscale: float) -> jnp.ndarray:
    """Per-marker Gaussian bump maps, peak-normalized to 1.

    Args:
      coords: (N, 2) target (row, col) coordinates in scoremap space.
      height, width: scoremap dims.
      lengthscale: Gaussian lengthscale (ref cfg.lengthscale).

    Returns:
      (N, height, width) maps ``exp(-((r-r0)^2+(c-c0)^2)/(2*ls^2)) / (max+1e-5)``
      (ref: fitdgp.py:968-976 — note the reference divides by max + 1e-5).
    """
    dtype = coords.dtype
    rows = jax.lax.broadcasted_iota(dtype, (1, height, width), 1)
    cols = jax.lax.broadcasted_iota(dtype, (1, height, width), 2)
    dr = rows - coords[:, 0][:, None, None]
    dc = cols - coords[:, 1][:, None, None]
    g = jnp.exp(-(dr * dr + dc * dc) / (2.0 * lengthscale ** 2))
    peak = jnp.max(g, axis=(1, 2), keepdims=True) + 1e-5
    return g / peak


def dlc_scoremap_targets(
    coords_xy: jnp.ndarray,
    present: jnp.ndarray,
    height: int,
    width: int,
    stride: float,
    pos_dist_thresh: float,
    locref_stdev: float,
    scale: float = 1.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized DLC disk scoremap + locref targets.

    Args:
      coords_xy: (T, nj, 2) keypoint (x, y) *pixel* coordinates (input space,
        already multiplied by any global scale). NaNs allowed where absent.
      present: (T, nj) bool/float — joint labeled in this frame.
      height, width: scoremap dims.
      stride: total network stride (8).
      pos_dist_thresh: disk radius in *scoremap* units before scaling
        (ref: pose_defaultdataset.py:221 ``dist_thresh = pos_dist_thresh * scale``).
      locref_stdev: locref normalization (offsets scaled by 1/locref_stdev).
      scale: the global/jitter scale applied to the image.

    Returns:
      scmap:       (T, H, W, nj)    binary disk targets
      locref_map:  (T, H, W, nj*2)  (dx, dy) * (1/locref_stdev) inside disk
      locref_mask: (T, H, W, nj*2)  disk indicator
    """
    dtype = jnp.result_type(coords_xy.dtype, jnp.float32)
    coords_xy = jnp.nan_to_num(coords_xy.astype(dtype), nan=-1e6)
    present = present.astype(dtype)

    dist_thresh = pos_dist_thresh * scale
    half_stride = stride / 2.0
    # Grid point centers in pixel space (ref: pose_defaultdataset.py:246-250).
    pt_y = jax.lax.broadcasted_iota(dtype, (1, height, width, 1), 1) * stride + half_stride
    pt_x = jax.lax.broadcasted_iota(dtype, (1, height, width, 1), 2) * stride + half_stride

    jx = coords_xy[..., 0][:, None, None, :]  # (T,1,1,nj)
    jy = coords_xy[..., 1][:, None, None, :]
    dx = jx - pt_x
    dy = jy - pt_y
    dist_sq = dx * dx + dy * dy
    inside = (dist_sq <= dist_thresh * dist_thresh).astype(dtype)
    inside = inside * present[:, None, None, :]

    locref_scale = 1.0 / locref_stdev
    lx = dx * locref_scale * inside
    ly = dy * locref_scale * inside
    # interleave to channel layout [dx_0, dy_0, dx_1, dy_1, ...]
    t = coords_xy.shape[0]
    nj = coords_xy.shape[1]
    locref_map = jnp.stack([lx, ly], axis=-1).reshape(t, height, width, nj * 2)
    locref_mask = jnp.stack([inside, inside], axis=-1).reshape(t, height, width, nj * 2)
    return inside, locref_map, locref_mask


def locref_targets_from_scoremap_coords(
    coords_rc: jnp.ndarray,
    present: jnp.ndarray,
    height: int,
    width: int,
    stride: float,
    pos_dist_thresh: float,
    locref_stdev: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DGP's coord2map: targets given (row, col) *scoremap-space* coords.

    The reference converts scoremap coords back to pixels with the hard-coded
    ``* 8 + 4`` (ref: src/deepgraphpose/dataset.py:246-271, line 252) then
    rasterizes with DLC's routine; here the stride is a parameter.
    """
    coords_xy = jnp.stack(
        [coords_rc[..., 1] * stride + stride / 2.0,
         coords_rc[..., 0] * stride + stride / 2.0], axis=-1)
    return dlc_scoremap_targets(
        coords_xy, present, height, width, stride,
        pos_dist_thresh, locref_stdev, scale=1.0)
