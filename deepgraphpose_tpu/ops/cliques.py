"""Spatial (skeleton) and temporal (smoothness) clique potentials.

ref: src/deepgraphpose/models/fitdgp.py:1062-1076 (spatial),
1079-1124 (temporal with optical-flow gating).

TPU-first notes:
* All shapes static; padded frames are removed from the sums via masks.
* The reference gates the temporal clique by the mean optical-flow magnitude
  inside a box around each joint pair, computed with
  ``tf.image.crop_and_resize`` (a full HxW bilinear resample per box!).
  Here the box mean comes from a summed-area table (2-D cumsum) with bilinear
  corner interpolation — O(HW) once per frame pair instead of O(HW) per box,
  then O(1) per box.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spatial_clique_loss(
    coords_px: jnp.ndarray,
    S0: jnp.ndarray,
    ws: jnp.ndarray,
    ws_max: jnp.ndarray,
    frame_mask: jnp.ndarray,
    scoremap_hw: tuple[int, int],
) -> jnp.ndarray:
    """Hinged limb-length penalty.

    Args:
      coords_px: (T, nj, 2) marker (row, col) pixel coords (already
        ``* stride + stride/2``).
      S0: (nl, nj) limb incidence matrix (+1/-1).
      ws: (nl,) per-limb weights (cfg.ws / mean limb length,
        ref fitdgp.py:888-892).
      ws_max: (nl,) per-limb hinge bounds (max observed length * cfg.ws_max).
      frame_mask: (T,) {0,1} — zero for padded frames.
      scoremap_hw: (H, W) of the scoremap, used as a normalizer.

    Returns the *unscaled* clique sum; the caller applies the population
    re-weighting (ref: fitdgp.py:1073-1075).
    """
    # (T, nl, 2) limb difference vectors; MXU-friendly einsum.
    limb_vec = jnp.einsum("lj,tjc->tlc", S0, coords_px)
    dist = jnp.sqrt(jnp.sum(jnp.square(limb_vec), axis=-1) + 1e-12)  # (T, nl)
    hinged = jax.nn.relu(dist - ws_max[None, :]) + ws_max[None, :]
    hinged = hinged * frame_mask[:, None]
    h, w = scoremap_hw
    return jnp.sum(hinged * ws[None, :]) / float(h) / float(w)


def _summed_area_table(field: jnp.ndarray) -> jnp.ndarray:
    """(P, H, W) -> (P, H+1, W+1) integral image with zero first row/col."""
    sat = jnp.cumsum(jnp.cumsum(field, axis=1), axis=2)
    sat = jnp.pad(sat, ((0, 0), (1, 0), (1, 0)))
    return sat


def _sat_lookup(sat: jnp.ndarray, r: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lookup of the integral image at fractional (r, c).

    sat: (P, H+1, W+1); r, c: (P, K) coordinates in [0, H] x [0, W].
    """
    p, hp1, wp1 = sat.shape
    r0 = jnp.clip(jnp.floor(r), 0, hp1 - 2).astype(jnp.int32)
    c0 = jnp.clip(jnp.floor(c), 0, wp1 - 2).astype(jnp.int32)
    fr = jnp.clip(r - r0, 0.0, 1.0)
    fc = jnp.clip(c - c0, 0.0, 1.0)
    pid = jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)

    def take(dr, dc):
        return sat[pid, r0 + dr, c0 + dc]

    v00, v01 = take(0, 0), take(0, 1)
    v10, v11 = take(1, 0), take(1, 1)
    top = v00 * (1 - fc) + v01 * fc
    bot = v10 * (1 - fc) + v11 * fc
    return top * (1 - fr) + bot * fr


def box_mean_flow(flow: jnp.ndarray, r_min: jnp.ndarray, c_min: jnp.ndarray,
                  r_max: jnp.ndarray, c_max: jnp.ndarray) -> jnp.ndarray:
    """Mean of ``flow`` over boxes [r_min, r_max] x [c_min, c_max].

    flow: (P, H, W) per frame-pair flow magnitude.
    box coords: (P, K) fractional pixel coordinates.
    """
    sat = _summed_area_table(flow)
    a = _sat_lookup(sat, r_min, c_min)
    b = _sat_lookup(sat, r_min, c_max)
    c_ = _sat_lookup(sat, r_max, c_min)
    d = _sat_lookup(sat, r_max, c_max)
    area = jnp.maximum((r_max - r_min) * (c_max - c_min), 1e-6)
    return (d - b - c_ + a) / area


def temporal_clique_loss(
    coords_px: jnp.ndarray,
    flow: jnp.ndarray,
    wt_batch: jnp.ndarray,
    wt_max: float,
    pair_mask: jnp.ndarray,
    scoremap_hw: tuple[int, int],
    window: float = 10.0,
) -> jnp.ndarray:
    """Flow-gated temporal smoothness penalty (ref: fitdgp.py:1079-1124).

    Args:
      coords_px: (T, nj, 2) marker (row, col) pixel coords.
      flow: (T-1, H_in, W_in) dense flow magnitude between frames t, t+1.
      wt_batch: (T-1,) temporal clique weights (wt * wt_batch_mask).
      wt_max: hinge bound for per-joint displacement.
      pair_mask: (T-1,) {0,1} — 1 when frames t, t+1 are true temporal
        neighbors in the same video (ref wt_batch_mask, dataset.py:733-735).
      scoremap_hw: (H, W) of the scoremap (normalizer).
      window: box padding around the joint pair, pixels (ref window=10).
    """
    t, nj, _ = coords_px.shape
    h_in = flow.shape[1]
    w_in = flow.shape[2]
    p0 = coords_px[:-1]  # (T-1, nj, 2)
    p1 = coords_px[1:]
    time_dif = jnp.sqrt(jnp.sum(jnp.square(p0 - p1), axis=-1) + 1e-12)  # (T-1, nj)

    r_min = jnp.maximum(jnp.minimum(p0[..., 0], p1[..., 0]) - window, 0.0)
    r_max = jnp.minimum(jnp.maximum(p0[..., 0], p1[..., 0]) + window, float(h_in))
    c_min = jnp.maximum(jnp.minimum(p0[..., 1], p1[..., 1]) - window, 0.0)
    c_max = jnp.minimum(jnp.maximum(p0[..., 1], p1[..., 1]) + window, float(w_in))

    mean_flow = box_mean_flow(flow, r_min, c_min, r_max, c_max)  # (T-1, nj)

    inv = jnp.minimum(1.0 / (mean_flow + 1e-10), 1.0)
    inv = jnp.minimum(inv ** 3, 1.0)  # ref: exp(3 * log(inv)) clipped at 1
    h, w = scoremap_hw
    gate = inv * (wt_batch * pair_mask)[:, None] / float(h) / float(w)

    hinged = (jax.nn.relu(time_dif - wt_max) + wt_max) * gate
    return jnp.sqrt(jnp.sum(jnp.square(hinged)) + 1e-20)  # ref: TF.norm(_, 2)
