"""The DeepGraphPose objective, as one fused, static-shape XLA computation.

Mirrors the semantics of the reference graph builder ``dgp_loss``
(ref: src/deepgraphpose/models/fitdgp.py:848-1144) with a TPU-first redesign:

* The reference feeds dynamic-length marker index lists
  (``visible_marker_pl`` / ``hidden_marker_pl``) and gathers; here every
  tensor has a static shape and markers are selected with {0,1} masks, so the
  whole objective compiles once and runs fully on the MXU/VPU.
* Gaussian targets, locref targets and masks are rasterized **on device**
  (see ops/targets.py) instead of host Python loops.
* Optical-flow box means use summed-area tables instead of per-box
  ``crop_and_resize`` (see ops/cliques.py).

Marker convention: a batch holds T frames x nj joints = N = T*nj markers,
flattened row-major (frame-major, ref: fitdgp_util.py:104-143). A marker is
*visible* iff its frame is labeled and its coordinate is not NaN; NaN markers
of labeled frames are treated as hidden (ref: fitdgp_util.py:77-101).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from deepgraphpose_tpu.ops import cliques, losses, softargmax, targets as targets_ops


@dataclasses.dataclass(frozen=True)
class DGPLossParams:
    """Static hyperparameters + dataset-level constants for the objective.

    The population counts are dataset-level constants folded into the
    compiled program (ref: fitdgp.py:869-872, 1027-1035).
    """

    nj: int
    stride: float
    gamma: float
    gauss_len: float
    lengthscale: float
    pos_dist_thresh: float
    locref_stdev: float
    locref_loss_weight: float
    locref_huber_loss: bool
    wn_visible: float
    wn_hidden: float
    wt: float
    wt_max: float
    gm2: int
    gm3: int
    n_visible_frames_total: float
    n_hidden_frames_total: float
    S0: Any = None          # (nl, nj) numpy incidence matrix
    ws: Any = None          # (nl,) numpy per-limb weights
    ws_max: Any = None      # (nl,) numpy per-limb hinge bounds

    @property
    def n_limbs(self) -> int:
        return 0 if self.S0 is None else int(np.asarray(self.S0).shape[0])


def compute_spatial_bounds(labels_list: list[np.ndarray], S0: np.ndarray,
                           stride: float, ws: float, ws_max_mult: float
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Per-limb clique weights and hinge bounds from the labeled data.

    Reproduces the reference's exact bookkeeping (including its quirk of
    adding stride/2 to limb *differences* before taking max/mean), ref:
    fitdgp.py:874-892.

    labels_list: per-video (n_i, nj, 2) labeled coords in scoremap space.
    Returns (ws_vec, ws_max_vec), each (n_limbs,).
    """
    nl, nj = S0.shape
    if nl == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.float32)
    joint_loc_full = np.empty((0, nj, 2))
    for j in labels_list:
        if len(j) > 0:
            joint_loc_full = np.vstack((j, joint_loc_full))
    if len(joint_loc_full) == 0:
        return (np.full((nl,), ws, np.float32),
                np.full((nl,), 1e6, np.float32))

    flat = np.copy(joint_loc_full).swapaxes(1, 2).reshape(-1, nj)
    flat[np.isnan(flat)] = 1e10
    limb = flat @ S0.T
    limb[np.abs(limb) > 1e5] = 0
    limb = limb.reshape(joint_loc_full.shape[0], 2, -1)
    limb = np.sqrt(np.sum(np.square(limb), axis=1))  # (n, nl)
    limb = limb.T * stride + stride / 2.0            # (nl, n)
    ws_max_vec = np.max(np.nan_to_num(limb), axis=1) * ws_max_mult
    mean_len = np.true_divide(limb.sum(1), np.maximum((limb != 0).sum(1), 1))
    ws_vec = 1.0 / (np.nan_to_num(mean_len) + 1e-20) * ws
    return ws_vec.astype(np.float32), ws_max_vec.astype(np.float32)


def _masked_weighted_ce(ce: jnp.ndarray, weights: jnp.ndarray,
                        mask: jnp.ndarray) -> jnp.ndarray:
    """sum(ce * w * m) / count((w * m) != 0) over (N, H, W) maps.

    Mirrors TF's SUM_BY_NONZERO_WEIGHTS on a gathered subset with per-marker
    weights (ref: fitdgp.py:1026-1031 gm3==3 branch).
    """
    n, h, w = ce.shape
    wm = weights * mask
    total = jnp.sum(ce * wm[:, None, None])
    count = jnp.sum((wm != 0).astype(ce.dtype)) * h * w
    return jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)


def dgp_loss(
    pred: jnp.ndarray,
    locref_pred: jnp.ndarray,
    batch: dict,
    p: DGPLossParams,
) -> dict:
    """Compute all DGP losses for one batch.

    Args:
      pred: (T, H, W, nj) part-prediction logits.
      locref_pred: (T, H, W, 2*nj) location-refinement outputs.
      batch: dict with
        targets:       (T, nj, 2) label coords, scoremap (row, col), NaN->0.
        visible_mask:  (T*nj,) {0,1} visible markers.
        hidden_mask:   (T*nj,) {0,1} hidden markers.
        frame_mask:    (T,)    {0,1} real (non-padded) frames.
        wt_batch:      (T-1,)  temporal weights (wt per pair).
        pair_mask:     (T-1,)  {0,1} true temporal neighbors.
        flow:          (T-1, H_in, W_in) flow magnitude (zeros if wt == 0).
      p: DGPLossParams.

    Returns dict with per-term losses, 'total_loss' and 'total_loss_visible'.
    """
    t, h, w, nj = pred.shape
    dtype = pred.dtype
    n = t * nj

    targets = jnp.nan_to_num(batch["targets"].astype(dtype))         # (T,nj,2)
    visible_mask = batch["visible_mask"].astype(dtype)               # (N,)
    hidden_mask = batch["hidden_mask"].astype(dtype)
    frame_mask = batch["frame_mask"].astype(dtype)

    # --- soft-argmax decode (ref: fitdgp.py:949) ---
    mu, _ = softargmax.softargmax_2d(pred, gamma=p.gamma, gauss_len=p.gauss_len)
    mu_flat = mu.reshape(n, 2)
    targets_flat = targets.reshape(n, 2)

    # --- combine: label coords where visible, predicted mu elsewhere
    # (ref: combine_all_marker, fitdgp_util.py:232-272) ---
    combined = jnp.where(visible_mask[:, None] > 0, targets_flat, mu_flat)

    # --- Gaussian target maps, peak-normalized (ref: fitdgp.py:964-976) ---
    gauss = targets_ops.gaussian_target_maps(combined, h, w, p.lengthscale)  # (N,H,W)

    # marker-major logits (ref reshapes (T,H,W,nj)->(N,H,W), fitdgp.py:983-987)
    pred_m = jnp.transpose(pred, (0, 3, 1, 2)).reshape(n, h, w)

    n_vis_b = jnp.sum(visible_mask)
    n_hid_b = jnp.sum(hidden_mask)
    # if no visible markers in batch, use the hidden count (ref: fitdgp.py:981)
    n_vis_b_safe = jnp.where(n_vis_b > 0, n_vis_b, n_hid_b)

    out: dict = {}

    ce = losses.sigmoid_cross_entropy_elements(gauss, pred_m)
    out["visible_loss_pred"] = losses.masked_mean_per_map(ce, visible_mask)

    # --- hidden CE with optional confidence scaling (ref: fitdgp.py:994-1039)
    gauss_h = gauss
    pred_h_for_ce = pred_m
    pgm = None
    if p.gm2 in (1, 2):
        sig = jax.nn.sigmoid(pred_m)
        pgm = jnp.max(sig, axis=(1, 2))                       # (N,)
        scaled = sig * pgm[:, None, None]
        pred_h_scaled1 = (-jnp.log(1.0 - scaled + 1e-20)
                          + jnp.log(scaled + 1e-20))
        if p.gm2 == 1:
            gauss_h = gauss * pgm[:, None, None]
        pred_h_for_ce = pred_h_scaled1
    elif p.gm2 != 0:
        raise NotImplementedError(f"gm2={p.gm2}")

    pop_scale = 0.0
    if p.n_hidden_frames_total > 0:
        pop_scale = (p.n_visible_frames_total / p.n_hidden_frames_total)
    batch_scale = jnp.where(
        n_vis_b_safe > 0, n_hid_b / jnp.maximum(n_vis_b_safe, 1.0), 0.0)
    hidden_scale = pop_scale * batch_scale * (p.wn_hidden / p.wn_visible)

    if p.gm3 == 3:
        if pgm is None:
            sig = jax.nn.sigmoid(pred_m)
            pgm = jnp.max(sig, axis=(1, 2))
            scaled = sig * pgm[:, None, None]
            pred_h_for_ce = (-jnp.log(1.0 - scaled + 1e-20)
                             + jnp.log(scaled + 1e-20))
        ce_h = losses.sigmoid_cross_entropy_elements(gauss_h, pred_h_for_ce)
        out["hidden_loss_pred"] = _masked_weighted_ce(
            ce_h, 1.0 - pgm, hidden_mask) * hidden_scale
    elif p.gm3 == 0:
        # gm3==0 uses the *raw* logits even when gm2 scaled the targets
        # (ref: fitdgp.py:1032-1035).
        ce_h = losses.sigmoid_cross_entropy_elements(gauss_h, pred_m)
        out["hidden_loss_pred"] = losses.masked_mean_per_map(
            ce_h, hidden_mask) * hidden_scale
    else:
        raise NotImplementedError(f"gm3={p.gm3}")

    total = out["visible_loss_pred"] + out["hidden_loss_pred"]

    # --- locref Huber on visible markers (ref: fitdgp.py:1041-1055) ---
    _, locref_map, locref_mask = targets_ops.locref_targets_from_scoremap_coords(
        targets, visible_mask.reshape(t, nj), h, w,
        p.stride, p.pos_dist_thresh, p.locref_stdev)
    # (T,H,W,2nj) -> (N,H,W,2) marker-major
    def to_marker_major(x):
        return jnp.transpose(x.reshape(t, h, w, nj, 2), (0, 3, 1, 2, 4)).reshape(n, h, w, 2)

    lr_pred = to_marker_major(locref_pred)
    lr_map = to_marker_major(locref_map)
    lr_mask = to_marker_major(locref_mask) * visible_mask[:, None, None, None]
    if p.locref_huber_loss:
        out["visible_loss_locref"] = p.locref_loss_weight * losses.huber_loss(
            lr_map, lr_pred, lr_mask)
    else:
        out["visible_loss_locref"] = p.locref_loss_weight * losses.mse_loss(
            lr_map, lr_pred, lr_mask)
    total = total + out["visible_loss_locref"]

    # --- cliques on combined coords in pixel space (ref: fitdgp.py:1062-1124)
    n_total = p.n_visible_frames_total + p.n_hidden_frames_total
    clique_scale = jnp.where(
        n_vis_b_safe > 0,
        p.n_visible_frames_total / jnp.maximum(n_vis_b_safe, 1.0)
        / max(n_total, 1.0) / p.wn_visible, 0.0)

    combined_px = combined.reshape(t, nj, 2) * p.stride + 0.5 * p.stride
    if p.n_limbs > 0:
        ws_loss = cliques.spatial_clique_loss(
            combined_px, jnp.asarray(p.S0, dtype), jnp.asarray(p.ws, dtype),
            jnp.asarray(p.ws_max, dtype), frame_mask, (h, w))
        out["ws_loss"] = ws_loss * clique_scale
        total = total + out["ws_loss"]

    if p.wt > 0:
        wt_loss = cliques.temporal_clique_loss(
            combined_px, batch["flow"].astype(dtype), batch["wt_batch"].astype(dtype),
            p.wt_max, batch["pair_mask"].astype(dtype), (h, w))
        out["wt_loss"] = wt_loss * clique_scale
        total = total + out["wt_loss"]

    out["total_loss"] = total
    out["total_loss_visible"] = (out["visible_loss_pred"]
                                 + out["visible_loss_locref"])
    return out
