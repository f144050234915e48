"""DLC-style decoders: argmax + locref refinement, and top-k multi-output.

ref: deeplabcut/pose_estimation_tensorflow/nnet/predict.py —
extract_cnn_output (45-60: sigmoid scmap, locref * locref_stdev),
argmax_pose_predict (62-77: argmax + offset, pixel = loc*stride +
stride/2 + offset, exported (x, y)), get_top_values / multi_pose_predict
(79-116, 186-216: k peaks per joint for num_outputs > 1).

These complement the DGP soft-argmax decode (ops.softargmax): DLC's own
analyze/evaluate paths use the hard argmax, and the reference's
``evaluate_dgp`` compares both modes. Everything is batched, fused XLA —
no per-joint python loops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def extract_cnn_output(part_pred: jnp.ndarray,
                       locref: jnp.ndarray | None,
                       locref_stdev: float = 7.2801) -> tuple:
    """(sigmoid scoremap, locref offsets in px) from raw head outputs.

    part_pred: (B, H, W, nj) logits; locref: (B, H, W, 2*nj) or None.
    locref comes back as (B, H, W, nj, 2) * locref_stdev
    (ref: predict.py:45-60).
    """
    scmap = jax.nn.sigmoid(part_pred)
    if locref is None:
        return scmap, None
    b, h, w, _ = locref.shape
    nj = part_pred.shape[-1]
    off = locref.reshape(b, h, w, nj, 2) * locref_stdev
    return scmap, off


def argmax_pose_decode(part_pred: jnp.ndarray,
                       locref: jnp.ndarray | None,
                       stride: float = 8.0,
                       locref_stdev: float = 7.2801) -> jnp.ndarray:
    """Batched argmax + locref decode -> (B, nj, 3) [x, y, likelihood].

    Matches argmax_pose_predict (ref: predict.py:62-77): pixel =
    argmax_loc * stride + stride/2 + offset, offset stored (dx, dy) in
    locref and applied reversed onto (row, col).
    """
    scmap, off = extract_cnn_output(part_pred, locref, locref_stdev)
    b, h, w, nj = scmap.shape
    flat = scmap.reshape(b, h * w, nj)
    idx = jnp.argmax(flat, axis=1)                      # (B, nj)
    rows = (idx // w).astype(jnp.float32)
    cols = (idx % w).astype(jnp.float32)
    lik = jnp.take_along_axis(flat, idx[:, None, :], axis=1)[:, 0]  # (B, nj)

    x = cols * stride + 0.5 * stride
    y = rows * stride + 0.5 * stride
    if off is not None:
        bi = jax.lax.broadcasted_iota(jnp.int32, (b, nj), 0)
        ji = jax.lax.broadcasted_iota(jnp.int32, (b, nj), 1)
        o = off[bi, (idx // w), (idx % w), ji]          # (B, nj, 2) = (dx, dy)
        x = x + o[..., 0]
        y = y + o[..., 1]
    return jnp.stack([x, y, lik], axis=-1)


def get_top_values(scmap: jnp.ndarray, n_top: int) -> tuple:
    """Top-k scoremap peaks per joint (ref: predict.py:186-199).

    scmap: (B, H, W, nj) -> (Y, X) each (B, n_top, nj) integer locations,
    ordered best-first (the reference returns ascending and flips; here
    jax.lax.top_k is already descending).
    """
    b, h, w, nj = scmap.shape
    flat = scmap.reshape(b, h * w, nj).transpose(0, 2, 1)  # (B, nj, HW)
    _, idx = jax.lax.top_k(flat, n_top)                    # (B, nj, k)
    idx = idx.transpose(0, 2, 1)                           # (B, k, nj)
    return idx // w, idx % w


def multi_pose_decode(part_pred: jnp.ndarray, locref: jnp.ndarray | None,
                      num_outputs: int, stride: float = 8.0,
                      locref_stdev: float = 7.2801) -> jnp.ndarray:
    """Top-k decode -> (B, nj, num_outputs, 3) [x, y, likelihood] per peak.

    ref: predict.py:79-116 (multi_pose_predict), the num_outputs > 1 path
    of analyze_videos.
    """
    scmap, off = extract_cnn_output(part_pred, locref, locref_stdev)
    b, h, w, nj = scmap.shape
    Y, X = get_top_values(scmap, num_outputs)              # (B, k, nj)
    bi = jax.lax.broadcasted_iota(jnp.int32, Y.shape, 0)
    ji = jax.lax.broadcasted_iota(jnp.int32, Y.shape, 2)
    lik = scmap[bi, Y, X, ji]
    x = X.astype(jnp.float32) * stride + 0.5 * stride
    y = Y.astype(jnp.float32) * stride + 0.5 * stride
    if off is not None:
        o = off[bi, Y, X, ji]                              # (B, k, nj, 2)
        x = x + o[..., 0]
        y = y + o[..., 1]
    out = jnp.stack([x, y, lik], axis=-1)                  # (B, k, nj, 3)
    return out.transpose(0, 2, 1, 3)                       # (B, nj, k, 3)
