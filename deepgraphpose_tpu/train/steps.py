"""Jitted train-step factories.

One compiled XLA program per training phase; everything — target
rasterization, the full DGP objective, the optimizer update — runs on
device, with `donate_argnums` so parameter/optimizer buffers update in
place in HBM.

Optimizers mirror the reference: SGD + momentum 0.9
(ref: train.py:94-113 get_optimizer, fitdgp.py:709-713) with global-norm-10
gradient clipping for the DGP steps (fitdgp.py:712). The reference defines
slim L2 regularizers but never adds them to the optimized loss
(pose_net.py:194 leaves get_total_loss commented out), so no weight decay
here either.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.ops import losses as losses_ops
from deepgraphpose_tpu.ops import targets as targets_ops
from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams, dgp_loss


def make_optimizer(lr: float | Callable, momentum: float = 0.9,
                   clip_norm: float | None = None) -> optax.GradientTransformation:
    parts = []
    if clip_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_norm))
    parts.append(optax.sgd(learning_rate=lr, momentum=momentum))
    return optax.chain(*parts)


def piecewise_lr(multi_step: list) -> Callable:
    """DLC multi_step schedule: [[lr, until_iter], ...]
    (ref: train.py:34-44 LearningRate)."""
    bounds = []
    rates = []
    for lr, until in multi_step:
        rates.append(float(lr))
        bounds.append(int(until))

    def schedule(count):
        lr = rates[-1]
        for i in reversed(range(len(bounds))):
            lr = jnp.where(count < bounds[i], rates[i], lr)
        return lr

    return schedule


def dlc_supervised_loss(heads: dict, coords_xy: jnp.ndarray,
                        present: jnp.ndarray, cfg: PoseConfig,
                        scale: jnp.ndarray | float = 1.0) -> dict:
    """Plain DLC loss: scoremap sigmoid CE + locref Huber.

    ref: pose_net.py:165-196 (train). Targets are rasterized on device from
    pixel coords (already in input-image space, i.e. post global_scale).
    """
    pred = heads["part_pred"]
    t, h, w, nj = pred.shape
    scmap, locref_map, locref_mask = targets_ops.dlc_scoremap_targets(
        coords_xy, present, h, w, cfg.stride, cfg.pos_dist_thresh,
        cfg.locref_stdev, scale=scale)
    out = {}
    out["part_loss"] = losses_ops.sigmoid_cross_entropy(scmap, pred)
    total = out["part_loss"]
    if cfg.intermediate_supervision and "part_pred_interm" in heads:
        out["part_loss_interm"] = losses_ops.sigmoid_cross_entropy(
            scmap, heads["part_pred_interm"])
        total = total + out["part_loss_interm"]
    if cfg.location_refinement:
        if cfg.locref_huber_loss:
            out["locref_loss"] = cfg.locref_loss_weight * losses_ops.huber_loss(
                locref_map, heads["locref"], locref_mask)
        else:
            out["locref_loss"] = cfg.locref_loss_weight * losses_ops.mse_loss(
                locref_map, heads["locref"], locref_mask)
        total = total + out["locref_loss"]
    out["total_loss"] = total
    return out


def _apply_model(model, p, rest, images, bn_train: bool):
    """Forward pass; with bn_train, batch-stat BN + updated stats aux."""
    if bn_train:
        heads, updated = model.apply({"params": p, **rest}, images,
                                     train=True, mutable=["batch_stats"])
        return heads, updated
    return model.apply({"params": p, **rest}, images), None


def make_dlc_train_step(model, cfg: PoseConfig,
                        tx: optax.GradientTransformation,
                        bn_train: bool = False):
    """Supervised (step-0) train step: (variables, opt_state, batch) -> ...

    ``bn_train=True`` normalizes by batch statistics and EWMA-updates the
    ``batch_stats`` collection each step — the from-scratch mode (the
    reference always trains with frozen BN from an ImageNet warm start,
    ref: pose_net.py:52)."""

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, images, coords_xy, present, it):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            heads, updated = _apply_model(model, p, rest, images, bn_train)
            out = dlc_supervised_loss(heads, coords_xy, present, cfg)
            return out["total_loss"], (out, updated)

        grads, (out, updated) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params, **rest}
        if updated is not None:
            new_vars["batch_stats"] = updated["batch_stats"]
        return new_vars, opt_state, out

    return step


def make_dgp_train_step(model, params_obj: DGPLossParams,
                        tx: optax.GradientTransformation,
                        visible_only: bool = False,
                        bn_train: bool = False):
    """DGP train step over a fixed-shape masked batch.

    visible_only=True optimizes ``total_loss_visible`` (step 1 semantics,
    ref: fitdgp.py:416); False optimizes the full objective (step 2).
    ``bn_train`` as in :func:`make_dlc_train_step`.
    """
    key = "total_loss_visible" if visible_only else "total_loss"

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(variables, opt_state, images, batch):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            heads, updated = _apply_model(model, p, rest, images, bn_train)
            out = dgp_loss(heads["part_pred"], heads["locref"], batch,
                           params_obj)
            return out[key], (out, updated)

        grads, (out, updated) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params, **rest}
        if updated is not None:
            new_vars["batch_stats"] = updated["batch_stats"]
        return new_vars, opt_state, out

    return step
