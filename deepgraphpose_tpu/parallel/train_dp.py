"""Data-parallel DGP training over a device mesh.

Unit of data parallelism: one DGP *window* (a contiguous batch of frames
from one video). A global batch of G windows, each T frames, is sharded
G-over-devices; each device evaluates the full masked DGP objective on its
windows (temporal pairs never cross a window, so no halo is needed for
training), losses are averaged and gradients all-reduce over ICI — all
emitted by XLA from jit + NamedSharding, no hand-written collectives
(SURVEY §2d TPU-native equivalent of the unused tower helper
helpers/utils_tf.py:81-209).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams, dgp_loss
from deepgraphpose_tpu.parallel.mesh import DATA_AXIS


def make_dp_dgp_train_step(model, params_obj: DGPLossParams,
                           tx: optax.GradientTransformation, mesh,
                           visible_only: bool = False):
    """Jitted DP train step.

    Inputs:
      images: (G, T, H, W, 3) float32 — G sharded over the data axis.
      batch:  pytree with leading axis G (targets, masks, flow, ...).
    Parameters and optimizer state are replicated.
    """
    key = "total_loss_visible" if visible_only else "total_loss"
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))

    def window_loss(params, rest, images, batch):
        heads = model.apply({"params": params, **rest}, images)
        out = dgp_loss(heads["part_pred"], heads["locref"], batch, params_obj)
        return out[key], out

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, shard, shard),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1))
    def step(variables, opt_state, images, batch):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def mean_loss(p):
            losses, outs = jax.vmap(
                lambda im, b: window_loss(p, rest, im, b))(images, batch)
            return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, outs)

        grads, out = jax.grad(mean_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return {"params": params, **rest}, opt_state, out

    return step


def make_dp_pooled_dgp_train_step(model, params_obj: DGPLossParams,
                                  tx: optax.GradientTransformation, mesh,
                                  aug_cfg=None, visible_only: bool = False,
                                  bn_train: bool = False,
                                  device_flow: bool = False):
    """DP train step over a replicated HBM frame pool.

    Composes train/device_data.py's pool design with data parallelism: the
    pool (N,H,W,3 uint8) is replicated over the mesh, per-window frame rows
    (G,T) and the small batch tensors shard over the data axis, and each
    device gathers + (optionally) augments its windows locally — the
    per-step host->device traffic is G*T row indices and a PRNG key.

    ``bn_train=True`` normalizes by per-window batch statistics and updates
    ``batch_stats`` with the across-window mean (XLA emits the cross-device
    mean as a collective over the data axis) — the from-scratch recipe under
    DP. ``device_flow=True`` computes each window's temporal-clique flow
    locally (ops/flow_device.py pyramidal LK), so wt > 0 trains multi-chip
    without host Farneback; mutually exclusive with ``aug_cfg`` exactly like
    the single-device step (ref gate: fitdgp.py:777-779).

    step(variables, opt_state, pool, rows (G,T) int32, batch (G-leading
    pytree), keys (G,2) uint32) -> (variables, opt_state, mean-out).
    """
    from deepgraphpose_tpu.train.device_data import augment_dgp_window
    from deepgraphpose_tpu.train.steps import _apply_model

    if device_flow and aug_cfg is not None:
        raise ValueError("make_dp_pooled_dgp_train_step: aug_cfg must be "
                         "None when device_flow=True (flow needs "
                         "unaugmented, temporally coherent frames)")
    key = "total_loss_visible" if visible_only else "total_loss"
    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))

    def window_loss(params, rest, pool, rows, batch, k):
        images = jnp.take(pool, rows, axis=0)
        if aug_cfg is not None:
            images, batch = augment_dgp_window(
                k, images, batch, aug_cfg, params_obj.stride, params_obj.nj)
        if device_flow:
            from deepgraphpose_tpu.ops.flow_device import \
                flow_magnitude_device

            batch = dict(batch, flow=flow_magnitude_device(images))
        heads, updated = _apply_model(model, params, rest, images, bn_train)
        out = dgp_loss(heads["part_pred"], heads["locref"], batch, params_obj)
        return out[key], (out, updated)

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, shard, shard, shard),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1))
    def step(variables, opt_state, pool, rows, batch, keys):
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def mean_loss(p):
            losses, (outs, updated) = jax.vmap(
                lambda r, b, k: window_loss(p, rest, pool, r, b, k))(
                    rows, batch, keys)
            mean = jax.tree_util.tree_map(
                lambda x: jnp.mean(x, axis=0), (outs, updated))
            return jnp.mean(losses), mean

        grads, (out, updated) = jax.grad(mean_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params, **rest}
        if updated is not None:
            new_vars["batch_stats"] = updated["batch_stats"]
        return new_vars, opt_state, out

    return step


def make_dp_pooled_dlc_train_step(model, cfg, tx: optax.GradientTransformation,
                                  mesh, aug_cfg=None, bn_train: bool = False):
    """DP step-0 train step over a replicated labeled-image pool.

    Same signature/semantics as device_data.make_pooled_dlc_train_step with
    a global batch: the pool tensors are replicated, ``idxs`` (G*bs,) is
    sharded over the data axis, and the supervised loss's batch mean (and,
    with ``bn_train``, the BN batch statistics) becomes a cross-device
    collective emitted by XLA — bitwise the same objective as one device
    with the global batch.

    step(variables, opt_state, pool_images, pool_coords, pool_present,
         pool_content, idxs, key, it)
    """
    from deepgraphpose_tpu.ops.augment_device import augment_batch
    from deepgraphpose_tpu.train.steps import _apply_model, \
        dlc_supervised_loss

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, repl, repl, repl, shard, repl, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1))
    def step(variables, opt_state, pool_images, pool_coords, pool_present,
             pool_content, idxs, key, it):
        images = jnp.take(pool_images, idxs, axis=0)
        coords = jnp.take(pool_coords, idxs, axis=0)
        present = jnp.take(pool_present, idxs, axis=0)
        if aug_cfg is not None:
            content = jnp.take(pool_content, idxs, axis=0)
            images, coords, present = augment_batch(
                key, images, coords, present, aug_cfg, content_wh=content)

        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            heads, updated = _apply_model(model, p, rest, images, bn_train)
            out = dlc_supervised_loss(heads, coords, present, cfg)
            return out["total_loss"], (out, updated)

        grads, (out, updated) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params, **rest}
        if updated is not None:
            new_vars["batch_stats"] = updated["batch_stats"]
        return new_vars, opt_state, out

    return step


def make_dp_infer_fn(model, cfg, mesh):
    """Sharded batched inference: frames sharded over the data axis.

    Decode has no cross-frame coupling, so time-sharding a video across
    chips is embarrassingly parallel (SURVEY §5 long-context note); mu and
    likelihood gather back replicated.
    """
    from deepgraphpose_tpu.infer.predict import infer_forward

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(functools.partial(infer_forward, model, cfg),
                   in_shardings=(repl, shard), out_shardings=(shard, shard))
