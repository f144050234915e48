"""Head-only training from precomputed backbone features.

Working TPU redesign of the reference's legacy ``preprocess/`` pipeline —
dump ResNet outputs for the labeled set, then fit the prediction layer on
those cached activations (ref: preprocess/get_morig_resnet_outputs.py,
preprocess/get_morig_prediction_layer.py, preprocess/run_pipeline.py; dead
in the shipped package — it imports a nonexistent ``PoseDataLoader``,
SURVEY §2a). Here the idea actually runs: the backbone forwards ONCE over
the labeled pool, features stay device-resident, and every optimizer step
touches only the deconv heads — orders of magnitude cheaper per iteration
than the full step, which makes head-only experiments (new joint sets,
head re-initialisation, quick adaptation on a frozen backbone) nearly
free.

Because features are cached, augmentation/scale-jitter are off by
construction (matching the reference pipeline, which dumped features of
the un-augmented labeled images).
"""

from __future__ import annotations

import time
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deepgraphpose_tpu.core import checkpoint as ckpt_lib
from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.heads import PredictionHead
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.train import steps as steps_lib
from deepgraphpose_tpu.train.steps import dlc_supervised_loss

HEAD_KEYS = ("part_pred", "locref_pred")


class HeadsModule(nn.Module):
    """The PoseModel heads alone, with identical parameter naming, so the
    trained subtree drops straight back into the full model's tree."""

    cfg: PoseConfig
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray) -> dict:
        heads = {
            "part_pred": PredictionHead(
                self.cfg.num_joints, self.cfg.deconvolutionstride,
                dtype=self.dtype, name="part_pred")(
                    features).astype(jnp.float32)}
        if self.cfg.location_refinement:
            heads["locref"] = PredictionHead(
                self.cfg.num_joints * 2, self.cfg.deconvolutionstride,
                dtype=self.dtype, name="locref_pred")(
                    features).astype(jnp.float32)
        return heads


def precompute_features(model, variables, images, chunk: int = 16):
    """Backbone features for a (N, H, W, 3) uint8/float pool, one chunked
    forward pass (ref feature dump: preprocess/get_morig_resnet_outputs.py).
    Returns a device array (N, h', w', C) in the model compute dtype."""
    fwd = jax.jit(lambda v, im: model.apply(
        v, im, return_features=True)["features"])
    n = int(images.shape[0])
    pad = (-n) % chunk
    if pad:
        images = jnp.concatenate(
            [jnp.asarray(images),
             jnp.repeat(jnp.asarray(images[-1:]), pad, axis=0)], axis=0)
    outs = [fwd(variables, jnp.asarray(images[i:i + chunk]))
            for i in range(0, n + pad, chunk)]
    return jnp.concatenate(outs, axis=0)[:n]


def fit_dlc_heads(dlcpath: str | Path = ".", shuffle: int = 1,
                  snapshot: str | None = None, maxiters: int = 5000,
                  displayiters: int = 500, saveiters: int = 0,
                  trainingsetindex: int = 0, seed: int = 0,
                  lr: float | None = None,
                  reinit_heads: bool = False,
                  debug: str = "_heads") -> Path | None:
    """Train ONLY the prediction heads on cached backbone features.

    Loads a warm start exactly like ``fit_dlc`` (``snapshot`` or the best
    available), forwards the labeled set through the frozen backbone once,
    then runs head-only supervised steps. The merged variables (untouched
    backbone + trained heads) are saved as a regular step-0 snapshot
    (suffix ``debug``, default ``"_heads"`` — the default must NOT be the
    bare step-0 namespace, or this run would silently overwrite the
    canonical ``snapshot-step0-*`` files that warm-start steps 1-2 and all
    evaluation; pass ``debug=""`` explicitly to do that on purpose), so
    every downstream consumer — fit_dgp, evaluation, analyze_videos —
    picks it up by name.

    ``reinit_heads=True`` re-initialises the head parameters first (the
    reference pipeline's use case: fit a fresh prediction layer on dumped
    features, ref: preprocess/get_morig_prediction_layer.py).
    """
    from deepgraphpose_tpu.train.fit import (_TrainLabeledImages,
                                             _warm_start, resolve_project)
    from deepgraphpose_tpu.train import device_data as dd

    proj, cfg, train_dir = resolve_project(dlcpath, shuffle,
                                           trainingsetindex)
    data = _TrainLabeledImages(proj, cfg, dlcpath, jitter=False)
    model, variables = init_model(cfg, jax.random.PRNGKey(seed),
                                  data.canvas_hw)
    if snapshot is None:
        latest = ckpt_lib.latest_snapshot(train_dir, 0)
        if latest is not None:
            snapshot = latest.name[:-len(ckpt_lib.CKPT_SUFFIX)]
    variables, warmed = _warm_start(variables, cfg, Path(train_dir),
                                    snapshot)
    if not warmed:
        print("warning: fit_dlc_heads without a trained backbone — "
              "features of a random-init frozen backbone are weak; "
              "train or import a snapshot first")
    if reinit_heads:
        fresh = init_model(cfg, jax.random.PRNGKey(seed + 1),
                           data.canvas_hw)[1]["params"]
        variables = dict(variables)
        variables["params"] = {
            k: (fresh[k] if k in HEAD_KEYS else v)
            for k, v in variables["params"].items()}

    pool = dd.LabeledImagePool(data, cfg)
    t0 = time.time()
    feats = precompute_features(model, variables, pool.images)
    feats.block_until_ready()
    print(f"fit_dlc_heads: cached {feats.shape} backbone features "
          f"({feats.nbytes / 1e6:.0f} MB in HBM, {time.time() - t0:.1f}s); "
          f"training heads only")

    heads_model = HeadsModule(cfg)
    head_params = {k: v for k, v in variables["params"].items()
                   if k in HEAD_KEYS}
    tx = steps_lib.make_optimizer(
        lr if lr is not None else steps_lib.piecewise_lr(cfg.multi_step))
    opt_state = tx.init(head_params)

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(hp, opt_state, feats_b, coords_b, present_b):
        def loss_fn(p):
            heads = heads_model.apply({"params": p}, feats_b)
            out = dlc_supervised_loss(heads, coords_b, present_b, cfg)
            return out["total_loss"], out

        import optax

        grads, out = jax.grad(loss_fn, has_aux=True)(hp)
        updates, opt_state = tx.update(grads, opt_state, hp)
        return optax.apply_updates(hp, updates), opt_state, out

    bs = max(int(cfg.batch_size), 1)
    rng = np.random.default_rng(seed)
    n = int(pool.images.shape[0])
    t0 = time.time()
    for it in range(maxiters):
        idxs = jnp.asarray(rng.integers(0, n, size=bs))
        head_params, opt_state, out = step(
            head_params, opt_state, jnp.take(feats, idxs, axis=0),
            jnp.take(pool.coords, idxs, axis=0),
            jnp.take(pool.present, idxs, axis=0))
        if displayiters and it % displayiters == 0:
            print(f"[fit_dlc_heads] iter {it}/{maxiters} loss "
                  f"{float(out['total_loss']):.4f} "
                  f"({time.time() - t0:.1f}s)", flush=True)
        if saveiters and it > 0 and it % saveiters == 0:
            merged = dict(variables)
            merged["params"] = {**variables["params"], **head_params}
            ckpt_lib.save_snapshot(train_dir, 0, it, merged, None,
                                   cfg.max_to_keep, debug)

    merged = dict(variables)
    merged["params"] = {**variables["params"],
                        **jax.device_get(head_params)}
    return ckpt_lib.save_snapshot(train_dir, 0, "final--0", merged, None,
                                  cfg.max_to_keep, debug)
