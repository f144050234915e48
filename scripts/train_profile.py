#!/usr/bin/env python
"""Decompose the DGP train step's 105 ms (v5e, 11x747x832 bf16).

Times, on the real chip, each stage of the step in isolation so the
PERF.md training roofline is measured rather than argued:

  fwd        loss value only (forward + targets + objective)
  grad       value_and_grad (adds the backward pass)
  step       full train step (adds clip + SGD-momentum + param update)
  grad_remat value_and_grad with the whole forward rematerialized
             (jax.checkpoint, nothing saveable) — if the backward is
             activation-bandwidth-bound this trades HBM reads for MXU
             FLOPs, which the roofline says are cheaper
  fwd128     the b=128 inference forward for the efficiency reference

Usage: python scripts/train_profile.py  (JAX_PLATFORMS as configured)
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deepgraphpose_tpu.utils.compile_cache import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

from deepgraphpose_tpu.core.config import PoseConfig  # noqa: E402
from deepgraphpose_tpu.models.pose_model import init_model  # noqa: E402
from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams, dgp_loss  # noqa: E402
from deepgraphpose_tpu.train import steps as steps_lib  # noqa: E402


def timeit(call, n=10, reps=3, fetch=lambda r: r):
    """Best mean ms/call of ``call(i)`` over ``reps`` windows of ``n``.

    Axon-relay measurement protocol (the three pitfalls recorded in
    PERF.md "int8 MXU probe", shared with bench.py / int8_conv_probe.py):
    every dispatch must see distinct inputs (``call`` receives the
    iteration index and cycles an input ring — the relay elides repeated
    identical (executable, inputs) pairs, reading far above hardware
    peak), the sync fetches ONE small element of the LAST call's result
    (a full-buffer fetch drags MBs through the ~50 MB/s tunnel; device
    streams execute in order, so the last result completing implies the
    window did), and no extra call runs inside the timed window.
    """
    r = fetch(call(0))
    np.asarray(r)  # compile + warmup + sync
    best = float("inf")
    for rep in range(reps):
        t0 = time.perf_counter()
        for i in range(n):
            r = call(rep * n + i + 1)
        np.asarray(fetch(r))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3  # ms


def _image_ring(rng, shape, dtype=np.float32, k=3):
    """k distinct device-resident input variants (see timeit protocol)."""
    return [jax.device_put(jnp.asarray(
        rng.uniform(0, 255, shape).astype(dtype))) for _ in range(k)]


def main():
    h, w, t = (int(os.environ.get("PROF_H", 747)),
               int(os.environ.get("PROF_W", 832)), 11)
    cfg = PoseConfig(num_joints=5, net_type="resnet_50",
                     all_joints_names=[f"bp{i}" for i in range(5)])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (h, w),
                                  dtype=jnp.bfloat16)
    nj = cfg.num_joints
    S0 = np.zeros((2, nj), np.float32)
    S0[0, 0], S0[0, 1] = 1, -1
    S0[1, 1], S0[1, 2] = 1, -1
    lp = DGPLossParams(
        nj=nj, stride=cfg.stride, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=cfg.pos_dist_thresh, locref_stdev=cfg.locref_stdev,
        locref_loss_weight=cfg.locref_loss_weight, locref_huber_loss=True,
        wn_visible=5.0, wn_hidden=3.0, wt=0.0, wt_max=0.0, gm2=0, gm3=0,
        n_visible_frames_total=44.0, n_hidden_frames_total=200.0, S0=S0,
        ws=np.full(2, 0.5, np.float32), ws_max=np.full(2, 100.0, np.float32))
    rng = np.random.default_rng(0)
    vis = np.zeros(t * nj, np.float32)
    vis[:2 * nj] = 1
    batch = {k: jax.device_put(v) for k, v in dict(
        targets=jnp.asarray(rng.uniform(0, min(h, w) // 10, (t, nj, 2)),
                            jnp.float32),
        visible_mask=jnp.asarray(vis), hidden_mask=jnp.asarray(1 - vis),
        frame_mask=jnp.ones(t), wt_batch=jnp.zeros(t - 1),
        pair_mask=jnp.ones(t - 1), flow=jnp.zeros((t - 1, 8, 8))).items()}
    img_ring = _image_ring(rng, (t, h, w, 3))
    images = img_ring[0]
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p, images):
        heads = model.apply({"params": p, **rest}, images)
        out = dgp_loss(heads["part_pred"], heads["locref"], batch, lp)
        return out["total_loss"]

    out = {}

    fwd = jax.jit(loss_fn)
    out["fwd_ms"] = timeit(
        lambda i: fwd(params, img_ring[i % len(img_ring)]))

    grad = jax.jit(jax.value_and_grad(loss_fn))
    out["grad_ms"] = timeit(
        lambda i: grad(params, img_ring[i % len(img_ring)])[0])

    rloss = jax.checkpoint(loss_fn,
                           policy=jax.checkpoint_policies.nothing_saveable)
    gremat = jax.jit(jax.value_and_grad(rloss))
    out["grad_remat_ms"] = timeit(
        lambda i: gremat(params, img_ring[i % len(img_ring)])[0])

    tx = steps_lib.make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(params)
    step = steps_lib.make_dgp_train_step(model, lp, tx)
    state = {"v": variables, "o": opt_state}

    def run_step(i):
        # params/opt_state evolve every call, so inputs are fresh by
        # construction; the image ring varies the data side too
        state["v"], state["o"], o = step(state["v"], state["o"],
                                         img_ring[i % len(img_ring)], batch)
        return o

    out["step_ms"] = timeit(run_step, fetch=lambda o: o["total_loss"])

    # efficiency reference: the b=128 inference forward
    from deepgraphpose_tpu.infer.predict import make_infer_fn

    infer = make_infer_fn(model, cfg)
    frame_ring = [jax.device_put(rng.integers(0, 255, (128, h, w, 3),
                                              dtype=np.uint8))
                  for _ in range(3)]
    # the train step donates its inputs, so use the live post-step variables
    live = state["v"]
    out["infer128_ms"] = timeit(
        lambda i: infer(live, frame_ring[i % len(frame_ring)]),
        fetch=lambda r: r[0][0, 0, 0])
    del frame_ring

    # window-batching sweep: grad over G stacked windows (vmapped forward,
    # mean loss — the data_parallel=G math on one chip). If per-window cost
    # falls with G, single-chip multi-window training is the train-step
    # efficiency lever.
    # the train step donated params/rest; time the sweep on the live copies
    params_l = state["v"]["params"]
    rest_l = {k: v for k, v in state["v"].items() if k != "params"}
    for G in (2, 4):
        imgs_ring = [jax.device_put(jnp.stack([im] * G)) for im in img_ring]
        batch_g = {k: jnp.stack([v] * G) for k, v in batch.items()}

        def gloss(p, imgs_g, batch_g):
            def one(im, b):
                heads = model.apply({"params": p, **rest_l}, im)
                return dgp_loss(heads["part_pred"], heads["locref"], b,
                                lp)["total_loss"]

            return jnp.mean(jax.vmap(one)(imgs_g, batch_g))

        gg = jax.jit(jax.value_and_grad(gloss))
        ms = timeit(lambda i: gg(params_l, imgs_ring[i % len(imgs_ring)],
                                 batch_g)[0])
        out[f"grad_G{G}_ms"] = ms
        out[f"grad_G{G}_per_window_ms"] = ms / G
        del imgs_ring

    gf_fwd = 143.0 * t  # XLA-counted 143 GF/frame forward (PERF.md)
    out["fwd_tflops"] = round(gf_fwd / out["fwd_ms"], 1)
    out["grad_tflops"] = round(3 * gf_fwd / out["grad_ms"], 1)
    out["grad_remat_tflops"] = round(4 * gf_fwd / out["grad_remat_ms"], 1)
    out = {k: round(v, 2) if isinstance(v, float) else v
           for k, v in out.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
