#!/usr/bin/env python
"""Decompose the DGP train step's cost on the real chip (PERF.md training
roofline).

PERF.md rooflines inference but the train step (97-101 ms for an 11-frame
full-res window ~ 24% of v5e bf16 peak vs 52% for inference) was never
profiled. This times, at Reaching scale (747x832, ResNet-50, bf16):

* forward-only, forward+loss, and the full pooled train step (the deltas
  attribute cost to backward+optimizer vs loss vs forward);
* the on-device augmentation and LK-flow increments;
* optimizer-only (SGD-momentum + global-norm clip at parameter scale);
* window stacking: the same step at 11/22/44 frames, to measure how much
  of the inference-vs-training efficiency gap is just MXU utilisation at
  small batch (ref batch_size 10+anchor, fitdgp.py:801-815).

Usage: python scripts/train_profile.py  [--frames 11 22 44]
Prints one JSON line; results land in PERF.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _sync(out):
    # block_until_ready is unreliable over the axon relay (see bench.py);
    # a host fetch is the only trustworthy sync — of ONE element, not the
    # whole buffer (device->host rides a ~50 MB/s tunnel; a full scoremap
    # or parameter fetch would bury the step time). Execution is in-order,
    # so one element of the last output fences everything before it.
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def _bench(fn, make_ring, reps: int = 3, inner: int = 5) -> float:
    """Best per-call time over rings of DISTINCT argument tuples.

    Repeating one identical (executable, inputs) call measures far above
    hardware peak here — the relay elides repeat executions (see
    scripts/int8_conv_probe.py and bench.py's frame ring) — so every timed
    call sees a globally fresh input, built by ``make_ring(rep)`` outside
    the timer. The train-step timings thread params through the loop, which
    makes every call distinct by construction.
    """
    ring = make_ring(0)
    out = fn(*ring[0])
    _sync(out)
    best = float("inf")
    for rep in range(reps):
        if rep:
            ring = make_ring(rep)
        _sync(ring[-1])  # ring generation must not leak into the timer
        t0 = time.perf_counter()
        for args in ring:
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / len(ring))
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", nargs="*", type=int, default=[11, 22, 44])
    ap.add_argument("--hw", nargs=2, type=int, default=[747, 832])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepgraphpose_tpu.core.config import PoseConfig
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams, dgp_loss
    from deepgraphpose_tpu.train import device_data as dd
    from deepgraphpose_tpu.train import steps as steps_lib
    from deepgraphpose_tpu.train.steps import _apply_model

    from deepgraphpose_tpu.utils import compile_cache

    compile_cache.ensure_compile_cache()

    nj = 14
    h, w = args.hw
    cfg = PoseConfig(num_joints=nj, net_type="resnet_50",
                     pos_dist_thresh=17)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (h, w),
                                  dtype=jnp.bfloat16)
    lp = DGPLossParams(
        nj=nj, stride=16.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=17, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=52.0,
        n_hidden_frames_total=500.0, S0=np.zeros((0, nj), np.float32),
        ws=np.zeros((0,), np.float32), ws_max=np.zeros((0,), np.float32))
    tx = steps_lib.make_optimizer(5e-5, clip_norm=10.0)
    rng = np.random.default_rng(0)

    res: dict = {"platform": jax.devices()[0].platform, "hw": [h, w]}

    def make_inputs(t):
        pool = jnp.asarray(rng.integers(0, 255, (t + 2, h, w, 3),
                                        dtype=np.uint8))
        rows = jnp.asarray(np.arange(t, dtype=np.int32))
        vis = np.zeros(t * nj, np.float32)
        vis[:nj] = 1
        batch = dict(
            targets=jnp.asarray(rng.uniform(0, 40, (t, nj, 2)), jnp.float32),
            visible_mask=jnp.asarray(vis), hidden_mask=jnp.asarray(1 - vis),
            frame_mask=jnp.ones(t), wt_batch=jnp.zeros(t - 1),
            pair_mask=jnp.ones(t - 1), flow=jnp.zeros((t - 1, 1, 1)))
        return pool, rows, batch

    # ---- component decomposition at the reference window size --------
    t0 = args.frames[0]
    pool, rows, batch = make_inputs(t0)
    key = jax.random.PRNGKey(1)

    INNER = 5
    pert_pool = jax.jit(lambda p, s: p + s.astype(p.dtype))  # uint8 wraps

    def ring_pool_arg(build):
        """make_ring: fresh pool buffer per call, threaded through build."""
        def make(rep):
            return [build(pert_pool(pool, jnp.int32(1 + rep * INNER + i)))
                    for i in range(INNER)]
        return make

    fwd = jax.jit(lambda v, p, r: _apply_model(
        model, v["params"],
        {k: x for k, x in v.items() if k != "params"},
        jnp.take(p, r, axis=0), False)[0])
    res["fwd_ms"] = round(_bench(
        fwd, ring_pool_arg(lambda p: (variables, p, rows))) * 1e3, 1)

    def loss_val(v, p, r, b):
        heads, _ = _apply_model(
            model, v["params"],
            {k: x for k, x in v.items() if k != "params"},
            jnp.take(p, r, axis=0), False)
        return dgp_loss(heads["part_pred"], heads["locref"], b,
                        lp)["total_loss"]

    res["fwd_loss_ms"] = round(
        _bench(jax.jit(loss_val),
               ring_pool_arg(lambda p: (variables, p, rows, batch))) * 1e3,
        1)

    grads_like = jax.tree_util.tree_map(jnp.zeros_like, variables["params"])
    opt_state0 = tx.init(variables["params"])

    def opt_only(g, s, p):
        import optax

        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    pert_tree = jax.jit(lambda t, s: jax.tree_util.tree_map(
        lambda x: x + s.astype(x.dtype), t))

    def ring_grads(rep):
        return [(pert_tree(grads_like, jnp.float32(1e-6 * (1 + rep * INNER
                                                           + i))),
                 opt_state0, variables["params"])
                for i in range(INNER)]

    res["opt_only_ms"] = round(
        _bench(jax.jit(opt_only), ring_grads) * 1e3, 1)

    def timed_step(step_fn, extra_key=False):
        v = jax.tree_util.tree_map(jnp.copy, variables)
        s = tx.init(v["params"])

        def run(pool, rows, batch, key):
            nonlocal v, s
            v, s, out = step_fn(v, s, pool, rows, batch, key)
            return out["total_loss"]

        run(pool, rows, batch, key)
        _sync(jnp.zeros(()))
        best = float("inf")
        for _ in range(3):
            t1 = time.perf_counter()
            for _ in range(5):
                loss = run(pool, rows, batch, key)
            _sync(loss)
            best = min(best, (time.perf_counter() - t1) / 5)
        return best * 1e3

    step_plain = dd.make_pooled_dgp_train_step(model, lp, tx, None)
    res["step_ms"] = round(timed_step(step_plain), 1)
    step_aug = dd.make_pooled_dgp_train_step(
        model, lp, tx, dd.DeviceAugmentConfig.reference())
    res["step_aug_ms"] = round(timed_step(step_aug), 1)
    import dataclasses as _dc
    lp_wt = _dc.replace(lp, wt=1.0)
    try:
        step_flow = dd.make_pooled_dgp_train_step(model, lp_wt, tx, None,
                                                  device_flow=True)
        res["step_flow_ms"] = round(timed_step(step_flow), 1)
    except Exception as e:  # noqa: BLE001
        res["step_flow_ms"] = f"error: {e}"[:120]

    # ---- window-stacking scaling -------------------------------------
    gf_frame = 3 * 143.0  # fwd+bwd ~ 3x the 143 GF/frame forward count
    for t in args.frames:
        pool, rows, batch = make_inputs(t)
        ms = timed_step(step_plain)
        res[f"step_{t}f_ms"] = round(ms, 1)
        res[f"step_{t}f_ms_per_frame"] = round(ms / t, 2)
        res[f"step_{t}f_tflops"] = round(t * gf_frame / ms, 1)

    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
