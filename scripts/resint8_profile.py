#!/usr/bin/env python
"""Attribute the residual-int8 full-frame gap (PERF.md / round-4 verdict).

BENCH_r04: residual-int8 full-frame runs 1191 fps, ~86% of the ~1380
kernel ceiling implied by the int8 MXU probe (1.9x of 727 bf16). This
script times jitted sub-programs of the same forward at the bench shape
to attribute the remaining ~14%:

  backbone       — _int8_backbone only (the int8 chain + carries)
  +heads         — backbone + both deconv heads (bf16 PredictionHead)
  +decode (full) — the production infer_forward (softargmax + likelihood)

and, for contrast, the same split on the default-int8 (bf16 carries) and
bf16 models. Per-segment ms/frame deltas say whether the gap is the bf16
deconv heads, the requantize epilogues (backbone row vs ceiling), or the
decode. Run ON THE TPU (the question is about MXU/HBM behavior):

  python scripts/resint8_profile.py [--batch 128 --hw 747 832]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def _time_fn(fn, args, batch, iters=30, warmup=5):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    return dt / batch * 1e3  # ms/frame


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--hw", type=int, nargs=2, default=[747, 832])
    ap.add_argument("--net", default="resnet_50")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--no-record", action="store_true")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from deepgraphpose_tpu.core.config import PoseConfig
    from deepgraphpose_tpu.infer.predict import infer_forward
    from deepgraphpose_tpu.models import quant as quant_lib
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    h, w = args.hw
    # bench parity: infer_forward pads odd dims internally via the model;
    # use the same raw frame size bench.py feeds
    cfg = PoseConfig(net_type=args.net, num_joints=4)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (h, w))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.integers(0, 255, (args.batch, h, w, 3),
                                    dtype=np.uint8))
    calib = np.asarray(imgs[:8])

    rows = {}

    def profile(label, mdl, mvars):
        full = jax.jit(lambda v, im: infer_forward(mdl, cfg, v, im))
        heads_only = jax.jit(
            lambda v, im: mdl.apply(v, im.astype(jnp.float32)))

        def bb(v, im):
            x = im.astype(jnp.float32) - jnp.asarray(cfg.mean_pixel,
                                                     jnp.float32)
            if isinstance(mdl, quant_lib.QuantizedPoseModel):
                f, _ = quant_lib._int8_backbone(
                    cfg, v, x, carry_dtype=mdl.carry_dtype,
                    int8_carry=mdl.int8_carry,
                    residual_int8=mdl.residual_int8)
                return f
            return mdl.apply(v, im.astype(jnp.float32),
                             return_features=True)["features"]

        bb_fn = jax.jit(bb)
        ms_bb = _time_fn(bb_fn, (mvars, imgs), args.batch, args.iters)
        ms_heads = _time_fn(heads_only, (mvars, imgs), args.batch,
                            args.iters)
        ms_full = _time_fn(full, (mvars, imgs), args.batch, args.iters)
        rows[label] = {
            "backbone_ms": round(ms_bb, 4),
            "heads_ms": round(ms_heads - ms_bb, 4),
            "decode_ms": round(ms_full - ms_heads, 4),
            "full_ms": round(ms_full, 4),
            "full_fps": round(1e3 / ms_full, 1),
        }
        print(label, json.dumps(rows[label]), flush=True)

    # bf16 reference
    profile("bf16", model, variables)

    qmodel, qvars = quant_lib.quantize_model(cfg, variables, calib)
    profile("int8_default", qmodel, qvars)

    qmodel_r, qvars_r = quant_lib.quantize_model(cfg, variables, calib,
                                                 residual_int8=True)
    profile("residual_int8", qmodel_r, qvars_r)

    # attribution summary
    r = rows["residual_int8"]
    summary = {
        "heads_share": round(r["heads_ms"] / r["full_ms"], 3),
        "decode_share": round(r["decode_ms"] / r["full_ms"], 3),
        "backbone_share": round(r["backbone_ms"] / r["full_ms"], 3),
        "residual_vs_int8_backbone": round(
            rows["int8_default"]["backbone_ms"] / r["backbone_ms"], 3),
        "int8_vs_bf16_backbone": round(
            rows["bf16"]["backbone_ms"]
            / rows["int8_default"]["backbone_ms"], 3),
    }
    print("SUMMARY", json.dumps(summary), flush=True)

    if not args.no_record:
        record = dict(date=time.strftime("%Y-%m-%d %H:%M"),
                      platform=jax.devices()[0].platform,
                      tag="resint8_profile", batch=args.batch,
                      hw=[h, w], net=args.net, rows=rows, summary=summary)
        json_path = REPO_ROOT / "EVAL.json"
        history = (json.loads(json_path.read_text())
                   if json_path.exists() else [])
        history.append(record)
        json_path.write_text(json.dumps(history, indent=1))
        print(f"recorded to {json_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
