#!/usr/bin/env python
"""int8 PTQ accuracy on the real Reaching fixture (EVAL.md / PERF.md).

Evaluates the best trained snapshots with the bf16 model and the int8
backbone (models/quant.py) over the full 55-frame labeled table — the
train/test RMSE delta IS the quantization cost a user pays for the ~2x
MXU rate (PERF.md int8 probe).

Usage: python scripts/quant_eval.py [--workdir /tmp/dgp_eval5]
                                    [--snapshots snapshot-step0-final--0 ...]
Prints one JSON line per (snapshot, decode, quantized) combination and a
final summary line.
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/dgp_eval5"))
    ap.add_argument("--snapshots", nargs="*",
                    default=["snapshot-step0-final--0"])
    ap.add_argument("--decodes", nargs="*", default=["dlc", "dgp"])
    ap.add_argument("--modes", nargs="*",
                    default=["bf16", "int8", "residual"],
                    help="bf16 | int8 (bf16 residual carries) | residual "
                    "(int8 residual carries, models/quant.py)")
    ap.add_argument("--scales", nargs="*", type=float, default=[1.0],
                    help="inference resolution scales (evaluate_dgp scale=; "
                    "RMSE stays in original pixels) — the resolution lever "
                    "of the full-frame throughput roofline (PERF.md)")
    ap.add_argument("--tag", default=None,
                    help="EVAL.json tag (default: quant_scale when scales "
                    "beyond 1.0 are requested, else quant_eval)")
    ap.add_argument("--note", default="")
    ap.add_argument("--no-record", action="store_true",
                    help="print only; skip the EVAL.json append")
    args = ap.parse_args()

    from deepgraphpose_tpu.evaluation.metrics import evaluate_dgp
    from deepgraphpose_tpu.train.fit import resolve_project
    from deepgraphpose_tpu.utils.compile_cache import ensure_compile_cache

    ensure_compile_cache()
    proj_dir = args.workdir / "Reaching-Mackenzie-2018-08-30"
    _, _, train_dir = resolve_project(proj_dir, shuffle=1)
    cfg_file = proj_dir / "config.yaml"

    rows = []
    for snap in args.snapshots:
        snap_path = Path(train_dir) / f"{snap}.ckpt"
        for decode in args.decodes:
            for mode in args.modes:
                for scale in args.scales:
                    q = {"bf16": False, "int8": True,
                         "residual": "residual"}[mode]
                    r = evaluate_dgp(cfg_file, snap_path, decode=decode,
                                     quantize=q, scale=scale)
                    row = dict(snapshot=snap, decode=decode, mode=mode,
                               train_rmse=round(r["train_error"], 3),
                               test_rmse=round(r["test_error"], 3))
                    if scale != 1.0:
                        row["scale"] = scale
                    rows.append(row)
                    print(json.dumps(row), flush=True)
    print(json.dumps({"rows": rows}))

    if not args.no_record:
        import jax
        tag = args.tag or ("quant_scale" if any(s != 1.0 for s in args.scales)
                           else "quant_eval")
        # record the train-time scale distribution next to the inference
        # scales: the quant_scale story is a train/test distribution effect
        import yaml
        pc = yaml.safe_load((Path(train_dir) / "pose_cfg.yaml").read_text())
        record = dict(date=time.strftime("%Y-%m-%d %H:%M"),
                      platform=jax.devices()[0].platform, tag=tag,
                      workdir=str(args.workdir), scales=args.scales,
                      train_scale_jitter=[pc.get("scale_jitter_lo", 0.75),
                                          pc.get("scale_jitter_up", 1.25)],
                      global_scale=pc.get("global_scale", 1.0),
                      note=args.note, rows=rows)
        json_path = REPO_ROOT / "EVAL.json"
        history = (json.loads(json_path.read_text())
                   if json_path.exists() else [])
        history.append(record)
        json_path.write_text(json.dumps(history, indent=1))
        print(f"recorded to {json_path} (tag={tag})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
