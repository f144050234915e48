#!/usr/bin/env python
"""Tune DGP steps 1-2 on the Reaching fixture from a trained step-0 model.

Evidence generator for the semi-supervised claim (ref: README.md:3-5 — the
DGP steps should IMPROVE the supervised baseline; fitdgp.py:257-546,
549-845): trains step-1/step-2 variants from an existing step-0 snapshot
under debug-suffixed names (so nothing clobbers the recorded pipeline),
evaluates each with ``evaluate_dgp`` (both decodes), and appends the grid
to EVAL.json under tag "tune".

Usage (real TPU):
  python scripts/tune_dgp_steps.py --workdir /tmp/dgp_eval5 \
      --step1 lrA:2e-5:decay lrB:5e-6:decay --it1 3000
  python scripts/tune_dgp_steps.py --workdir /tmp/dgp_eval5 \
      --from-step1 step1_lrA --step2 w0:2e-5:decay:0.0 wt:2e-5:decay:0.2 \
      --it2 5000
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import signal
import sys
import time
from pathlib import Path

# SIGUSR1 dumps all-thread tracebacks without killing the run (relay
# compiles can take 10-20 min; this is how to tell "slow" from "stuck")
faulthandler.register(signal.SIGUSR1)

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def evaluate(proj_dir, train_dir, snap_name):
    from deepgraphpose_tpu.evaluation.metrics import evaluate_dgp

    out = {}
    for decode in ("dgp", "dlc"):
        res = evaluate_dgp(Path(proj_dir) / "config.yaml",
                           Path(train_dir) / f"{snap_name}.ckpt",
                           shuffle=1, decode=decode)
        out[decode] = dict(train=round(float(res["train_error"]), 3),
                           test=round(float(res["test_error"]), 3))
        print(f"  {snap_name} [{decode}]: train={out[decode]['train']} "
              f"test={out[decode]['test']}", flush=True)
    return out


def record(args, entry):
    json_path = REPO_ROOT / "EVAL.json"
    history = json.loads(json_path.read_text()) if json_path.exists() else []
    history.append(entry)
    json_path.write_text(json.dumps(history, indent=1))
    print(f"recorded to {json_path}", flush=True)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/dgp_eval5"))
    ap.add_argument("--step1", nargs="*", default=[],
                    metavar="TAG:LR[:decay]",
                    help="step-1 variants from snapshot-step0-final--0")
    ap.add_argument("--from-step1", default=None,
                    help="step-1 debug tag (e.g. step1_lrA) or "
                    "'step1' for the recorded pipeline's snapshot")
    ap.add_argument("--step2", nargs="*", default=[],
                    metavar="TAG:LR[:decay]:WT[:devflow]",
                    help="step-2 variants from --from-step1's final")
    ap.add_argument("--it1", type=int, default=3000)
    ap.add_argument("--it2", type=int, default=5000)
    ap.add_argument("--step0", default="snapshot-step0-final--0",
                    help="step-0 snapshot the --step1 variants start from "
                    "(e.g. an earlier 'snapshot-step0-18000' to probe the "
                    "weaker-supervised regime the DGP steps target)")
    ap.add_argument("--eval", nargs="*", default=[], metavar="SNAP",
                    help="evaluate+record existing snapshots, no training")
    args = ap.parse_args(argv)

    from deepgraphpose_tpu.train.fit import (fit_dgp, fit_dgp_labeledonly,
                                             resolve_project)

    proj_dir = args.workdir / "Reaching-Mackenzie-2018-08-30"
    _, _, train_dir = resolve_project(proj_dir, shuffle=1)
    stamp = time.strftime("%Y-%m-%d %H:%M")

    for snap in args.eval:
        res = evaluate(proj_dir, train_dir, snap)
        record(args, dict(date=stamp, tag="tune", phase="eval",
                          snapshot=snap, results=res))

    for spec in args.step1:
        parts = spec.split(":")
        tag, lr = parts[0], float(parts[1])
        decay = "decay" in parts[2:]
        debug = f"_{tag}"
        t0 = time.time()
        print(f"=== step1 variant {tag}: lr={lr} decay={decay} "
              f"from {args.step0} ({args.it1} iters) ===", flush=True)
        fit_dgp_labeledonly(
            snapshot=args.step0, dlcpath=proj_dir,
            maxiters=args.it1, displayiters=max(args.it1 // 10, 1),
            saveiters=max(args.it1 // 2, 1), lr=lr, lr_decay=decay,
            debug=debug)
        wall = round(time.time() - t0, 1)
        res = evaluate(proj_dir, train_dir, f"snapshot-step1{debug}-final--0")
        record(args, dict(date=stamp, tag="tune", phase="step1",
                          variant=tag, lr=lr, lr_decay=decay,
                          from_step0=args.step0,
                          iters=args.it1, wall_s=wall, results=res))

    for spec in args.step2:
        parts = spec.split(":")
        tag, lr = parts[0], float(parts[1])
        decay = "decay" in parts
        devflow = "devflow" in parts
        wt = float([p for p in parts[2:]
                    if p not in ("decay", "devflow")][0])
        src = args.from_step1 or "step1"
        snap = (f"snapshot-{src}-final--0" if src.startswith("step1")
                else f"snapshot-step1_{src}-final--0")
        debug = f"_{tag}"
        t0 = time.time()
        print(f"=== step2 variant {tag}: lr={lr} decay={decay} wt={wt} "
              f"devflow={devflow} from {snap} ({args.it2} iters) ===",
              flush=True)
        fit_dgp(snapshot=snap, dlcpath=proj_dir, batch_size=10,
                maxiters=args.it2, displayiters=max(args.it2 // 10, 1),
                saveiters=max(args.it2 // 2, 1), wt=wt, lr=lr,
                lr_decay=decay, device_flow=devflow, debug=debug)
        wall = round(time.time() - t0, 1)
        res = evaluate(proj_dir, train_dir, f"snapshot-step2{debug}-final--0")
        record(args, dict(date=stamp, tag="tune", phase="step2",
                          variant=tag, lr=lr, lr_decay=decay, wt=wt,
                          device_flow=devflow, from_step1=src,
                          iters=args.it2, wall_s=wall, results=res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
