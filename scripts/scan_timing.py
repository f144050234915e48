#!/usr/bin/env python
"""Measure the lax.scan superstep's end-to-end training wall-clock win.

The pooled train steps already cut per-iteration H2D to an index vector,
but each dispatch still pays a host round trip over the device link; the
scan superstep (train/device_data.py::make_pooled_*_scan_step) amortizes
that to 1/K. This runs short fit_dgp / fit_dgp_labeledonly segments on the
real Reaching project with scan off vs on and reports s/iter (training
logs' own timing), the honest end-to-end number PERF.md cites.

Usage: python scripts/scan_timing.py [--workdir /tmp/dgp_eval5]
                                     [--iters 120] [--k 20]
Prints one JSON line.
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
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--k", type=int, default=20)
    args = ap.parse_args()

    from deepgraphpose_tpu.train.fit import fit_dgp, resolve_project

    proj_dir = args.workdir / "Reaching-Mackenzie-2018-08-30"
    _, _, train_dir = resolve_project(proj_dir, shuffle=1)

    res: dict = {"iters": args.iters, "k": args.k}
    for label, k in (("scan_off", 0), ("scan_on", args.k)):
        # two passes: the first warms the (persistent) compile cache so the
        # timed pass measures steady-state training, not XLA compiles
        tag = f"_tm{label}"
        for run in ("warm", "timed"):
            for p in Path(train_dir).glob(f"snapshot-step2{tag}-*"):
                p.unlink()
            t0 = time.perf_counter()
            snap = fit_dgp(snapshot="snapshot-step1_lrG-final--0",
                           dlcpath=proj_dir, batch_size=10,
                           maxiters=args.iters,
                           displayiters=args.iters // 4,
                           saveiters=10 ** 9, wt=0.0, lr=1e-6, debug=tag,
                           scan_iters=k)
            wall = time.perf_counter() - t0
            assert snap is not None
        res[f"{label}_wall_s"] = round(wall, 1)
        res[f"{label}_s_per_iter"] = round(wall / args.iters, 3)
        for p in Path(train_dir).glob(f"snapshot-step2{tag}-*"):
            p.unlink()
    res["speedup"] = round(res["scan_off_s_per_iter"] /
                           res["scan_on_s_per_iter"], 2)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
