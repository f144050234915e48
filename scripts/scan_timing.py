#!/usr/bin/env python
"""Measure the lax.scan superstep's end-to-end training wall-clock win.

The pooled train steps already cut per-iteration H2D to an index vector,
but each dispatch still pays a host round trip over the device link; the
scan superstep (train/device_data.py::make_pooled_*_scan_step) amortizes
that to 1/K, and ``windows_per_device=G`` pools G windows per optimizer
update (the MXU-fill lever). This runs short fit_dgp segments on a real
Reaching project over the (G, K) matrix — scan off/on x 1/G windows — and
reports s/iter and frames/s (training wall-clock, compile excluded via a
warm pass), the honest end-to-end numbers PERF.md cites. The composed
(G>1, K>0) cell exercises make_pooled_dgp_group_scan_step.

Usage: python scripts/scan_timing.py [--workdir /tmp/dgp_eval5]
                                     [--snapshot snapshot-step1-final--0]
                                     [--iters 120] [--k 20]
                                     [--windows 1 2] [--batch 10]
Prints one JSON line per (G, K) cell and a summary line.
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
    ap.add_argument("--snapshot", default="snapshot-step1_lrG-final--0")
    ap.add_argument("--iters", type=int, default=120)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--windows", type=int, nargs="*", default=[1])
    ap.add_argument("--batch", type=int, default=10)
    args = ap.parse_args()

    from deepgraphpose_tpu.train.fit import fit_dgp, resolve_project

    proj_dir = args.workdir / "Reaching-Mackenzie-2018-08-30"
    _, _, train_dir = resolve_project(proj_dir, shuffle=1)

    res: dict = {"iters": args.iters, "k": args.k, "batch": args.batch}
    cells = []
    for g in args.windows:
        for label, k in (("scan_off", 0), ("scan_on", args.k)):
            tag = f"_tmw{g}{label}"
            for run in ("warm", "timed"):
                # the warm pass fills the (persistent) compile cache so the
                # timed pass measures steady-state training, not XLA compiles
                for p in Path(train_dir).glob(f"snapshot-step2{tag}-*"):
                    p.unlink()
                t0 = time.perf_counter()
                snap = fit_dgp(snapshot=args.snapshot,
                               dlcpath=proj_dir, batch_size=args.batch,
                               maxiters=args.iters,
                               displayiters=args.iters // 4,
                               saveiters=10 ** 9, wt=0.0, lr=1e-6, debug=tag,
                               windows_per_device=g, scan_iters=k)
                wall = time.perf_counter() - t0
                assert snap is not None
            # ``maxiters`` caps the SCHEDULE (fit.py:776): the run consumes
            # ``iters`` windows of ``batch`` frames regardless of G (G>1
            # groups them into iters/G optimizer updates), so wall/iters is
            # s per schedule window and batch/s_per_window is frames/s —
            # no extra G factor.
            s_per_window = wall / args.iters
            cell = {"windows": g, "scan": k, "wall_s": round(wall, 1),
                    "s_per_window": round(s_per_window, 4),
                    "s_per_update": round(s_per_window * g, 4),
                    "frames_per_s": round(args.batch / s_per_window, 1)}
            cells.append(cell)
            print(json.dumps(cell), flush=True)
            for p in Path(train_dir).glob(f"snapshot-step2{tag}-*"):
                p.unlink()
    res["cells"] = cells
    # frames-throughput ratios vs the first cell measured (which cell that
    # is depends on --windows order, so name it in the output)
    res["baseline_cell"] = {"windows": cells[0]["windows"],
                            "scan": cells[0]["scan"]}
    res["speedups_vs_baseline_cell"] = [
        round(cells[0]["s_per_window"] / c["s_per_window"], 2)
        for c in cells]
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
