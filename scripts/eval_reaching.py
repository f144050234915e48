#!/usr/bin/env python
"""Train + evaluate the bundled Reaching-Mackenzie project; record RMSE.

Evidence generator for the accuracy north star (BASELINE.md: per-keypoint
RMSE within 1 px of TF1 DGP). Reproduces the reference demo pipeline
(ref: demo/run_dgp_demo.py:114-310) on the real project at full resolution:

  step 0 (fit_dlc) -> step 1 (fit_dgp_labeledonly) -> step 2 (fit_dgp),

then runs ``evaluate_dgp`` (both decode modes) on each step's final
snapshot and appends a markdown table + JSON blob to EVAL.md / EVAL.json.

The bundled videos are git-LFS-stripped, so a stand-in video is synthesized
from the 44 labeled full-res PNGs at their original frame indices
(img<NNN>.png -> frame NNN), exactly as tests/test_reference_fixture.py
does — the label <-> frame mapping stays intact and the hidden-frame
selection sees real image content.

Run on the TPU:  PYTHONPATH=/root/repo:$PYTHONPATH python scripts/eval_reaching.py
Run on CPU:      JAX_PLATFORMS=cpu python scripts/eval_reaching.py --iters 20 20 20
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_PROJECT = Path("/root/reference/data/Reaching-Mackenzie-2018-08-30")


def make_workdir(workdir: Path, fresh: bool = False) -> Path:
    import cv2
    import yaml

    dst = workdir / "Reaching-Mackenzie-2018-08-30"
    if dst.exists() and not fresh:
        # reuse: completed steps skip via their final snapshots, and an
        # interrupted step resumes from its latest intermediate snapshot
        print(f"reusing existing workdir {dst}")
        return dst
    if dst.exists():
        shutil.rmtree(dst)
    shutil.copytree(REFERENCE_PROJECT, dst,
                    ignore=shutil.ignore_patterns("*.avi", "*.mp4"))
    cfg = yaml.safe_load(open(dst / "config.yaml"))
    cfg["project_path"] = str(dst)
    yaml.safe_dump(cfg, open(dst / "config.yaml", "w"), sort_keys=False)

    vdir = dst / "labeled-data" / "reachingvideo1"
    pngs = {int("".join(c for c in p.stem if c.isdigit())): p
            for p in vdir.glob("img*.png")}
    first = cv2.imread(str(pngs[min(pngs)]))
    h, w = first.shape[:2]
    for out_dir in ("videos", "videos_dgp"):
        (dst / out_dir).mkdir(exist_ok=True)
    wr = cv2.VideoWriter(str(dst / "videos" / "reachingvideo1.avi"),
                         cv2.VideoWriter_fourcc(*"MJPG"), 30.0, (w, h))
    cur = first
    for i in range(max(pngs) + 3):
        if i in pngs:
            cur = cv2.imread(str(pngs[i]))
        wr.write(cur)
    wr.release()
    shutil.copy(dst / "videos" / "reachingvideo1.avi",
                dst / "videos_dgp" / "reachingvideo1.avi")
    return dst


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/dgp_eval"))
    ap.add_argument("--iters", type=int, nargs=3, default=[3000, 1000, 1000],
                    metavar=("IT0", "IT1", "IT2"))
    ap.add_argument("--batch_size", type=int, default=10)
    ap.add_argument("--step0_batch", type=int, default=None,
                    help="override pose_cfg batch_size for fit_dlc — "
                    "from-scratch runs (no bundled ImageNet ckpt) need "
                    "larger batches than the reference's warm-started "
                    "batch_size 1")
    ap.add_argument("--step0_lr", type=float, default=None,
                    help="override the pose_cfg multi_step schedule with a "
                    "constant step-0 learning rate")
    ap.add_argument("--step0_schedule", type=str, default=None,
                    help="override multi_step as 'lr:until,lr:until,...' — "
                    "the bundled schedule decays at 430k/730k iters, far "
                    "past any from-scratch run length, so short runs never "
                    "see a decay phase without this")
    ap.add_argument("--step0_aug", action="store_true",
                    help="full reference augmentation pipeline during step "
                    "0 (on-device; recommended for from-scratch runs)")
    ap.add_argument("--dgp_lr", type=float, default=None,
                    help="learning rate for steps 1-2 (default: the "
                    "reference's 0.005, tuned for warm-started models; "
                    "from-scratch step-0 models need ~5e-5, see EVAL.md)")
    ap.add_argument("--wt", type=float, default=0.0)
    ap.add_argument("--out", type=Path, default=REPO_ROOT / "EVAL.md")
    ap.add_argument("--fresh", action="store_true",
                    help="rebuild the workdir instead of resuming")
    args = ap.parse_args(argv)

    import jax

    from deepgraphpose_tpu.evaluation.metrics import evaluate_dgp
    from deepgraphpose_tpu.train.fit import (fit_dlc, fit_dgp,
                                             fit_dgp_labeledonly,
                                             resolve_project)

    args.workdir.mkdir(parents=True, exist_ok=True)
    proj_dir = make_workdir(args.workdir, fresh=args.fresh)
    _, _, train_dir = resolve_project(proj_dir, shuffle=1)
    if (args.step0_batch is not None or args.step0_lr is not None
            or args.step0_schedule is not None):
        import yaml

        pc = Path(train_dir) / "pose_cfg.yaml"
        raw = yaml.safe_load(pc.read_text())
        if args.step0_batch is not None:
            raw["batch_size"] = args.step0_batch
        if args.step0_lr is not None:
            raw["multi_step"] = [[args.step0_lr, 10**9]]
        if args.step0_schedule is not None:
            raw["multi_step"] = [
                [float(p.split(":")[0]), int(p.split(":")[1])]
                for p in args.step0_schedule.split(",")]
        pc.write_text(yaml.safe_dump(raw, sort_keys=False))
    platform = jax.devices()[0].platform
    it0, it1, it2 = args.iters
    timings = {}

    t0 = time.time()
    print(f"=== step 0: fit_dlc ({it0} iters) ===", flush=True)
    fit_dlc(dlcpath=proj_dir, maxiters=it0, displayiters=max(it0 // 20, 1),
            saveiters=max(it0 // 10, 1), aug=args.step0_aug)
    timings["step0_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    print(f"=== step 1: fit_dgp_labeledonly ({it1} iters) ===", flush=True)
    fit_dgp_labeledonly(snapshot="snapshot-step0-final--0", dlcpath=proj_dir,
                        maxiters=it1, displayiters=max(it1 // 20, 1),
                        saveiters=max(it1 // 2, 1), lr=args.dgp_lr)
    timings["step1_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    print(f"=== step 2: fit_dgp ({it2} iters) ===", flush=True)
    fit_dgp(snapshot="snapshot-step1-final--0", dlcpath=proj_dir,
            batch_size=args.batch_size, maxiters=it2,
            displayiters=max(it2 // 20, 1), saveiters=max(it2 // 2, 1),
            wt=args.wt, lr=args.dgp_lr)
    timings["step2_s"] = round(time.time() - t0, 1)

    rows = []
    for step in (0, 1, 2):
        snap = Path(train_dir) / f"snapshot-step{step}-final--0.ckpt"
        for decode in ("dgp", "dlc"):
            res = evaluate_dgp(proj_dir / "config.yaml", snap, shuffle=1,
                               decode=decode)
            is_train = res["is_train"]
            rows.append(dict(step=step, decode=decode,
                             train_error=round(float(res["train_error"]), 3),
                             test_error=round(float(res["test_error"]), 3),
                             n_train=int(is_train.sum()),
                             n_test=int((~is_train).sum())))
            print(f"step{step} decode={decode}: "
                  f"train={rows[-1]['train_error']} px "
                  f"test={rows[-1]['test_error']} px", flush=True)

    stamp = time.strftime("%Y-%m-%d %H:%M")
    record = dict(date=stamp, platform=platform,
                  iters=[it0, it1, it2], batch_size=args.batch_size,
                  step0_batch=args.step0_batch, step0_lr=args.step0_lr,
                  step0_schedule=args.step0_schedule,
                  step0_aug=bool(args.step0_aug), dgp_lr=args.dgp_lr,
                  wt=args.wt, timings=timings, results=rows)
    json_path = args.out.with_suffix(".json")
    history = []
    if json_path.exists():
        history = json.loads(json_path.read_text())
    history.append(record)
    json_path.write_text(json.dumps(history, indent=1))

    lines = [
        "",
        f"## Reaching-Mackenzie run — {stamp} ({platform})",
        "",
        f"Pipeline: fit_dlc {it0} iters"
        + (f" (batch {args.step0_batch})" if args.step0_batch else "")
        + (f" (lr {args.step0_lr})" if args.step0_lr else "")
        + (" (full on-device aug)" if args.step0_aug else "")
        + f" -> fit_dgp_labeledonly {it1} -> "
        f"fit_dgp {it2} (batch_size={args.batch_size}, wt={args.wt}"
        + (f", dgp_lr={args.dgp_lr}" if args.dgp_lr else "") + "); "
        f"wall-clock {timings['step0_s']}/{timings['step1_s']}/"
        f"{timings['step2_s']} s per step. "
        "RMSE vs human labels (pixels, full 747x832 resolution), "
        "`evaluate_dgp` over the full 55-frame labeled table, train/test "
        "split from the bundled Documentation pickle (52/3):",
        "",
        "| snapshot | decode | train RMSE (px) | test RMSE (px) |"
        " n_train | n_test |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| step{r['step']}-final | {r['decode']} | {r['train_error']} |"
            f" {r['test_error']} | {r['n_train']} | {r['n_test']} |")
    with open(args.out, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out} and {json_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
