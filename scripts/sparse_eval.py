#!/usr/bin/env python
"""Sparse-label Reaching pipeline: the regime DGP's claim targets.

The DGP paper's pitch (ref: README.md:3-5, biorxiv 2020.08.20.259705) is
semi-supervised: with FEW labeled frames, the hidden-frame objective should
lift accuracy over the supervised baseline. The bundled project's 0.95
split (52 train / 3 test) saturates supervision and leaves a 3-frame test
set; this script rebuilds the SAME project at a sparse TrainingFraction
(default 0.2 -> 11 train / 44 test labeled frames) using this repo's
create_training_dataset (ref: trainingsetmanipulation.py:521-814), trains
the full 3-step pipeline from scratch with the recorded recipe, and
evaluates every step on the 44-frame held-out set — a statistically
meaningful split for the semi-supervised comparison.

Run on the TPU:
  python scripts/sparse_eval.py                # 0.2 split, 20k/3k/2k iters
  python scripts/sparse_eval.py --wt 0.2 --devflow   # + temporal clique
"""

from __future__ import annotations

import argparse
import faulthandler
import json
import signal
import sys
import time
from pathlib import Path

faulthandler.register(signal.SIGUSR1)

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

from eval_reaching import make_workdir  # noqa: E402 (same scripts/ dir)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", type=Path, default=Path("/tmp/dgp_sparse"))
    ap.add_argument("--fraction", type=float, default=0.2)
    ap.add_argument("--iters", type=int, nargs=3, default=[20000, 3000, 2000],
                    metavar=("IT0", "IT1", "IT2"))
    ap.add_argument("--step0_batch", type=int, default=8)
    ap.add_argument("--dgp_lr", type=float, default=1e-6,
                    help="steps 1-2 lr (EVAL.md tuning sweep: 1e-6 + decay "
                    "is the stable setting for from-scratch models)")
    ap.add_argument("--wt", type=float, default=0.0)
    ap.add_argument("--devflow", action="store_true")
    ap.add_argument("--gm2", type=int, default=0,
                    help="confidence scaling of hidden CE "
                    "(ref: fitdgp.py:994-1021)")
    ap.add_argument("--gm3", type=int, default=0,
                    help="confidence gating of hidden CE "
                    "(ref: fitdgp.py:1026-1037)")
    ap.add_argument("--warmstart-from", type=Path, default=None,
                    help="existing workdir whose steps 0-1 snapshots are "
                    "copied in so only step 2 trains (for arm sweeps)")
    ap.add_argument("--seed", type=int, default=0,
                    help="split seed for create_training_dataset")
    ap.add_argument("--scale_jitter", type=float, nargs=2, default=None,
                    metavar=("LO", "UP"),
                    help="override pose_cfg scale_jitter_lo/up (ref: "
                    "pose_cfg.yaml defaults 0.75/1.25) — widen to train "
                    "for reduced-resolution inference (PERF.md resolution "
                    "lever; the 0.5x collapse is a train-scale "
                    "distribution effect)")
    ap.add_argument("--skip-dgp", action="store_true",
                    help="train step 0 only (scale/recipe ablations that "
                    "don't need the DGP steps)")
    ap.add_argument("--fresh", action="store_true")
    ap.add_argument("--eval-only", action="store_true",
                    help="skip training; evaluate existing snapshots")
    ap.add_argument("--eval-steps", type=int, nargs="*", default=None,
                    help="restrict the final eval to these steps (warmstart "
                    "arms re-copy steps 0-1 from a workdir that already "
                    "evaluated them — skip ~20 min of duplicate TPU eval)")
    args = ap.parse_args(argv)

    import jax
    import yaml

    from deepgraphpose_tpu.evaluation.metrics import evaluate_dgp
    from deepgraphpose_tpu.project.training_dataset import \
        create_training_dataset
    from deepgraphpose_tpu.train.fit import (fit_dgp, fit_dgp_labeledonly,
                                             fit_dlc, resolve_project)

    args.workdir.mkdir(parents=True, exist_ok=True)
    if args.warmstart_from is not None:
        import shutil
        src = args.warmstart_from / "Reaching-Mackenzie-2018-08-30"
        dst = args.workdir / "Reaching-Mackenzie-2018-08-30"
        if dst.exists():
            if not args.fresh:
                # the existing project wins (steps skip via their finals);
                # clear the flag so the EVAL record doesn't claim a
                # warm start that never happened
                print(f"{dst} exists; ignoring --warmstart-from "
                      "(pass --fresh to replace it)", flush=True)
                args.warmstart_from = None
            else:
                shutil.rmtree(dst)
        if args.warmstart_from is not None:
            print(f"warm-starting from {src}", flush=True)
            shutil.copytree(src, dst)
            # the copy IS the fresh state; make_workdir must not rm it
            args.fresh = False
            # drop step-2 artifacts so only step 2 retrains (0/1
            # skip-if-final)
            for p in dst.rglob("snapshot-step2-*"):
                p.unlink()
            for p in dst.rglob("learning_stats_step2*.csv"):
                p.unlink()
            import yaml as _yaml
            c = _yaml.safe_load((dst / "config.yaml").read_text())
            c["project_path"] = str(dst)
            (dst / "config.yaml").write_text(
                _yaml.safe_dump(c, sort_keys=False))
    proj_dir = make_workdir(args.workdir, fresh=args.fresh)
    cfg_path = proj_dir / "config.yaml"
    cfg = yaml.safe_load(cfg_path.read_text())
    if cfg.get("TrainingFraction") != [args.fraction]:
        cfg["TrainingFraction"] = [args.fraction]
        cfg_path.write_text(yaml.safe_dump(cfg, sort_keys=False))

    from deepgraphpose_tpu.core import paths as paths_lib
    from deepgraphpose_tpu.core.config import ProjectConfig

    pconf = ProjectConfig.from_yaml(cfg_path)
    pconf.project_path = str(proj_dir)
    train_dir = paths_lib.train_dir(proj_dir, pconf, shuffle=1)
    if not (Path(train_dir) / "pose_cfg.yaml").exists():
        made = create_training_dataset(cfg_path, Shuffles=[1],
                                       seed=args.seed)
        print(f"training sets: {made}", flush=True)
    _, proj, train_dir = resolve_project(proj_dir, shuffle=1)

    it0, it1, it2 = args.iters
    # step-0 recipe that produced the recorded best (EVAL.md 07:04 run),
    # decay mileposts scaled to it0
    pc = Path(train_dir) / "pose_cfg.yaml"
    raw = yaml.safe_load(pc.read_text())
    raw["batch_size"] = args.step0_batch
    raw["multi_step"] = [[0.005, int(0.33 * it0)], [0.02, int(0.66 * it0)],
                         [0.002, int(0.87 * it0)], [0.0005, it0]]
    if args.scale_jitter is not None:
        raw["scale_jitter_lo"], raw["scale_jitter_up"] = args.scale_jitter
    pc.write_text(yaml.safe_dump(raw, sort_keys=False))

    platform = jax.devices()[0].platform
    timings = {}
    # provenance: steps whose final snapshot pre-exists are SKIPPED by
    # fit_* (skip-if-final), so this invocation's recipe args (iters,
    # scale_jitter, lr, ...) do not describe how they were trained
    preexisting = [s for s in (0, 1, 2)
                   if (Path(train_dir) /
                       f"snapshot-step{s}-final--0.ckpt").exists()]
    if preexisting and not args.eval_only:
        print(f"WARNING: steps {preexisting} have final snapshots already "
              "— training skips them; recorded as reused_steps "
              "(pass --fresh for a clean run)", flush=True)
    if not args.eval_only:
        t0 = time.time()
        print(f"=== step 0: fit_dlc ({it0} iters, fraction "
              f"{args.fraction}) ===", flush=True)
        fit_dlc(dlcpath=proj_dir, maxiters=it0,
                displayiters=max(it0 // 20, 1),
                saveiters=max(it0 // 10, 1), aug=True)
        timings["step0_s"] = round(time.time() - t0, 1)

        if not args.skip_dgp:
            t0 = time.time()
            print(f"=== step 1: fit_dgp_labeledonly ({it1} iters) ===",
                  flush=True)
            fit_dgp_labeledonly(snapshot="snapshot-step0-final--0",
                                dlcpath=proj_dir, maxiters=it1,
                                displayiters=max(it1 // 10, 1),
                                saveiters=max(it1 // 2, 1),
                                lr=args.dgp_lr, lr_decay=True)
            timings["step1_s"] = round(time.time() - t0, 1)

            t0 = time.time()
            print(f"=== step 2: fit_dgp ({it2} iters, wt={args.wt}, "
                  f"gm2={args.gm2}, gm3={args.gm3}) ===", flush=True)
            fit_dgp(snapshot="snapshot-step1-final--0", dlcpath=proj_dir,
                    batch_size=10, maxiters=it2,
                    displayiters=max(it2 // 10, 1),
                    saveiters=max(it2 // 2, 1), wt=args.wt,
                    gm2=args.gm2, gm3=args.gm3,
                    device_flow=args.devflow, lr=args.dgp_lr, lr_decay=True)
            timings["step2_s"] = round(time.time() - t0, 1)

    rows = []
    # with --skip-dgp, stale step-1/2 snapshots (if any) were not produced
    # by this run — don't record their rows as this run's results
    eval_steps = (0,) if args.skip_dgp else (0, 1, 2)
    if args.eval_steps is not None:
        eval_steps = tuple(s for s in eval_steps if s in args.eval_steps)
    for step in eval_steps:
        snap = Path(train_dir) / f"snapshot-step{step}-final--0.ckpt"
        if not snap.exists():
            continue
        for decode in ("dgp", "dlc"):
            res = evaluate_dgp(cfg_path, snap, shuffle=1, decode=decode)
            is_train = res["is_train"]
            rows.append(dict(step=step, decode=decode,
                             train_error=round(float(res["train_error"]), 3),
                             test_error=round(float(res["test_error"]), 3),
                             n_train=int(is_train.sum()),
                             n_test=int((~is_train).sum())))
            print(f"step{step} decode={decode}: "
                  f"train={rows[-1]['train_error']} px "
                  f"test={rows[-1]['test_error']} px "
                  f"(n={rows[-1]['n_train']}/{rows[-1]['n_test']})",
                  flush=True)

    stamp = time.strftime("%Y-%m-%d %H:%M")
    record = dict(date=stamp, platform=platform, tag="sparse",
                  fraction=args.fraction, iters=[it0, it1, it2],
                  step0_batch=args.step0_batch, dgp_lr=args.dgp_lr,
                  wt=args.wt, devflow=bool(args.devflow), gm2=args.gm2,
                  gm3=args.gm3, seed=args.seed,
                  warmstart=str(args.warmstart_from or ""),
                  timings=timings, results=rows)
    if args.scale_jitter is not None:
        record["scale_jitter"] = args.scale_jitter
    if args.skip_dgp:
        record["skip_dgp"] = True
    if preexisting:
        record["reused_steps"] = preexisting
    json_path = REPO_ROOT / "EVAL.json"
    history = json.loads(json_path.read_text()) if json_path.exists() else []
    history.append(record)
    json_path.write_text(json.dumps(history, indent=1))
    print(f"recorded to {json_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
