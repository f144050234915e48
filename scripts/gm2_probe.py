#!/usr/bin/env python
"""Exercise gm2 hidden-confidence scaling on an UNSATURATED model.

Round-4 finding (EVAL.md): at the stable sparse recipe (20k step-0
iters) the gm2=2 arm was bit-identical to wt=0 because hidden-frame
peak confidences saturate at 1.0 (confidence**gm2 == 1, ref:
fitdgp.py:994-1021). This probe closes the gap with a model that is
measurably NOT saturated:

  --confidence WD   load WD's snapshot-step1-final--0, forward evenly
                    spaced frames of the stand-in video (the hidden-
                    frame population), print peak-likelihood stats —
                    "unsaturated" becomes a measured claim.
  --diff WD1 WD2    compare the final step-2 block of learning_stats.csv
                    between the wt=0 arm (WD1) and the gm2 arm (WD2).
                    Differing per-interval losses prove confidence**gm2
                    != 1 at the visited parameters, i.e. the branch
                    scaled a real trajectory.

Both subcommands append a tag="gm2_probe" record to EVAL.json.
"""

from __future__ import annotations

import argparse
import csv
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

PROJ = "Reaching-Mackenzie-2018-08-30"


def _record(kind: str, payload: dict) -> None:
    import jax

    rec = dict(date=time.strftime("%Y-%m-%d %H:%M"),
               platform=jax.devices()[0].platform, tag="gm2_probe",
               kind=kind, **payload)
    path = REPO_ROOT / "EVAL.json"
    hist = json.loads(path.read_text()) if path.exists() else []
    hist.append(rec)
    path.write_text(json.dumps(hist, indent=1))
    print(f"recorded to {path} (tag=gm2_probe kind={kind})", flush=True)


def confidence(workdir: Path, n_frames: int = 32, batch: int = 8) -> None:
    import jax
    import jax.numpy as jnp

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.data.video import VideoReader
    from deepgraphpose_tpu.infer.predict import make_infer_fn
    from deepgraphpose_tpu.models.pose_model import init_model
    from deepgraphpose_tpu.train.fit import resolve_project

    proj_dir = workdir / PROJ
    _, cfg, train_dir = resolve_project(proj_dir, shuffle=1)
    snap = Path(train_dir) / "snapshot-step1-final--0.ckpt"
    vids = sorted((proj_dir / "videos_dgp").glob("*.avi"))
    reader = VideoReader(vids[0])
    idxs = np.linspace(0, reader.n_frames - 1, n_frames).astype(int)
    frames = np.stack([reader.read_frame(int(i)) for i in idxs])
    h, w = frames.shape[1:3]

    model, variables = init_model(cfg, jax.random.PRNGKey(0), (h, w),
                                  dtype=jnp.bfloat16)
    variables, _ = ckpt_lib.load_snapshot(snap, variables)
    infer = make_infer_fn(model, cfg)
    liks = []
    for s in range(0, n_frames, batch):
        arr = frames[s:s + batch]
        if len(arr) < batch:
            arr = np.concatenate([arr, arr[-1:].repeat(batch - len(arr), 0)])
        _, l = infer(variables, jnp.asarray(arr))
        liks.append(np.asarray(l)[:len(frames[s:s + batch])])
    lik = np.concatenate(liks).ravel()  # (frames*joints,) peak sigmoid
    stats = dict(snapshot=str(snap), n_frames=int(n_frames),
                 n_joints=int(lik.size // n_frames),
                 mean=round(float(lik.mean()), 4),
                 median=round(float(np.median(lik)), 4),
                 p90=round(float(np.percentile(lik, 90)), 4),
                 max=round(float(lik.max()), 4),
                 frac_above_0p99=round(float((lik > 0.99).mean()), 4))
    print(json.dumps(stats), flush=True)
    _record("confidence", dict(workdir=str(workdir), stats=stats))


def _final_step_block(stats_csv: Path) -> list[tuple[int, float]]:
    """Rows of the last (iteration-resetting) block of learning_stats.csv."""
    rows = []
    with open(stats_csv) as f:
        for r in csv.DictReader(f):
            rows.append((int(float(r["iteration"])), float(r["loss"])))
    start = 0
    for i in range(1, len(rows)):
        if rows[i][0] <= rows[i - 1][0]:
            start = i
    return rows[start:]


def diff(wd1: Path, wd2: Path) -> None:
    from deepgraphpose_tpu.train.fit import resolve_project

    blocks = {}
    for wd in (wd1, wd2):
        _, _, train_dir = resolve_project(wd / PROJ, shuffle=1)
        blocks[wd] = _final_step_block(Path(train_dir) /
                                       "learning_stats.csv")
    b1, b2 = blocks[wd1], blocks[wd2]
    n = min(len(b1), len(b2))
    pairs = [dict(iteration=b1[i][0], loss_wt0=b1[i][1],
                  loss_gm2=b2[i][1],
                  delta=round(b2[i][1] - b1[i][1], 6))
             for i in range(n)]
    max_abs = max((abs(p["delta"]) for p in pairs), default=0.0)
    identical = all(p["delta"] == 0.0 for p in pairs)
    for p in pairs:
        print(json.dumps(p), flush=True)
    summary = dict(n_intervals=n, max_abs_delta=round(max_abs, 6),
                   bit_identical=identical)
    print(json.dumps(summary), flush=True)
    _record("traj_diff", dict(workdir_wt0=str(wd1), workdir_gm2=str(wd2),
                              pairs=pairs, **summary))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--confidence", type=Path, default=None,
                    metavar="WORKDIR")
    ap.add_argument("--diff", type=Path, nargs=2, default=None,
                    metavar=("WD_WT0", "WD_GM2"))
    args = ap.parse_args()
    if args.confidence is not None:
        confidence(args.confidence)
    if args.diff is not None:
        diff(*args.diff)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
