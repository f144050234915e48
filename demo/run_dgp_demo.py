#!/usr/bin/env python
"""DeepGraphPose demo pipeline — TPU-native rebuild.

Same CLI and orchestration contract as the reference demo
(ref: demo/run_dgp_demo.py:114-310): steps 0 (DLC warm-start) -> 1 (DGP
labeled-only) -> 2 (full DGP) -> 3 (predict + label every video in
videos_dgp/), with ``--test`` truncating iterations (2/2/5) and videos
(10 s) for a runnable smoke check.

Usage:
  python demo/run_dgp_demo.py --dlcpath <project> [--shuffle 1]
      [--dlcsnapshot <name>] [--batch_size 10] [--test]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dlcpath", type=str, required=True,
                        help="path to the DLC project folder")
    parser.add_argument("--dlcsnapshot", type=str, default=None,
                        help="use a prefit DLC snapshot and skip step 0")
    parser.add_argument("--shuffle", type=int, default=1)
    parser.add_argument("--batch_size", type=int, default=10)
    parser.add_argument("--test", action="store_true",
                        help="tiny iteration counts + clipped videos")
    parser.add_argument("--maxiters", type=int, default=None)
    parser.add_argument("--wt", type=float, default=0.0,
                        help="temporal clique weight")
    parser.add_argument("--gm2", type=int, default=0)
    parser.add_argument("--gm3", type=int, default=0)
    args = parser.parse_args(argv)

    from deepgraphpose_tpu.core import paths as paths_lib
    from deepgraphpose_tpu.train.fit import (fit_dlc, fit_dgp,
                                             fit_dgp_labeledonly,
                                             resolve_project)
    from deepgraphpose_tpu.infer.video_writer import plot_dgp

    dlcpath = Path(args.dlcpath)
    proj, cfg, train_dir = resolve_project(dlcpath, args.shuffle)

    if args.test:
        it0, it1, it2 = 2, 2, 5
        display = 1
        max_frames = None  # bounded below by 10 s of video
    else:
        it0 = it1 = args.maxiters or 200000
        it1 = min(it1, 50000)
        it2 = args.maxiters or 200000
        display = 100
        max_frames = None

    # ---- step 0: DLC warm-start -------------------------------------
    if args.dlcsnapshot is None:
        print("\n=== step 0: fit_dlc ===", flush=True)
        fit_dlc(dlcpath=dlcpath, shuffle=args.shuffle, maxiters=it0,
                displayiters=display, saveiters=max(it0 // 2, 1))
        snapshot0 = "snapshot-step0-final--0"
    else:
        snapshot0 = args.dlcsnapshot

    # ---- step 1: DGP labeled-only -----------------------------------
    print("\n=== step 1: fit_dgp_labeledonly ===", flush=True)
    fit_dgp_labeledonly(snapshot=snapshot0, dlcpath=dlcpath,
                        shuffle=args.shuffle, maxiters=it1,
                        displayiters=display,
                        saveiters=max(it1 // 2, 1),
                        nepoch=1 if args.test else 100)

    # ---- step 2: full DGP -------------------------------------------
    print("\n=== step 2: fit_dgp ===", flush=True)
    fit_dgp(snapshot="snapshot-step1-final--0", dlcpath=dlcpath,
            batch_size=args.batch_size, shuffle=args.shuffle,
            maxiters=it2, displayiters=display,
            saveiters=max(it2 // 2, 1), wt=args.wt, gm2=args.gm2,
            gm3=args.gm3, nepoch=1 if args.test else 100)
    snapshot_path = (train_dir / "snapshot-step2-final--0.ckpt")

    # ---- step 3: predict + label videos in videos_dgp/ ---------------
    print("\n=== step 3: predict videos ===", flush=True)
    video_dir = paths_lib.videos_dgp_dir(dlcpath)
    videos = paths_lib.list_videos(video_dir)
    out_dir = paths_lib.videos_pred_dir(dlcpath)
    for video in videos:
        if args.test:
            from deepgraphpose_tpu.data.video import VideoReader

            r = VideoReader(video)
            max_frames = int(min(r.n_frames, r.fps * 10))
            r.close()
        print(f"predicting {video}", flush=True)
        plot_dgp(video, out_dir, dlcpath / "config.yaml", snapshot_path,
                 shuffle=args.shuffle, max_frames=max_frames)
    print("\ndemo complete", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
