#!/usr/bin/env python
"""Long-video streaming inference demo (BASELINE.json config #5).

Shards the time axis of a (potentially hour-long) video over every
available chip (`jax.sharding.Mesh`), decodes locally per shard, exchanges
the one-frame temporal halo over ICI (`lax.ppermute`), optionally runs the
exact time-sharded EWMA smoother on device, and writes DLC-format CSV/H5.

Single-chip hosts work too (mesh of 1). To exercise the multi-chip path
without hardware:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python demo/run_streaming_inference.py --dlcpath <project> \
        --video <video> [--snapshot snapshot-step2-final--0] [--smooth]

Usage on TPU pods: run as-is; the mesh spans all local devices.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dlcpath", required=True)
    ap.add_argument("--video", required=True)
    ap.add_argument("--shuffle", type=int, default=1)
    ap.add_argument("--snapshot", default=None,
                    help="snapshot name under the train dir "
                         "(default: latest)")
    ap.add_argument("--frames-per-device", type=int, default=16)
    ap.add_argument("--max-frames", type=int, default=None)
    ap.add_argument("--smooth", action="store_true",
                    help="confidence-gated EWMA on device (exact across "
                         "shard boundaries)")
    ap.add_argument("--output", default=None,
                    help="output dir (default: <dlcpath>/videos_pred)")
    args = ap.parse_args(argv)

    import jax

    from deepgraphpose_tpu.core import checkpoint as ckpt_lib
    from deepgraphpose_tpu.parallel.mesh import make_mesh
    from deepgraphpose_tpu.parallel.streaming import estimate_pose_multichip
    from deepgraphpose_tpu.train.fit import resolve_project

    dlcpath = Path(args.dlcpath)
    _, _, train_dir = resolve_project(dlcpath, args.shuffle)
    if args.snapshot:
        snap = Path(train_dir) / f"{args.snapshot}{ckpt_lib.CKPT_SUFFIX}"
    else:
        snap = ckpt_lib.latest_snapshot(train_dir)
    if snap is None or not Path(snap).exists():
        print(f"no snapshot under {train_dir}; train first", file=sys.stderr)
        return 1

    mesh = make_mesh()
    n_dev = len(mesh.devices.ravel())
    out_dir = Path(args.output) if args.output else dlcpath / "videos_pred"
    print(f"streaming {args.video} over {n_dev} device(s) "
          f"({args.frames_per_device} frames/device/step) "
          f"from {Path(snap).name}")
    t0 = time.time()
    labels = estimate_pose_multichip(
        dlcpath / "config.yaml", snap, args.video, out_dir, mesh=mesh,
        shuffle=args.shuffle, frames_per_device=args.frames_per_device,
        max_frames=args.max_frames, smooth=args.smooth)
    dt = time.time() - t0
    n = labels["x"].shape[0]
    print(f"{n} frames in {dt:.1f}s = {n / dt:.1f} frames/s aggregate "
          f"({n / dt / n_dev:.1f}/chip); mean temporal displacement "
          f"{labels['displacement'][1:].mean():.3f} scoremap px")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
