#!/usr/bin/env python
"""Host Farneback vs device LK optical flow on REAL Reaching frames.

The temporal clique (wt > 0) can take its flow from two implementations:

* ``data/flow.py`` — OpenCV Farneback on the host, the reference's exact
  semantics (ref: fitdgp_util.py:454-467 learn_wt);
* ``ops/flow_device.py`` — pyramidal Lucas-Kanade on the TPU, used by the
  HBM-pool training path (``device_flow=True``) so the hot loop never
  leaves the device.

The unit test (tests/test_flow_device.py) checks spatial agreement on
synthetic translations; the wt>0 TRAINING evidence (EVAL.md) used device
LK. This script closes the loop at scale on real data: for pairs of real
Reaching lab frames it measures (a) dense-field correlation, (b) the
box-mean flows around the true marker locations — the exact quantity the
loss consumes (ops/cliques.py::box_mean_flow), (c) the resulting
``temporal_clique_loss`` under each flow, and appends a "flow_parity"
record to EVAL.json.

Run (CPU is fine — LK is jit-able anywhere):
  JAX_PLATFORMS=cpu python scripts/flow_parity.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

REFERENCE_FRAMES = Path(
    "/root/reference/data/Reaching-Mackenzie-2018-08-30/labeled-data/"
    "reachingvideo1")


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--frames-dir", type=Path, default=REFERENCE_FRAMES)
    ap.add_argument("--n-pairs", type=int, default=8)
    ap.add_argument("--no-record", action="store_true")
    ap.add_argument("--platform", default="cpu",
                    help="jax platform (default cpu — sitecustomize re-pins "
                    "axon AFTER env vars, so the env var alone does not "
                    "move a standalone script off the chip; see CLAUDE.md)")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", args.platform)

    import cv2
    import jax.numpy as jnp

    from deepgraphpose_tpu.data import project as project_io
    from deepgraphpose_tpu.data.flow import flow_magnitude_sequence
    from deepgraphpose_tpu.ops.cliques import (box_mean_flow,
                                               temporal_clique_loss)
    from deepgraphpose_tpu.ops.flow_device import flow_magnitude_device

    pngs = {int("".join(c for c in p.stem if c.isdigit())): p
            for p in sorted(args.frames_dir.glob("img*.png"))}
    idxs = sorted(pngs)
    # adjacent labeled indices = the smallest real temporal gaps available
    # (the bundled video is LFS-stripped); both flows see the same pairs
    pairs = list(zip(idxs[:-1], idxs[1:]))[:args.n_pairs]

    csv = next(args.frames_dir.glob("CollectedData_*.csv"))
    labels = project_io.read_collected_data_csv(csv)
    by_name = {Path(p).name: xy for p, xy in
               zip(labels.image_paths, labels.coords_xy)}

    lk = jax.jit(flow_magnitude_device)
    rows = []
    for i0, i1 in pairs:
        f0 = cv2.cvtColor(cv2.imread(str(pngs[i0])), cv2.COLOR_BGR2RGB)
        f1 = cv2.cvtColor(cv2.imread(str(pngs[i1])), cv2.COLOR_BGR2RGB)
        if f0.shape != f1.shape:
            print(f"skipping pair ({i0},{i1}): sizes {f0.shape} vs "
                  f"{f1.shape}", flush=True)
            continue
        frames = np.stack([f0, f1])
        host = flow_magnitude_sequence(frames)[0]
        dev = np.asarray(lk(jnp.asarray(frames)))[0]

        m = 24  # interior: both methods pad/extrapolate borders differently
        a = host[m:-m, m:-m].ravel()
        b = dev[m:-m, m:-m].ravel()
        r_dense = float(np.corrcoef(a, b)[0, 1])

        # the quantity the loss consumes: box-mean flow around the true
        # marker pair (window=10, as in temporal_clique_loss)
        xy0 = by_name.get(pngs[i0].name)
        xy1 = by_name.get(pngs[i1].name)
        rec = dict(pair=[i0, i1], r_dense=round(r_dense, 3),
                   host_mean=round(float(a.mean()), 3),
                   lk_mean=round(float(b.mean()), 3))
        if xy0 is not None and xy1 is not None:
            coords = np.stack([xy0[:, ::-1], xy1[:, ::-1]])  # (2, nj, rc)
            vis = np.isfinite(coords).all(axis=(0, 2))
            if vis.any():
                coords = np.nan_to_num(coords[:, vis])
                h_in, w_in = host.shape
                p0, p1 = coords[0], coords[1]
                win = 10.0
                r_min = np.maximum(np.minimum(p0[:, 0], p1[:, 0]) - win, 0)
                r_max = np.minimum(np.maximum(p0[:, 0], p1[:, 0]) + win, h_in)
                c_min = np.maximum(np.minimum(p0[:, 1], p1[:, 1]) - win, 0)
                c_max = np.minimum(np.maximum(p0[:, 1], p1[:, 1]) + win, w_in)
                bm = jax.jit(box_mean_flow)
                host_box = np.asarray(bm(jnp.asarray(host[None]),
                                         jnp.asarray(r_min[None]),
                                         jnp.asarray(c_min[None]),
                                         jnp.asarray(r_max[None]),
                                         jnp.asarray(c_max[None])))[0]
                dev_box = np.asarray(bm(jnp.asarray(dev[None]),
                                        jnp.asarray(r_min[None]),
                                        jnp.asarray(c_min[None]),
                                        jnp.asarray(r_max[None]),
                                        jnp.asarray(c_max[None])))[0]
                tcl = jax.jit(temporal_clique_loss,
                              static_argnames=("scoremap_hw",))
                cj = jnp.asarray(coords, jnp.float32)
                wt_b = jnp.ones((1,), jnp.float32)
                pm = jnp.ones((1,), jnp.float32)
                sm_hw = (h_in // 8, w_in // 8)
                wl_host = float(tcl(cj, jnp.asarray(host[None]), wt_b, 5.0,
                                    pm, scoremap_hw=sm_hw))
                wl_dev = float(tcl(cj, jnp.asarray(dev[None]), wt_b, 5.0,
                                   pm, scoremap_hw=sm_hw))
                rec.update(
                    r_box=round(float(np.corrcoef(host_box, dev_box)[0, 1]),
                                3) if len(host_box) > 2 else None,
                    host_box_mean=round(float(host_box.mean()), 3),
                    lk_box_mean=round(float(dev_box.mean()), 3),
                    wt_loss_host=round(wl_host, 6),
                    wt_loss_lk=round(wl_dev, 6),
                    wt_loss_ratio=round(wl_dev / max(wl_host, 1e-12), 3))
        rows.append(rec)
        print(rec, flush=True)

    r_dense = [r["r_dense"] for r in rows]
    ratios = [r["wt_loss_ratio"] for r in rows if "wt_loss_ratio" in r]
    r_boxes = [r["r_box"] for r in rows if r.get("r_box") is not None]
    summary = dict(
        n_pairs=len(rows),
        r_dense_median=round(float(np.median(r_dense)), 3),
        r_box_median=round(float(np.median(r_boxes)), 3) if r_boxes else None,
        wt_loss_ratio_median=round(float(np.median(ratios)), 3)
        if ratios else None,
        wt_loss_ratio_range=[round(float(np.min(ratios)), 3),
                             round(float(np.max(ratios)), 3)]
        if ratios else None)
    print("SUMMARY", json.dumps(summary), flush=True)

    if not args.no_record:
        import jax

        record = dict(date=time.strftime("%Y-%m-%d %H:%M"),
                      platform=jax.devices()[0].platform,
                      tag="flow_parity", frames=str(args.frames_dir),
                      summary=summary, pairs=rows)
        json_path = REPO_ROOT / "EVAL.json"
        history = (json.loads(json_path.read_text())
                   if json_path.exists() else [])
        history.append(record)
        json_path.write_text(json.dumps(history, indent=1))
        print(f"recorded to {json_path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
