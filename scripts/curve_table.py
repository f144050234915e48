#!/usr/bin/env python
"""Render the sparse-label transition curve from EVAL.json.

The round-4 verdict's top ask: turn the two semi-supervised anecdotes
(positive at 52 labels / n_test=3, negative at 11 / n_test=44) into a
measured breadth-vs-delta curve (ref: README.md:3-5 — the DGP claim this
curve tests). Collects every tag=="sparse" record (plus the hand-recorded
0.95 chain from EVAL.md), groups by (fraction, iters, gm2, gm3, wt), and
prints per-arm step0/step2 test RMSE and delta = step2 - step0 for both
decodes. Markdown output is pasted into EVAL.md.

Usage: python scripts/curve_table.py [--md]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent

# The 0.95-fraction chain (52 train / 3 test) predates the sparse tag:
# EVAL.md "DGP 3-step pipeline" 2026-08-18 07:04 run, dlc decode
# 8.48 -> 8.18 px, dgp decode 9.52 -> 9.09 px (n_test=3).
HAND_POINTS = [
    dict(fraction=0.95, n_train=52, n_test=3, arm="wt=0 (EVAL.md 08-18)",
         dlc=(8.48, 8.18), dgp=(9.52, 9.09)),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--md", action="store_true", help="markdown table")
    args = ap.parse_args(argv)

    hist = json.loads((REPO_ROOT / "EVAL.json").read_text())
    points = []
    for rec in hist:
        if rec.get("tag") != "sparse" or rec.get("skip_dgp"):
            continue
        rows = {(r["step"], r["decode"]): r for r in rec.get("results", [])}
        if not rows:
            continue
        arm_bits = []
        if rec.get("gm2"):
            arm_bits.append(f"gm2={rec['gm2']}")
        if rec.get("gm3"):
            arm_bits.append(f"gm3={rec['gm3']}")
        if rec.get("wt"):
            arm_bits.append(f"wt={rec['wt']}")
        it0 = rec.get("iters", [0])[0]
        if it0 and it0 < 20000:
            arm_bits.append(f"it0={it0}")
        if rec.get("scale_jitter"):
            lo, up = rec["scale_jitter"]
            arm_bits.append(f"jitter={lo:g}-{up:g}")
        arm = " ".join(arm_bits) or "wt=0"
        # warmstart arms eval only step 2; step0 is filled from the
        # same-fraction base chain's record in the pass below
        point = dict(fraction=rec["fraction"], arm=arm, date=rec["date"])
        for decode in ("dlc", "dgp"):
            s0 = rows.get((0, decode))
            s2 = rows.get((2, decode))
            if s0 is not None:
                point["n_train"] = s0["n_train"]
                point["n_test"] = s0["n_test"]
            if s0 is not None and s2 is not None:
                point[decode] = (s0["test_error"], s2["test_error"])
            elif s2 is not None:
                point[decode] = (None, s2["test_error"])
                point.setdefault("n_train", s2["n_train"])
                point.setdefault("n_test", s2["n_test"])
        points.append(point)

    # fill missing step0 for warmstarted arms from the same-fraction base;
    # jitter/it0 recipe variants are their own base lineage (a gm arm
    # warm-started from the default-recipe chain must not pick up a
    # scale-jitter chain's step-0 numbers, and vice versa)
    def lineage(arm: str) -> tuple:
        return ("it0" in arm, "jitter" in arm)

    base = {}
    for p in points:
        if p["arm"] == "wt=0" or all(
                b.startswith(("it0", "jitter")) for b in p["arm"].split()):
            base[(p["fraction"], lineage(p["arm"]))] = p
    for p in points:
        for decode in ("dlc", "dgp"):
            pair = p.get(decode)
            if pair and pair[0] is None:
                b = base.get((p["fraction"], lineage(p["arm"])))
                if b and b.get(decode):
                    p[decode] = (b[decode][0], pair[1])

    points.extend(HAND_POINTS)
    points.sort(key=lambda p: (p.get("n_train", 0), p["arm"]))

    sep = "|" if args.md else "  "
    hdr = ["labels (train/test)", "arm", "dlc step0->step2 (delta)",
           "dgp step0->step2 (delta)"]
    lines = []
    if args.md:
        lines.append("| " + " | ".join(hdr) + " |")
        lines.append("|" + "|".join("---" for _ in hdr) + "|")
    else:
        lines.append("  ".join(hdr))
    for p in points:
        cells = [f"{p.get('n_train', '?')}/{p.get('n_test', '?')}", p["arm"]]
        for decode in ("dlc", "dgp"):
            pair = p.get(decode)
            if not pair or pair[0] is None:
                cells.append("-")
                continue
            s0, s2 = pair
            cells.append(f"{s0:.2f} -> {s2:.2f} ({s2 - s0:+.2f})")
        if args.md:
            lines.append("| " + " | ".join(cells) + " |")
        else:
            lines.append("  ".join(f"{c:<28}" for c in cells))
    print("\n".join(lines))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
