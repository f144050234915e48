#!/usr/bin/env python
"""Hardware pass/fail + benchmark for the Pallas soft-argmax kernel.

Runs the compiled (non-interpret) kernel on the attached TPU in a CHILD
process — a Mosaic compile crash (SIGABRT in the remote compile helper) can
wedge this dev environment's backend for a long time, so the parent never
touches the TPU and survives any outcome. Compares numerics against the
XLA path (ops.softargmax.softargmax_2d) and times both at the Reaching
scoremap scale. Results are recorded in PERF.md ("Pallas on hardware").

Usage:  python scripts/pallas_hw_check.py            # spawns the child
        python scripts/pallas_hw_check.py --child    # the actual run
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))


def child() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepgraphpose_tpu.ops.pallas.softargmax_kernel import (
        softargmax_2d_pallas)
    from deepgraphpose_tpu.ops.softargmax import softargmax_2d

    platform = jax.devices()[0].platform
    t, h, w, c = 32, 94, 104, 14  # Reaching-scale scoremaps, batch 32
    rng = np.random.default_rng(0)
    sm = jnp.asarray(rng.normal(0, 3, (t, h, w, c)).astype(np.float32))

    pallas_fn = jax.jit(lambda s: softargmax_2d_pallas(s, 1.0, 2.0))
    xla_fn = jax.jit(lambda s: softargmax_2d(s, gamma=1.0, gauss_len=2.0)[0])

    mu_p = np.asarray(pallas_fn(sm))   # compile + run (the risky part)
    mu_x = np.asarray(xla_fn(sm))
    max_err = float(np.abs(mu_p - mu_x).max())

    def bench(fn):
        np.asarray(fn(sm))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(sm)
            np.asarray(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        return best * 1e3  # ms

    print(json.dumps({
        "platform": platform, "shape": [t, h, w, c],
        "max_abs_err_cells": max_err,
        "pallas_ms": round(bench(pallas_fn), 3),
        "xla_ms": round(bench(xla_fn), 3),
        "ok": bool(max_err < 1e-3),
    }))
    return 0


def main() -> int:
    if "--child" in sys.argv:
        return child()
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", str(REPO_ROOT))
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).resolve()), "--child"],
        env=env, cwd=str(REPO_ROOT), text=True, timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    sys.stdout.write(proc.stdout)
    if proc.returncode != 0:
        print(json.dumps({"ok": False, "rc": proc.returncode,
                          "note": "child crashed — mark kernel experimental"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
