#!/usr/bin/env python
"""Measure the int8 forward's carry-width variants on the real chip.

Round-3 finding: with an f32 inter-layer carry, the int8 backbone measured
0.88x the bf16 model end-to-end (BENCH int8_full_frame 639.6 vs 727.0 fps)
even though the isolated int8 conv runs 2.1x bf16 (PERF.md int8 MXU
probe) — the MXU win drowned in quant/dequant HBM traffic. This probe
times the full b=128 forward for each carry scheme:

  bf16        unquantized baseline
  f32carry    int8 convs, f32 activations between layers (round-3 initial)
  bf16carry   int8 convs, bf16 activations at branch points
  int8carry   + epilogue requantization inside bottleneck chains
              (conv1->conv2->conv3 tensors are 1 byte/element) — default

Usage: python scripts/int8_carry_probe.py
"""

import json
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from deepgraphpose_tpu.utils.compile_cache import ensure_compile_cache  # noqa: E402

ensure_compile_cache()

from deepgraphpose_tpu.core.config import PoseConfig  # noqa: E402
from deepgraphpose_tpu.infer.predict import make_infer_fn  # noqa: E402
from deepgraphpose_tpu.models.pose_model import init_model  # noqa: E402
from deepgraphpose_tpu.models.quant import quantize_model  # noqa: E402


def stream_fps(infer, variables, ring, batch, n_batches=16, reps=5,
               agree=0.03, max_reps=20):
    mu, _ = infer(variables, ring[0])
    np.asarray(mu)

    def one_rep():
        t0 = time.perf_counter()
        res = [infer(variables, ring[i % len(ring)]) for i in range(n_batches)]
        for m, l in res:
            np.asarray(m)
        return n_batches * batch / (time.perf_counter() - t0)

    samples = [one_rep() for _ in range(reps)]
    while len(samples) < max_reps:
        top = sorted(samples, reverse=True)
        if len(top) >= 2 and top[1] >= top[0] * (1 - agree):
            break
        samples.append(one_rep())
    return max(samples)


def main():
    h, w, batch = 747, 832, 128
    cfg = PoseConfig(num_joints=5, net_type="resnet_50",
                     all_joints_names=[f"bp{i}" for i in range(5)])
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (h, w),
                                  dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ring = [jax.device_put(rng.integers(0, 255, (batch, h, w, 3),
                                        dtype=np.uint8)) for _ in range(4)]
    calib = np.asarray(ring[0][:8])

    out = {}
    out["bf16_fps"] = round(stream_fps(make_infer_fn(model, cfg), variables,
                                       ring, batch), 1)
    for name, kw in [
            ("f32carry", dict(carry_dtype=jnp.float32, int8_carry=False)),
            ("bf16carry", dict(carry_dtype=jnp.bfloat16, int8_carry=False)),
            ("int8carry", dict(carry_dtype=jnp.bfloat16, int8_carry=True))]:
        qmodel, qvars = quantize_model(cfg, variables, calib, **kw)
        fps = stream_fps(make_infer_fn(qmodel, cfg), qvars, ring, batch)
        out[f"{name}_fps"] = round(fps, 1)
        out[f"{name}_vs_bf16"] = round(fps / out["bf16_fps"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
