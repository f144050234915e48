#!/usr/bin/env python
"""int8 MXU probe: can any lowering reach the v5e's 394 TOPS int8 rate?

PERF.md measured that `conv_general_dilated` with int8 inputs runs at bf16
speed (the conv path never engages the int8 MXU rate) — the one lever that
could make 2000 fps *full-frame* physical (ref workload: the ResNet-50
block4 3x3x256 convs, resnet_v1.py bottleneck units). This probe measures,
on the real chip, every candidate lowering at two scales:

* a square matmul (4096^3) — the pure "does the MXU run int8 at 2x" test,
  via XLA `dot_general` and via a Pallas tiled-accumulator kernel;
* the block4-shaped conv (3x3, 256->256, 94x104, b=32) — bf16 conv
  baseline, int8 conv, and conv-as-9-shifted-matmuls (the gather-free
  decomposition a Pallas conv kernel would use).

Measurement protocol (all three lessons learned the hard way on the axon
relay):
1. every timed dispatch must see globally fresh inputs (the relay elides
   repeat (executable, inputs) executions — a naive loop reads 33 PFLOP/s);
2. sync by fetching ONE element, never the buffer (device->host rides a
   ~50 MB/s tunnel; a 64 MB fetch buries the kernel time);
3. amortize the ~5 ms per-dispatch RPC: each timed call runs CHAIN_STEPS
   ops chained through a `lax.fori_loop` carry (each iteration's input is
   the previous output, so iterations are distinct by construction and the
   loop cannot be elided or batched away).

Each section runs in its OWN child process with its own timeout (a Mosaic
crash or a pathological compile in one lowering cannot wedge the session
backend or lose the other sections' numbers), and each measurement is
printed as soon as it completes. Final summary is one JSON line; results
land in PERF.md.

Usage:  python scripts/int8_conv_probe.py              # all sections
        python scripts/int8_conv_probe.py --child SEC  # one section
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
if str(REPO_ROOT) not in sys.path:
    sys.path.insert(0, str(REPO_ROOT))

SECTIONS = ("mm_xla", "mm_pallas", "conv", "conv9")
INNER = 4  # distinct chained dispatches per timed ring
MM_STEPS = 64  # matmuls per dispatch: 64 * 137 GF = 8.8 TF (~45 ms @ peak)
CONV_STEPS = 64  # convs per dispatch: 64 * 36.9 GF = 2.4 TF


def _sync(out):
    # block_until_ready is unreliable over the axon relay (see bench.py);
    # fetch one element of the last output — execution is in-order, so it
    # fences everything before it.
    import jax
    import numpy as np

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf[(0,) * leaf.ndim])


def _bench(fn, make_ring, reps: int = 3) -> float:
    """Best per-call time of ``fn(*args)`` over rings of DISTINCT inputs."""
    ring = make_ring(0)
    out = fn(*ring[0])
    _sync(out)
    best = float("inf")
    for rep in range(reps):
        if rep:
            ring = make_ring(rep)
        _sync(ring[-1][0])
        t0 = time.perf_counter()
        for args in ring:
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / len(ring))
    return best


def _emit(key, value):
    print(json.dumps({key: value}), flush=True)


def _setup():
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    pert = jax.jit(lambda x, s: x + s.astype(x.dtype))  # int8 wraps mod 256

    def vary_first(base, *fixed):
        def make(rep):
            return [(pert(base, jnp.int32(1 + rep * INNER + i)), *fixed)
                    for i in range(INNER)]
        return make

    return jax, jnp, np, rng, vary_first


def _chain(jax, jnp, one_step, steps, to_carry):
    """jit a fn running ``steps`` iterations of x -> to_carry(one_step(x)).

    The carry threads each iteration's output into the next input, so no
    iteration can be elided; to_carry keeps the carry dtype/shape stable
    (e.g. int32 accum -> masked int8, or f32 -> scaled bf16).
    """

    @jax.jit
    def run(x, *fixed):
        def body(_, c):
            return to_carry(one_step(c, *fixed))

        return jax.lax.fori_loop(0, steps, body, x)

    return run


def _mm_operands(jnp, np, rng):
    M = N = K = 4096
    a8 = jnp.asarray(rng.integers(-8, 8, (M, K), dtype=np.int8))
    b8 = jnp.asarray(rng.integers(-8, 8, (K, N), dtype=np.int8))
    return M, N, K, a8, b8, a8.astype(jnp.bfloat16), b8.astype(jnp.bfloat16)


def _carry_bf16(jnp):
    return lambda y: (y * 1e-4).astype(jnp.bfloat16)


def _carry_int8(jnp):
    return lambda y: jnp.bitwise_and(y, 7).astype(jnp.int8)


def sec_mm_xla() -> None:
    jax, jnp, np, rng, vary_first = _setup()
    M, N, K, a8, b8, abf, bbf = _mm_operands(jnp, np, rng)
    flops = 2.0 * M * N * K * MM_STEPS

    mm = lambda x, b, pt: jnp.dot(x, b, preferred_element_type=pt)  # noqa: E731
    f_bf = _chain(jax, jnp, functools.partial(mm, pt=jnp.float32),
                  MM_STEPS, _carry_bf16(jnp))
    t = _bench(f_bf, vary_first(abf, bbf))
    _emit("mm_bf16_tops", round(flops / t / 1e12, 1))
    f_i8 = _chain(jax, jnp, functools.partial(mm, pt=jnp.int32),
                  MM_STEPS, _carry_int8(jnp))
    t = _bench(f_i8, vary_first(a8, b8))
    _emit("mm_int8_xla_tops", round(flops / t / 1e12, 1))


def sec_mm_pallas() -> None:
    jax, jnp, np, rng, vary_first = _setup()
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, N, K, a8, b8, abf, bbf = _mm_operands(jnp, np, rng)
    flops = 2.0 * M * N * K * MM_STEPS
    bm, bn, bk = 512, 512, 1024

    def mm_kernel(x_ref, y_ref, o_ref, acc_ref, *, k_steps, out_dtype):
        @pl.when(pl.program_id(2) == 0)
        def _zero():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] += jnp.dot(x_ref[...], y_ref[...],
                                preferred_element_type=acc_ref.dtype)

        @pl.when(pl.program_id(2) == k_steps - 1)
        def _store():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    def pallas_mm(x, y, acc_dtype, out_dtype):
        k_steps = K // bk
        return pl.pallas_call(
            functools.partial(mm_kernel, k_steps=k_steps,
                              out_dtype=out_dtype),
            grid=(M // bm, N // bn, k_steps),
            in_specs=[
                pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
                pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
            ],
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
            scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
            out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(x, y)

    f_bf = _chain(
        jax, jnp,
        lambda x, b: pallas_mm(x, b, jnp.float32, jnp.float32),
        MM_STEPS, _carry_bf16(jnp))
    t = _bench(f_bf, vary_first(abf, bbf))
    _emit("mm_bf16_pallas_tops", round(flops / t / 1e12, 1))
    f_i8 = _chain(
        jax, jnp,
        lambda x, b: pallas_mm(x, b, jnp.int32, jnp.int32),
        MM_STEPS, _carry_int8(jnp))
    t = _bench(f_i8, vary_first(a8, b8))
    _emit("mm_int8_pallas_tops", round(flops / t / 1e12, 1))


def _conv_operands(jnp, np, rng):
    B, H, W, C = 32, 94, 104, 256
    x8 = jnp.asarray(rng.integers(-8, 8, (B, H, W, C), dtype=np.int8))
    w8 = jnp.asarray(rng.integers(-8, 8, (3, 3, C, C), dtype=np.int8))
    return B, H, W, C, x8, w8, x8.astype(jnp.bfloat16), w8.astype(
        jnp.bfloat16)


def sec_conv() -> None:
    jax, jnp, np, rng, vary_first = _setup()
    B, H, W, C, x8, w8, xbf, wbf = _conv_operands(jnp, np, rng)
    conv_flops = 2.0 * B * H * W * 9 * C * C * CONV_STEPS

    def conv(x, w, pt):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pt)

    f_bf = _chain(jax, jnp, functools.partial(conv, pt=jnp.float32),
                  CONV_STEPS, _carry_bf16(jnp))
    t = _bench(f_bf, vary_first(xbf, wbf))
    _emit("conv_bf16_ms", round(t * 1e3 / CONV_STEPS, 3))
    _emit("conv_bf16_tops", round(conv_flops / t / 1e12, 1))
    f_i8 = _chain(jax, jnp, functools.partial(conv, pt=jnp.int32),
                  CONV_STEPS, _carry_int8(jnp))
    t = _bench(f_i8, vary_first(x8, w8))
    _emit("conv_int8_xla_ms", round(t * 1e3 / CONV_STEPS, 3))
    _emit("conv_int8_xla_tops", round(conv_flops / t / 1e12, 1))


def sec_conv9() -> None:
    # conv as 9 shifted matmuls: SAME-pad once, slice per tap, one
    # (B*H*W, C) @ (C, C) matmul each — dense MXU work, no gathers
    jax, jnp, np, rng, vary_first = _setup()
    B, H, W, C, x8, w8, xbf, wbf = _conv_operands(jnp, np, rng)
    conv_flops = 2.0 * B * H * W * 9 * C * C * CONV_STEPS

    def conv9(x, w, acc_dtype):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        acc = jnp.zeros((B * H * W, C), acc_dtype)
        for dy in range(3):
            for dx in range(3):
                tap = xp[:, dy:dy + H, dx:dx + W, :].reshape(B * H * W, C)
                acc = acc + jnp.dot(tap, w[dy, dx],
                                    preferred_element_type=acc_dtype)
        return acc.reshape(B, H, W, C)

    f_bf = _chain(jax, jnp,
                  lambda x, w: conv9(x, w, jnp.float32),
                  CONV_STEPS, _carry_bf16(jnp))
    t = _bench(f_bf, vary_first(xbf, wbf))
    _emit("conv9_bf16_ms", round(t * 1e3 / CONV_STEPS, 3))
    _emit("conv9_bf16_tops", round(conv_flops / t / 1e12, 1))
    f_i8 = _chain(jax, jnp,
                  lambda x, w: conv9(x, w, jnp.int32),
                  CONV_STEPS, _carry_int8(jnp))
    t = _bench(f_i8, vary_first(x8, w8))
    _emit("conv9_int8_xla_ms", round(t * 1e3 / CONV_STEPS, 3))
    _emit("conv9_int8_xla_tops", round(conv_flops / t / 1e12, 1))


def main() -> int:
    if "--child" in sys.argv:
        sec = sys.argv[sys.argv.index("--child") + 1]
        globals()[f"sec_{sec}"]()
        return 0
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", str(REPO_ROOT))
    res: dict = {}
    for sec in SECTIONS:
        try:
            proc = subprocess.run(
                [sys.executable, str(Path(__file__).resolve()),
                 "--child", sec],
                env=env, cwd=str(REPO_ROOT), text=True, timeout=900,
                stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
            for line in proc.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    res.update(json.loads(line))
            if proc.returncode != 0:
                res[f"{sec}_error"] = f"child rc={proc.returncode}"
        except subprocess.TimeoutExpired:
            res[f"{sec}_error"] = "timeout (900s)"
        print(json.dumps({"done": sec}), file=sys.stderr, flush=True)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
