"""Pallas TPU kernel: fused 2-D soft-argmax.

One kernel program per (frame, joint) confidence map fuses the whole decode
chain of ``ops.softargmax.softargmax_2d`` (ref: src/deepgraphpose/models/
fitdgp_util.py:342-402) in VMEM:

    softmax(gamma * scoremap) over H*W
    -> separable Gaussian smoothing (zero padding, radius = sigma * truncate)
    -> renormalize
    -> expectation over the (row, col) grid

and emits only the (row, col) coordinates — the (T, H, W, C) probability
tensor never round-trips to HBM (one read of the scoremaps, one 2-float
SMEM write per map).

Measured on TPU v5e (32x14 maps of 94x104): ~1.5 ms, on par with the XLA
lowering at Precision.HIGHEST, and 1000x more accurate than XLA's *default*
TPU conv precision (2e-5 vs 3e-2 scoremap cells against a float64
reference) because the shifted-add smoothing never leaves f32. The jnp path
in ops.softargmax now forces HIGHEST for the same reason; this kernel is
the option that keeps full f32 regardless of global precision flags, and
the building block for fusing the decode into future Pallas pipelines.

Layout: maps are processed as (T*C, H, W), one map per program, as plain
2-D (H, W) blocks — W on lanes (padded to 128 by Mosaic), H on sublanes. A
whole Reaching-scale map (94x104 f32 = 39 KiB) fits VMEM trivially; the
smoothing is unrolled shifted adds over a zero-padded VMEM scratch — a few
static slices instead of a feature_group_count conv.

Training integration: ``softargmax_2d_pallas`` carries a custom VJP whose
backward recomputes through the reference jnp implementation
(ops.softargmax.softargmax_2d), so gradients are bit-identical to the XLA
path while the (far more frequent) forward uses the fused kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepgraphpose_tpu.ops import softargmax as softargmax_ref


def _kernel(x_ref, mu_ref, pad_ref, *, gamma: float, kernel: tuple[float, ...],
            h: int, w: int):
    """One program = one (frame, joint) map.

    The map is processed as a plain (H, W) 2-D block — reductions over 3-D
    blocks with keepdims produce (n, 1, 1) layouts that crash Mosaic's
    layout inference on v5e, so everything here stays 2-D (reductions go
    straight to scalars) and the two coordinates land in an SMEM output
    indexed by program_id (grid steps are sequential on TPU, so all
    programs share one whole-array output block).
    """
    radius = (len(kernel) - 1) // 2
    i = pl.program_id(0)

    x = x_ref[0].astype(jnp.float32) * gamma              # (H, W)
    m = jnp.max(x)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e)

    if radius > 0:
        # rows then cols: zero-padded shifted adds (separable Gaussian)
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[radius:radius + h, :w] = p
        acc = jnp.zeros((h, w), jnp.float32)
        for d, kv in enumerate(kernel):
            acc = acc + kv * pad_ref[d:d + h, :w]
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[:h, radius:radius + w] = acc
        acc = jnp.zeros((h, w), jnp.float32)
        for d, kv in enumerate(kernel):
            acc = acc + kv * pad_ref[:h, d:d + w]
        p = acc / jnp.sum(acc)

    # tpu.iota only produces integers; cast afterwards
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    mu_ref[i, 0] = jnp.sum(p * rows)
    mu_ref[i, 1] = jnp.sum(p * cols)


def _softargmax_pallas_fwd_impl(scoremaps: jnp.ndarray, gamma: float,
                                gauss_len: float, truncate: float,
                                interpret: bool) -> jnp.ndarray:
    t, h, w, c = scoremaps.shape
    radius = int(gauss_len * truncate)
    if radius > 0:
        # same formula as ops.softargmax.gaussian_kernel_1d, in numpy so the
        # taps are trace-time constants
        xs = np.arange(-radius, radius + 1, dtype=np.float64)
        k = np.exp(-0.5 * np.square(xs / gauss_len))
        kernel = tuple(float(v) for v in (k / k.sum()))
    else:
        kernel = (1.0,)

    # (T, H, W, C) -> (T*C, H, W): one XLA transpose, then maps are
    # contiguous per program.
    maps = jnp.transpose(scoremaps, (0, 3, 1, 2)).reshape(t * c, h, w)

    mu_flat = pl.pallas_call(
        functools.partial(_kernel, gamma=float(gamma), kernel=kernel,
                          h=h, w=w),
        grid=(t * c,),
        in_specs=[pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((t * c, 2), lambda i: (0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((t * c, 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h + 2 * radius, w + 2 * radius),
                                   jnp.float32)],
        interpret=interpret,
    )(maps)
    return mu_flat.reshape(t, c, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def softargmax_2d_pallas(scoremaps: jnp.ndarray, gamma: float = 1.0,
                         gauss_len: float = 2.0, truncate: float = 1.0,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused soft-argmax: (T, H, W, C) logits -> (T, C, 2) (row, col).

    Numerics match ``ops.softargmax.softargmax_2d(...)[0]`` (tested to
    ~1e-5); gradients are routed through the jnp reference implementation.
    Set ``interpret=True`` to run the kernel in interpreter mode (CPU CI).
    """
    return _softargmax_pallas_fwd_impl(scoremaps, gamma, gauss_len, truncate,
                                       interpret)


def _fwd(scoremaps, gamma, gauss_len, truncate, interpret):
    mu = _softargmax_pallas_fwd_impl(scoremaps, gamma, gauss_len, truncate,
                                     interpret)
    return mu, scoremaps


def _bwd(gamma, gauss_len, truncate, interpret, scoremaps, g):
    # exact adjoint of the reference implementation (recompute-in-backward;
    # the forward never saved the smoothed maps, so this trades FLOPs for
    # the HBM traffic the kernel saved)
    _, vjp = jax.vjp(
        lambda s: softargmax_ref.softargmax_2d(s, gamma=gamma,
                                               gauss_len=gauss_len)[0],
        scoremaps)
    return (vjp(g)[0],)


softargmax_2d_pallas.defvjp(_fwd, _bwd)
