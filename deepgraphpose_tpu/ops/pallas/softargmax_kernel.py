"""Pallas TPU kernel: fused 2-D soft-argmax.

One kernel program per (frame, joint) confidence map fuses the whole decode
chain of ``ops.softargmax.softargmax_2d`` (ref: src/deepgraphpose/models/
fitdgp_util.py:342-402) in VMEM:

    softmax(gamma * scoremap) over H*W
    -> separable Gaussian smoothing (zero padding, radius = sigma * truncate)
    -> renormalize
    -> expectation over the (row, col) grid

and emits only the (row, col) coordinates — the (T, H, W, C) probability
tensor never round-trips to HBM, which is the point: the XLA fallback
materializes at least one HBM-sized intermediate between the softmax and the
depthwise smoothing convs, so the kernel is HBM-bandwidth-optimal (one read
of the scoremaps, one 2-float write per map).

Layout: maps are processed as (T*C, H, W) with W on lanes (padded to 128 by
Mosaic) and H on sublanes. A whole Reaching-scale map (94x104 f32 = 39 KiB)
fits VMEM trivially; the smoothing is unrolled shifted adds over a
zero-padded VMEM scratch — a few static slices instead of a depthwise conv,
which TPUs execute on the VPU far better than a feature_group_count conv.

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


_MAPS_PER_PROGRAM = 8  # sublane quantum for the (maps, 2) output block


def _kernel(x_ref, mu_ref, pad_ref, *, gamma: float, kernel: tuple[float, ...],
            h: int, w: int):
    """One program = _MAPS_PER_PROGRAM (frame, joint) maps, shape (8, H, W)."""
    radius = (len(kernel) - 1) // 2
    n = _MAPS_PER_PROGRAM

    x = x_ref[:].astype(jnp.float32) * gamma              # (8, H, W)
    m = jnp.max(x, axis=(1, 2), keepdims=True)
    e = jnp.exp(x - m)
    p = e / jnp.sum(e, axis=(1, 2), keepdims=True)

    if radius > 0:
        # rows: zero-padded shifted adds along H (sublanes)
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[:, radius:radius + h, :w] = p
        acc = jnp.zeros((n, h, w), jnp.float32)
        for d, kv in enumerate(kernel):
            acc = acc + kv * pad_ref[:, d:d + h, :w]
        # cols: same along W (lanes)
        pad_ref[:] = jnp.zeros_like(pad_ref)
        pad_ref[:, :h, radius:radius + w] = acc
        acc = jnp.zeros((n, h, w), jnp.float32)
        for d, kv in enumerate(kernel):
            acc = acc + kv * pad_ref[:, :h, d:d + w]
        p = acc / jnp.sum(acc, axis=(1, 2), keepdims=True)

    # tpu.iota only produces integers (cast after); keep every intermediate
    # >= 2-D — 1-D vector layouts crash Mosaic
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 1).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, h, w), 2).astype(jnp.float32)
    mu_r = jnp.sum(p * rows, axis=2).sum(axis=1, keepdims=True)   # (8, 1)
    mu_c = jnp.sum(p * cols, axis=2).sum(axis=1, keepdims=True)   # (8, 1)
    mu_ref[:] = jnp.concatenate([mu_r, mu_c], axis=1)             # (8, 2)


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
    # contiguous per program. Pad the map count to the per-program quantum.
    n = _MAPS_PER_PROGRAM
    maps = jnp.transpose(scoremaps, (0, 3, 1, 2)).reshape(t * c, h, w)
    n_pad = (-(t * c)) % n
    if n_pad:
        maps = jnp.concatenate(
            [maps, jnp.zeros((n_pad, h, w), maps.dtype)], axis=0)

    mu_flat = pl.pallas_call(
        functools.partial(_kernel, gamma=float(gamma), kernel=kernel,
                          h=h, w=w),
        grid=((t * c + n_pad) // n,),
        in_specs=[pl.BlockSpec((n, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, 2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t * c + n_pad, 2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n, h + 2 * radius, w + 2 * radius),
                                   jnp.float32)],
        interpret=interpret,
    )(maps)
    return mu_flat[:t * c].reshape(t, c, 2)


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
