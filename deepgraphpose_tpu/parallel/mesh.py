"""Device mesh + sharding helpers.

The reference is single-process single-device; its only parallel artifact is
an unused TF tower helper (ref: helpers/utils_tf.py:4-209, never imported).
The TPU-native equivalents here follow SURVEY §2d:

* data parallelism: batch of DGP *windows* sharded over the ``data`` mesh
  axis; gradients all-reduce over ICI automatically via jit + NamedSharding.
* streaming inference: the frame axis sharded over ``data``.

All sharding is expressed with `jax.sharding.Mesh` + `NamedSharding`; XLA
inserts the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, mesh: Mesh):
    """device_put a pytree with its leading axis sharded over ``data``."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0):
    """Pad ``arr`` along ``axis`` to a multiple; returns (padded, n_valid)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad_widths = [(0, 0)] * arr.ndim
    pad_widths[axis] = (0, rem)
    idx = [slice(None)] * arr.ndim
    idx[axis] = slice(n - 1, n)
    pad_block = np.repeat(arr[tuple(idx)], rem, axis=axis)
    return np.concatenate([arr, pad_block], axis=axis), n
