"""Multi-host (multi-process) initialization and global-array helpers.

SURVEY §2d names two interconnect tiers: ICI within a pod slice and DCN
across hosts. Single-host meshes (parallel/mesh.py) cover ICI; this module
wires the cross-host tier: each process owns its local TPU chips, and a
coordinator-backed ``jax.distributed`` runtime stitches them into one
global device list so the same ``Mesh`` + ``NamedSharding`` code runs
unchanged — XLA then routes collectives over ICI within a host and DCN
across hosts. (The reference's only counterpart is the unused TF tower
helper, ref: src/deepgraphpose/helpers/utils_tf.py:4-209.)

Usage, one call per process before any other jax work:

    from deepgraphpose_tpu.parallel import distributed
    distributed.initialize(coordinator_address="10.0.0.1:8476",
                           num_processes=4, process_id=rank)
    mesh = make_mesh()                       # now spans all hosts
    batch = distributed.global_batch(mesh, local_batch)   # local -> global

Verified by a 2-process CPU smoke test (tests/test_multihost.py): the mesh
builds across processes and a jitted all-reduce matches the single-process
result.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepgraphpose_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Join the multi-process runtime (idempotent per process).

    Thin, import-light wrapper over ``jax.distributed.initialize`` so
    callers never import jax before the platform env vars are set. On TPU
    pods the three arguments are auto-detected from the environment and may
    all be None; on CPU/GPU clusters pass them explicitly.
    """
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_batch(mesh: Mesh, local_tree, axis_name: str = DATA_AXIS):
    """Assemble per-process host-local arrays into one global sharded tree.

    Each process passes its own shard (leading axis = its slice of the
    global batch); the result is a jax.Array whose leading axis is the
    concatenation over processes, sharded over ``axis_name``. This is the
    multi-host replacement for ``shard_leading_axis``.
    """
    sharding = NamedSharding(mesh, P(axis_name))

    def one(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(sharding, x)

    return jax.tree_util.tree_map(one, local_tree)


def replicate_from_host0(mesh: Mesh, tree):
    """Replicate host-0's values onto every device of a multi-host mesh.

    ``jax.device_put(x, replicated)`` is only valid when every process
    passes the same value; parameters loaded from a checkpoint satisfy
    this (all hosts read the same file), so plain replication is used and
    a cheap all-reduce equality check is the caller's option.
    """
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree)


def local_slice(n_global: int) -> slice:
    """This process's contiguous slice of a leading global-batch axis."""
    per = n_global // jax.process_count()
    assert per * jax.process_count() == n_global, (
        f"global batch {n_global} not divisible by "
        f"{jax.process_count()} processes")
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
