"""Two-process jax.distributed smoke: DCN-tier mesh + all-reduce parity.

SURVEY §2d's cross-host row. Spawns 2 fresh Python processes on localhost,
each with 4 virtual CPU devices; they join one jax.distributed runtime,
build a global 8-device mesh through the same parallel/mesh.py path the
single-host code uses, assemble a process-local batch into a global array
(parallel/distributed.py::global_batch), and run a jitted sharded
reduction. Process 0 checks the result against the plain numpy value the
single-process computation would produce.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1]); port = sys.argv[2]

from deepgraphpose_tpu.parallel import distributed
from deepgraphpose_tpu.parallel.mesh import make_mesh, DATA_AXIS

distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())      # 2 hosts x 4
assert len(jax.local_devices()) == 4, len(jax.local_devices())

mesh = make_mesh()          # spans both processes
assert mesh.devices.size == 8

# every process holds its own half of the global batch
full = np.arange(16 * 3, dtype=np.float32).reshape(16, 3) + 1.0
sl = distributed.local_slice(16)
gbatch = distributed.global_batch(mesh, {"x": full[sl]})

@jax.jit
def reduce_fn(b):
    return jax.numpy.sum(b["x"] * 2.0), jax.numpy.sum(b["x"], axis=0)

total, per_col = reduce_fn(gbatch)
# fully-replicated outputs are fetchable on every process
total = float(total); per_col = np.asarray(per_col)

expect_total = float((full * 2.0).sum())
expect_col = full.sum(axis=0)
assert abs(total - expect_total) < 1e-4, (total, expect_total)
np.testing.assert_allclose(per_col, expect_col, rtol=1e-6)

# replication helper: same params on all hosts -> same jitted result
params = {"w": np.full((3,), float(3.5), np.float32)}
params_d = distributed.replicate_from_host0(mesh, params)
y = float(jax.jit(lambda p, b: jax.numpy.vdot(b["x"].sum(0), p["w"]))(
    params_d, gbatch))
assert abs(y - float(expect_col @ np.full((3,), 3.5))) < 1e-3, y
print(f"RANK{rank} OK total={total}")
"""


TRAIN_WORKER = r"""
import os, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

rank = int(sys.argv[1]); port = sys.argv[2]

from deepgraphpose_tpu.parallel import distributed
from deepgraphpose_tpu.parallel.mesh import make_mesh

distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=rank)
mesh = make_mesh()
assert mesh.devices.size == 8

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
from dp_step_case import build_case, G

model, variables, lp, tx, opt_state, pool, rows, batch, keys = build_case()

from deepgraphpose_tpu.parallel.train_dp import make_dp_pooled_dgp_train_step

step = make_dp_pooled_dgp_train_step(model, lp, tx, mesh, None,
                                     bn_train=True)
sl = distributed.local_slice(G)
with mesh:
    v = distributed.replicate_from_host0(mesh, jax.device_get(variables))
    o = distributed.replicate_from_host0(mesh, jax.device_get(opt_state))
    pool_r = distributed.replicate_from_host0(mesh, pool)
    rows_g = distributed.global_batch(mesh, rows[sl])
    batch_g = distributed.global_batch(mesh, {k: x[sl]
                                              for k, x in batch.items()})
    keys_g = distributed.global_batch(mesh, keys[sl])
    v2, o2, out = step(v, o, pool_r, rows_g, batch_g, keys_g)
loss = float(out["total_loss"])
fp = float(sum(np.abs(np.asarray(x)).sum()
               for x in jax.tree_util.tree_leaves(v2["params"])))
print(f"RANK{rank} TRAIN OK loss={loss:.8f} fp={fp:.6f}")
"""

DP_STEP_CASE = r"""
# Shared single-source case for the multi-host DP train-step smoke: both
# worker processes AND the in-test single-process reference build byte-
# identical inputs from this module.
import numpy as np
import jax

from deepgraphpose_tpu.core.config import PoseConfig
from deepgraphpose_tpu.models.pose_model import init_model
from deepgraphpose_tpu.ops.dgp_objective import DGPLossParams
from deepgraphpose_tpu.train.steps import make_optimizer

G, T, NJ = 8, 3, 3


def build_case():
    cfg = PoseConfig(num_joints=NJ, net_type="mobilenet_v2_0.35",
                     pos_dist_thresh=9)
    model, variables = init_model(cfg, jax.random.PRNGKey(0), (32, 32))
    lp = DGPLossParams(
        nj=NJ, stride=8.0, gamma=1.0, gauss_len=1.0, lengthscale=1.0,
        pos_dist_thresh=9, locref_stdev=7.2801, locref_loss_weight=0.05,
        locref_huber_loss=True, wn_visible=5.0, wn_hidden=3.0, wt=0.0,
        wt_max=0.0, gm2=0, gm3=0, n_visible_frames_total=8.0,
        n_hidden_frames_total=16.0, S0=np.array([[1.0, -1.0, 0.0]]),
        ws=np.array([2.0], np.float32), ws_max=np.array([60.0], np.float32))
    tx = make_optimizer(0.005, clip_norm=10.0)
    opt_state = tx.init(variables["params"])
    rng = np.random.default_rng(7)
    pool = rng.integers(0, 255, (10, 32, 32, 3), dtype=np.uint8)
    rows = rng.integers(0, 10, (G, T)).astype(np.int32)
    vis = np.zeros((G, T * NJ), np.float32)
    vis[:, :NJ] = 1.0
    batch = dict(
        targets=rng.uniform(0, 3, (G, T, NJ, 2)).astype(np.float32),
        visible_mask=vis, hidden_mask=1.0 - vis,
        frame_mask=np.ones((G, T), np.float32),
        wt_batch=np.zeros((G, T - 1), np.float32),
        pair_mask=np.ones((G, T - 1), np.float32),
        flow=np.zeros((G, T - 1, 32, 32), np.float32))
    keys = np.asarray(jax.random.split(jax.random.PRNGKey(5), G))
    return model, variables, lp, tx, opt_state, pool, rows, batch, keys
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_mesh_and_allreduce(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = str(REPO)
    # silence the persistent-cache cross-process race warnings
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [subprocess.Popen([sys.executable, str(script), str(rank),
                               str(port)],
                              env=env, cwd=str(REPO), text=True,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for rank in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{rank} failed:\n{out[-3000:]}"
        assert f"RANK{rank} OK" in out, out[-2000:]


def test_two_process_dgp_train_step_parity(tmp_path):
    """One make_dp_pooled_dgp_train_step across 2 processes x 4 virtual
    devices via global_batch, checked against the same step run
    single-process on this test's own 8-device mesh (VERDICT r2 #9)."""
    import re

    import jax

    from deepgraphpose_tpu.parallel.mesh import (make_mesh, replicate,
                                                 shard_leading_axis)
    from deepgraphpose_tpu.parallel.train_dp import \
        make_dp_pooled_dgp_train_step

    # single-process reference on the in-process 8-device mesh
    sys.path.insert(0, str(tmp_path))
    (tmp_path / "dp_step_case.py").write_text(DP_STEP_CASE)
    import dp_step_case as case

    (model, variables, lp, tx, opt_state, pool, rows, batch,
     keys) = case.build_case()
    mesh = make_mesh(case.G)  # reference mesh need not match the 2x4 one
    step = make_dp_pooled_dgp_train_step(model, lp, tx, mesh, None,
                                         bn_train=True)
    with mesh:
        v2, _, out = step(
            replicate(jax.device_get(variables), mesh),
            replicate(jax.device_get(opt_state), mesh),
            replicate(pool, mesh), shard_leading_axis(rows, mesh),
            shard_leading_axis(batch, mesh),
            shard_leading_axis(keys, mesh))
    ref_loss = float(out["total_loss"])
    ref_fp = float(sum(np.abs(np.asarray(x)).sum()
                       for x in jax.tree_util.tree_leaves(v2["params"])))

    port = _free_port()
    script = tmp_path / "train_worker.py"
    script.write_text(TRAIN_WORKER)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = f"{REPO}{os.pathsep}{tmp_path}"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)

    procs = [subprocess.Popen([sys.executable, str(script), str(rank),
                               str(port)],
                              env=env, cwd=str(tmp_path), text=True,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for rank in range(2)]
    outs = []
    try:
        for p in procs:
            stdout, _ = p.communicate(timeout=420)
            outs.append(stdout)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    vals = []
    for rank, (p, stdout) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank{rank} failed:\n{stdout[-3000:]}"
        m = re.search(rf"RANK{rank} TRAIN OK loss=([\d.e+-]+) "
                      rf"fp=([\d.e+-]+)", stdout)
        assert m, stdout[-2000:]
        vals.append((float(m.group(1)), float(m.group(2))))
    # both processes agree exactly (replicated result), and the 2-process
    # run reproduces the single-process step
    assert vals[0] == vals[1]
    assert vals[0][0] == pytest.approx(ref_loss, rel=1e-5)
    assert vals[0][1] == pytest.approx(ref_fp, rel=1e-5)
