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
