"""Two-process CPU smoke test of the multi-host tile mesh.

The production claim (parallel/mesh.py): after ``jax.distributed`` init the
tile mesh spans every process's devices and ``tile_map`` shards tiles across
hosts over the same code path as single-host.  This launches two fresh
Python processes (2 virtual CPU devices each -> a 4-device global mesh),
runs the production ``tile_map`` plus a cross-host ``psum``, and checks both
against the local computation.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

_REPO = str(Path(__file__).resolve().parent.parent)

_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["MICROALIGNER_TPU_DIST"] = "1"
os.environ["MICROALIGNER_TPU_DIST_COORD"] = sys.argv[2]
os.environ["MICROALIGNER_TPU_DIST_NPROC"] = "2"
os.environ["MICROALIGNER_TPU_DIST_PID"] = sys.argv[1]
sys.path.insert(0, sys.argv[3])

import jax
jax.config.update("jax_platforms", "cpu")
from microaligner_tpu.parallel.mesh import get_tile_mesh, init_distributed_from_env
assert init_distributed_from_env()

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec as P
from microaligner_tpu.parallel.tile_runner import tile_map

pid = int(sys.argv[1])
mesh = get_tile_mesh()
n_dev = int(np.prod(mesh.devices.shape))
assert n_dev == 4, f"expected 4 global devices, got {n_dev}"

tiles_np = np.arange(8 * 16 * 16, dtype=np.float32).reshape(8, 16, 16)
local = tiles_np[pid * 4 : (pid + 1) * 4]
gtiles = multihost_utils.host_local_array_to_global_array(local, mesh, P("tiles"))

@jax.jit
def run(ts):
    out = tile_map(lambda t: t * 2.0 + 1.0, (ts,), batch=2, mesh=mesh, unbatched=True)
    return out

out = run(gtiles)
got = multihost_utils.global_array_to_host_local_array(out, mesh, P("tiles"))
assert np.allclose(np.asarray(got), local * 2.0 + 1.0), "tile_map mismatch"

# one cross-host collective over the same mesh
@jax.jit
def total(ts):
    f = jax.shard_map(
        lambda x: jax.lax.psum(jnp.sum(x), "tiles"),
        mesh=mesh, in_specs=P("tiles"), out_specs=P(),
    )
    return f(ts)

s = total(gtiles)
s_local = float(jax.device_get(s.addressable_data(0)))
assert abs(s_local - float(tiles_np.sum())) < 1e-3, s_local
print("MULTIHOST_OK", pid, flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_tile_mesh(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coord = f"localhost:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), coord, _REPO],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out
