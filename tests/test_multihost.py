"""True multi-process execution: 2 JAX processes (gloo CPU collectives),
a (2, 1) mesh with one device per process, cooperative per-shard Zarr
writes — the initialize_mpi/distribute_mpi + collective-PnetCDF analogue
(parallel_mpi.f:6-122, io_pnetcdf.F:272-275).

The parent runs the same seamount configuration single-process and
compares against the fields the 2-process run wrote to disk.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
sys.path.insert(0, os.getcwd())   # repo root (set as cwd by the parent)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid, port, out = int(sys.argv[1]), sys.argv[2], sys.argv[3]
from extpom_tpu.mesh.distributed import init_distributed, process_barrier
init_distributed(f"127.0.0.1:{port}", 2, pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 2

from extpom_tpu.cases.seamount import seamount_model
from extpom_tpu.mesh.sharding import make_mesh
from extpom_tpu.io import zarrstore as zio

mode = sys.argv[4]
m = seamount_model(im=32, jm=16, kb=7, dtype="float64", donate=False)
m.shard(make_mesh(2, 1), mode=mode)
if mode == "shardmap":
    # whole segment under one shard_map-wrapped lax.scan dispatch (the
    # host-round-trip-free pom.f:16-22 loop; mesh.shardmap.make_shardmap_run)
    m.run_segment(3)
else:
    for _ in range(3):
        m.step_once()

# cooperative per-shard writes (every process participates)
zio.write_restart(out, m.state, m.iint)
process_barrier("done")
if jax.process_index() == 0:
    print("MULTIHOST_OK", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("mode", ["gspmd", "shardmap"])
def test_two_process_run_and_cooperative_io(tmp_path, mode):
    port = _free_port()
    out = str(tmp_path / f"rst_{mode}")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
        f.write(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)     # 1 CPU device per process
    procs = [subprocess.Popen(
        [sys.executable, script, str(pid), str(port), out, mode],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        for pid in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-3000:]}"
    assert "MULTIHOST_OK" in outs[0] + outs[1]

    # single-process reference in THIS process (8 virtual devices, but we
    # run it unsharded)
    from extpom_tpu.cases.seamount import seamount_model
    from extpom_tpu.io import zarrstore as zio
    ref = seamount_model(im=32, jm=16, kb=7, dtype="float64", donate=False)
    for _ in range(3):
        ref.step_once()

    st, iint, _ = zio.read_restart(out, ref.cfg)
    assert iint == 3
    for name in ("el", "ua", "u", "t", "s", "q2"):
        a = np.asarray(getattr(ref.state, name))
        b = np.asarray(getattr(st, name))
        tol = 1e-9 * max(1.0, float(np.abs(a).max()))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=name)
