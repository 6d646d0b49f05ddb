"""Multi-host (jax.distributed) smoke: 2 CPU processes rendezvous, form the
global ("part",) mesh, and psum disjoint-support per-part deltas across the
process boundary — the DCN analogue of the in-process mesh reassembly tests
(SURVEY §2.3 "DCN across hosts"; reference has no multi-host story)."""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")
from delphy_tpu.parallel.distributed import (initialize_from_env,
                                             global_part_mesh)
assert initialize_from_env(), "distributed init did not trigger"
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P, NamedSharding
from jax import shard_map

assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4
mesh = global_part_mesh()
assert mesh.size == 8

# per-part deltas with disjoint support (each part owns a slice of the
# global vector), reassembled by the sweep's psum collective across DCN
pid = jax.process_index()
N = 16
local = np.zeros((4, 8, N))
for i in range(4):
    part = pid * 4 + i
    local[i, :, part * 2:(part + 1) * 2] = part + 1.0
g = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("part")), local, (8, 8, N))

def body(d):
    return jax.lax.psum(jnp.sum(d, axis=0), "part")

out = shard_map(body, mesh=mesh, in_specs=P("part"), out_specs=P())(g)
# disjoint support: each column slice is owned by exactly one part, so the
# psum reassembles the full vector without double counting
expect = np.zeros((8, N))
for part in range(8):
    expect[:, part * 2:(part + 1) * 2] = part + 1.0
got = np.asarray(jax.device_get(out.addressable_data(0)))
np.testing.assert_allclose(got, expect)
print("DIST_OK", pid, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_mesh_psum():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["DELPHY_TPU_COORDINATOR"] = f"127.0.0.1:{port}"
        env["DELPHY_TPU_NUM_PROCESSES"] = "2"
        env["DELPHY_TPU_PROCESS_ID"] = str(pid)
        env["DELPHY_TPU_FORCE_CPU"] = "1"
        procs.append(subprocess.Popen(
            [sys.executable, "-c", WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for pr in procs:
        try:
            out, err = pr.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((pr.returncode, out, err))
    for pid, (rc, out, err) in enumerate(outs):
        assert rc == 0, f"worker {pid} failed:\n{err[-3000:]}"
        assert f"DIST_OK {pid}" in out
