"""Multi-host plumbing (parallel/distributed.py): a REAL 2-process run on
the CPU backend with gloo collectives — the same jax.distributed code path
as a multi-host TPU pod minus the DCN transport (SURVEY §2.4 / §5: the
reference fans out over MPI ranks, MD_utils.py:95-123).

The worker subprocesses each expose 2 virtual CPU devices, join one
4-device runtime, pjit a pair-sharded store contraction over the global
mesh, and fan an ensemble out round-robin; process 0 writes the results
the test asserts against single-process ground truth.
"""

import json
import os
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'

_WORKER = r"""
import json, os, sys
import numpy as np

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from evcont_tpu.parallel.distributed import (
    initialize, global_mesh, shard_trdm_store_global, ensemble_split,
    allgather_members)

pid = int(sys.argv[1])
coord = sys.argv[2]
out = sys.argv[3]

pi, pc = initialize(coordinator=coord, num_processes=2, process_id=pid)
assert (pi, pc) == (pid, 2), (pi, pc)
assert len(jax.devices()) == 4, jax.devices()

mesh = global_mesh(data_axis=1)          # ("data", "pair") = (1, 4)

# pair-sharded store contraction spanning both processes: Npair=6 pads
# to 8 rows over the 4-way pair axis (the uneven production shape)
rng = np.random.default_rng(0)
npair, nfeat = 6, 5
r1 = rng.standard_normal((npair, 3, 3))
r2 = rng.standard_normal((npair, nfeat))
ov = np.eye(2)
ov_d, r1_d, r2_d = shard_trdm_store_global(mesh, ov, r1, r2)
assert r2_d.shape == (8, nfeat)
# each process addresses 2 of the 4 shards, 2 rows each
assert len(r2_d.addressable_shards) == 2
assert all(s.data.shape[0] == 2 for s in r2_d.addressable_shards)

h1 = rng.standard_normal((3, 3))
h2 = rng.standard_normal(nfeat)

@jax.jit
def contract(r1_s, r2_s):
    per_pair = jax.numpy.einsum("pij,ij->p", r1_s, h1) + r2_s @ h2
    return per_pair.sum()     # zero-padded tail contributes exactly 0

val = float(np.asarray(jax.device_get(contract(r1_d, r2_d))))
want = float(np.einsum("pij,ij->", r1, h1) + (r2 @ h2).sum())

# DCN ensemble fan-out: 5 members round-robin over 2 processes
members = ensemble_split(5)
local = np.asarray([[float(m), float(m) ** 2] for m in members])
gathered = allgather_members(local, 5)

if pid == 0:
    with open(out, "w") as fh:
        json.dump({"val": val, "want": want,
                   "members": members,
                   "gathered": gathered.tolist()}, fh)
print("worker", pid, "done", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_cpu_distributed(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(_WORKER)
    out = tmp_path / "result.json"
    coord = f"localhost:{_free_port()}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)      # workers set their own device count
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(pid), coord, str(out)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=repo_root)
        for pid in (0, 1)
    ]
    deadline = time.time() + 300
    logs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=max(5.0, deadline - time.time()))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        logs.append(o)
    for p, o in zip(procs, logs):
        assert p.returncode == 0, o[-3000:]
    res = json.loads(out.read_text())
    assert abs(res["val"] - res["want"]) < 1e-9, res
    assert res["members"] == [0, 2, 4]
    g = np.asarray(res["gathered"])
    assert g.shape == (5, 2)
    assert np.allclose(g[:, 0], np.arange(5))
    assert np.allclose(g[:, 1], np.arange(5) ** 2)
