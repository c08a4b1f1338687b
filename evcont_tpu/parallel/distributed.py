"""Multi-host (multi-process) plumbing: jax.distributed + DCN fan-out.

The reference scales across nodes with mpi4py rank-splitting + Allreduce
(SURVEY.md §2.4: evcont/MD_utils.py:95-123 splits trajectory re-prediction
over ranks; CASCI_EVCont.py:314-319 Allreduces t-RDM contributions). The
TPU-native mapping is JAX's multi-controller runtime:

  * Within a slice, parallelism stays the single-controller mesh of
    mesh.py (ICI collectives inserted by GSPMD — nothing here changes).
  * Across hosts/slices, `initialize()` wires the processes into one
    JAX runtime (jax.distributed); `global_mesh()` then spans ALL
    devices so the pair-sharded store and pjit-ted pipeline stretch
    across hosts exactly as they do within one.
  * For the reference's embarrassingly-parallel fan-outs (MD ensembles
    over seeds, per-rank trajectory re-prediction), `ensemble_split()`
    gives each process its member subset and `allgather_members()`
    reassembles results over DCN — the Allgatherv analog, but through
    jax.experimental.multihost_utils instead of MPI.

Hardware note: this environment exposes one TPU chip and no second host,
so the multi-process path is exercised by a 2-process CPU-backend test
(tests/test_distributed.py) using gloo collectives — the same code path
jax.distributed uses across real hosts, minus the DCN transport.
"""

import os

import numpy as np

import jax


def initialize(coordinator=None, num_processes=None, process_id=None,
               local_device_ids=None):
    """Wire this process into a multi-controller JAX runtime.

    A no-op when the configuration (args or the standard JAX env vars /
    cluster autodetection) describes a single process, so workloads can
    call it unconditionally. Returns (process_index, process_count).

    Env fallbacks (the standard jax.distributed names): COORDINATOR_ADDRESS,
    NUM_PROCESSES / JAX_NUM_PROCESSES, PROCESS_ID / JAX_PROCESS_ID.
    """
    coordinator = coordinator or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = os.environ.get(
            "NUM_PROCESSES", os.environ.get("JAX_NUM_PROCESSES"))
    if process_id is None:
        process_id = os.environ.get(
            "PROCESS_ID", os.environ.get("JAX_PROCESS_ID"))
    if coordinator is None or num_processes is None:
        return jax.process_index(), jax.process_count()
    num_processes = int(num_processes)
    if num_processes <= 1:
        return jax.process_index(), jax.process_count()
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=int(process_id) if process_id is not None else None,
        local_device_ids=local_device_ids)
    return jax.process_index(), jax.process_count()


def global_mesh(data_axis=1):
    """("data", "pair") mesh over ALL devices of ALL processes. Shape
    contract matches mesh.make_mesh; devices are ordered process-major so
    the "pair" axis is contiguous within a host where possible (store
    shards stay host-local; the small subspace all-gathers ride DCN)."""
    from jax.sharding import Mesh

    devs = jax.devices()          # global, process-major
    n = len(devs)
    assert n % data_axis == 0, (n, data_axis)
    arr = np.array(devs).reshape(data_axis, n // data_axis)
    return Mesh(arr, ("data", "pair"))


def shard_trdm_store_global(mesh, overlap, one_rdm_pair, two_rdm_pair):
    """Multi-host version of mesh.shard_trdm_store: every process passes
    the FULL host copy of the (already pair-compressed) store; each
    builds only its addressable shards. Zero-pads the pair axis like the
    single-host path (mesh.pad_pair_axis) so uneven production pair
    counts (Zundel-84: 3570 pairs) shard over any mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from .mesh import pad_pair_axis

    n_pair = mesh.shape["pair"]

    def _put(x, spec):
        sh = NamedSharding(mesh, spec)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx])

    return (
        _put(np.asarray(overlap), P()),
        _put(pad_pair_axis(np.asarray(one_rdm_pair), n_pair), P("pair")),
        _put(pad_pair_axis(np.asarray(two_rdm_pair), n_pair), P("pair")),
    )


def ensemble_split(n_members, process_index=None, process_count=None):
    """The member indices this process owns, round-robin — the analog of
    the reference's `rank::n_ranks` trajectory split (MD_utils.py:95-123)
    for seed ensembles / re-prediction shards fanned out over DCN."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return list(range(pi, n_members, pc))


def allgather_members(local_stack, n_members):
    """Gather per-process member results to every process and return them
    in member-indexed order (the Allgatherv analog for a round-robin
    ensemble_split). local_stack: (n_local, ...) array of this process's
    results, ordered as ensemble_split returned them. Processes with
    fewer members pad to the max local count internally
    (process_allgather requires equal shapes)."""
    from jax.experimental import multihost_utils

    local = np.asarray(local_stack)
    pcount = jax.process_count()
    if pcount == 1:
        return local[:n_members]
    n_local_max = -(-n_members // pcount)
    if local.shape[0] < n_local_max:
        pad = np.zeros((n_local_max - local.shape[0],) + local.shape[1:],
                       dtype=local.dtype)
        local = np.concatenate([local, pad])
    gathered = np.asarray(multihost_utils.process_allgather(local))
    out = [None] * n_members
    for p in range(pcount):
        for j, m in enumerate(range(p, n_members, pcount)):
            out[m] = gathered[p, j]
    return np.stack(out)
