"""Device-mesh and sharding utilities.

The reference's parallelism is MPI rank-splitting + Allreduce
(SURVEY.md §2.4; CASCI_EVCont.py:270-319, MD_utils.py:95-123). The
TPU-native mapping (single-controller JAX over an ICI mesh):

  * axis "data": geometry batches (PES scans, trajectory re-prediction,
    MD ensembles) — the data-parallel analog.
  * axis "pair": the training-pair axis of the compressed t-RDM store —
    the tensor-parallel analog. The (Npair, Norb^2(Norb^2+1)/2) two-body
    store is the big tensor (Zundel: 84 training states -> 3570 pairs x
    307k packed orbital entries ~ 4.4 GB f32); sharding it over "pair"
    scales the store with the mesh while XLA turns the per-pair
    contractions into local einsums + a small all-gather of the
    (Ntrn, Ntrn) subspace matrices over ICI.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, data_axis=1):
    """Create a ("data", "pair") mesh. data_axis devices on the batch axis,
    the rest on the t-RDM pair axis."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devs)} visible ({devs[0].platform}). For a virtual "
                "mesh, start the process with XLA_FLAGS="
                f"--xla_force_host_platform_device_count={n_devices} and "
                "set jax.config.update('jax_platforms', 'cpu') after "
                "importing jax (see tests/conftest.py)."
            )
        devs = devs[:n_devices]
    n = len(devs)
    assert n % data_axis == 0, (n, data_axis)
    arr = np.array(devs).reshape(data_axis, n // data_axis)
    return Mesh(arr, ("data", "pair"))


def pair_sharding(mesh):
    """Sharding for pair-major t-RDM arrays: shard axis 0 over "pair"."""
    return NamedSharding(mesh, P("pair"))


def batch_sharding(mesh):
    """Sharding for geometry batches: shard axis 0 over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_trdm_store(mesh, overlap, one_rdm_pair, two_rdm_pair):
    """Place the compressed t-RDM store on the mesh: pair axis sharded,
    overlap replicated."""
    return (
        jax.device_put(overlap, replicated(mesh)),
        jax.device_put(one_rdm_pair, pair_sharding(mesh)),
        jax.device_put(two_rdm_pair, pair_sharding(mesh)),
    )
