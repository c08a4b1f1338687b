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


def pad_pair_axis(arr, n_shards):
    """Zero-pad a pair-major array's leading axis to a multiple of the
    pair-shard count. Production pair counts are rarely divisible by the
    mesh (Zundel-84: 3570 = 2*3*5*7*17 pairs — indivisible by 4 or 8);
    padding with zero rows is exact for every contraction in the pipeline
    (assembly sums over pairs; continuation._unpack_pairs scatter-adds the
    zero tail into a discarded scratch slot)."""
    npair = arr.shape[0]
    pad = (-npair) % n_shards
    if pad == 0:
        return arr
    if isinstance(arr, np.ndarray):
        return np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)])
    import jax.numpy as jnp
    return jnp.concatenate(
        [arr, jnp.zeros((pad,) + arr.shape[1:], dtype=arr.dtype)])


def shard_trdm_store(mesh, overlap, one_rdm_pair, two_rdm_pair):
    """Place the compressed t-RDM store on the mesh: pair axis sharded
    (zero-padded to the mesh's pair-shard count when uneven), overlap
    replicated. Callers must treat the returned pair arrays as possibly
    padded — every consumer in continuation.py already does (it takes
    ntrain from the overlap, never from the pair-axis length)."""
    n_pair = mesh.shape["pair"]
    return (
        jax.device_put(overlap, replicated(mesh)),
        jax.device_put(pad_pair_axis(one_rdm_pair, n_pair),
                       pair_sharding(mesh)),
        jax.device_put(pad_pair_axis(two_rdm_pair, n_pair),
                       pair_sharding(mesh)),
    )


def assert_pair_sharded(arr, mesh):
    """Fail loudly if a pair-major store array is NOT actually sharded over
    the mesh's pair axis — GSPMD silently replicating a multi-GB store
    per device is the failure mode this guards (each replica costs the
    full store in HBM).

    Checks, per device: exactly one addressable shard whose pair-axis
    extent (and byte size) is the per-shard fraction."""
    n_pair = mesh.shape["pair"]
    n_dev = mesh.devices.size
    shards = arr.addressable_shards
    if len(shards) != n_dev:
        raise AssertionError(
            f"expected {n_dev} addressable shards, got {len(shards)}")
    if arr.shape[0] % n_pair != 0:
        raise AssertionError(
            f"pair axis {arr.shape[0]} not divisible by {n_pair} shards — "
            "pass the store through shard_trdm_store (pads the axis)")
    want_rows = arr.shape[0] // n_pair
    want_bytes = want_rows * int(np.prod(arr.shape[1:])) * arr.dtype.itemsize
    for sh in shards:
        got = sh.data.shape[0]
        if got != want_rows:
            raise AssertionError(
                f"shard on {sh.device} holds {got} pair rows, expected "
                f"{want_rows} — store is replicated or mis-sharded")
        if sh.data.nbytes != want_bytes:
            raise AssertionError(
                f"shard on {sh.device} holds {sh.data.nbytes} bytes, "
                f"expected {want_bytes}")
