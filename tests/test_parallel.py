"""Multi-device sharding tests on the fake 8-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from evcont_tpu.molecule import Molecule
from evcont_tpu.backends.fci_backend import FCIBackend
from evcont_tpu.model import ContinuationModel
from evcont_tpu.continuation import to_pair_layout
from evcont_tpu.parallel.mesh import make_mesh, shard_trdm_store


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_store_matches_replicated():
    """Pair-sharded t-RDM store + data-sharded geometry batch must produce
    the same energies/forces as the single-device computation."""
    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    backend = FCIBackend()
    # ntrain = 7 -> npair = 28, divisible by the 4-device pair axis
    for d in np.linspace(1.3, 2.5, 7):
        backend.append_to_rdms(h4(d))

    one_p, two_p = to_pair_layout(backend.one_rdm, backend.two_rdm)
    model = ContinuationModel(h4(1.8), backend.overlap, one_p, two_p)

    batch = np.stack([np.asarray(h4(d).coords)
                      for d in [1.4, 1.7, 2.0, 2.3]])
    e_ref, g_ref = model.potential_and_forces_batch(batch)
    e_ref, g_ref = np.array(e_ref), np.array(g_ref)

    mesh = make_mesh(8, data_axis=2)
    ov, r1, r2 = shard_trdm_store(mesh, model.overlap, model.one_rdm,
                                  model.two_rdm)
    batch_sharded = jax.device_put(batch, NamedSharding(mesh, P("data")))
    with mesh:
        e, g = model._energy_and_grad_batch(batch_sharded, ov, r1, r2)
    np.testing.assert_allclose(np.array(e), e_ref, atol=1e-10)
    # _energy_and_grad_batch returns gradients; forces are their negative
    np.testing.assert_allclose(-np.array(g), g_ref, atol=1e-9)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_pair_layout_equivalence():
    """Pair-compressed layouts must reproduce the full-layout energies."""
    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    backend = FCIBackend()
    for d in [1.4, 1.9, 2.4]:
        backend.append_to_rdms(h4(d))
    m_full = ContinuationModel.from_backend(h4(1.8), backend)
    one_p, two_p = to_pair_layout(backend.one_rdm, backend.two_rdm)
    m_pair = ContinuationModel(h4(1.8), backend.overlap, one_p, two_p)
    for d in [1.5, 2.2]:
        c = np.asarray(h4(d).coords)
        assert abs(float(m_full.potential(c))
                   - float(m_pair.potential(c))) < 1e-10
