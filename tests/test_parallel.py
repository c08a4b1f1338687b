"""Multi-device sharding tests on the fake 8-CPU mesh (conftest sets
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
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
def test_uneven_pair_sharding_production_shape():
    """Zundel-84-shaped pair axis (3570 pairs = 2*3*5*7*17 — indivisible by
    a 4-way pair axis) at a scaled-down norb: shard_trdm_store must pad the
    axis, the padded computation must match the unsharded one, and the
    placement assertion must prove the store is sharded, not replicated."""
    from evcont_tpu.parallel.mesh import assert_pair_sharded

    ntrain = 84
    npair = ntrain * (ntrain + 1) // 2          # 3570
    mol = Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                         basis="sto-3g")        # nao = 2
    nao = 2
    npacked = nao * nao * (nao * nao + 1) // 2  # 10
    rng = np.random.default_rng(3)
    ov = np.eye(ntrain) + 0.01 * rng.standard_normal((ntrain, ntrain))
    ov = 0.5 * (ov + ov.T)
    r1 = 0.01 * rng.standard_normal((npair, nao, nao))
    r2 = 0.001 * rng.standard_normal((npair, npacked))
    model = ContinuationModel(mol, ov, r1, r2)

    batch = np.stack([np.asarray(mol.coords) * s for s in (1.0, 1.05)])
    e_ref, g_ref = model.potential_and_forces_batch(batch)

    mesh = make_mesh(8, data_axis=2)            # pair axis = 4; 3570 % 4 = 2
    ov_s, r1_s, r2_s = shard_trdm_store(mesh, model.overlap, model.one_rdm,
                                        model.two_rdm)
    assert r1_s.shape[0] == npair + 2 and r2_s.shape[0] == npair + 2
    assert_pair_sharded(r1_s, mesh)
    assert_pair_sharded(r2_s, mesh)
    # a replicated placement must be rejected
    from evcont_tpu.parallel.mesh import replicated
    r1_rep = jax.device_put(np.asarray(r1_s), replicated(mesh))
    with pytest.raises(AssertionError):
        assert_pair_sharded(r1_rep, mesh)

    batch_s = jax.device_put(batch, NamedSharding(mesh, P("data")))
    with mesh:
        e, g = model._energy_and_grad_batch(batch_s, ov_s, r1_s, r2_s)
    np.testing.assert_allclose(np.array(e), np.array(e_ref), atol=1e-10)
    np.testing.assert_allclose(np.array(g), -np.array(g_ref), atol=1e-9)

    # predicted RDMs against a padded store must match the unpadded path
    from evcont_tpu.continuation import predicted_rdms
    vec = np.zeros(ntrain)
    vec[:3] = [0.9, 0.3, -0.2]
    rdm1_ref, rdm2_ref = predicted_rdms(
        jnp.asarray(vec), model.one_rdm, model.two_rdm, nao,
        packed_layout=model.packed_layout)
    rdm1_s, rdm2_s = predicted_rdms(
        jnp.asarray(vec), r1_s, r2_s, nao,
        packed_layout=model.packed_layout)
    np.testing.assert_allclose(np.array(rdm1_s), np.array(rdm1_ref),
                               atol=1e-12)
    np.testing.assert_allclose(np.array(rdm2_s), np.array(rdm2_ref),
                               atol=1e-12)


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
