"""Device-side FCI sigma tests (exact on CPU x64; TPU runs f32)."""

import numpy as np

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.oao import loewdin_trafo, transform_integrals
from evcont_tpu.solvers.fci import FCISolver
from evcont_tpu.solvers.fci_jax import make_sigma_jax, fci_davidson_jax


def _ints():
    mol = Molecule.build([("H", (0, 0, 1.7 * i)) for i in range(6)],
                         basis="sto-3g")
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = [np.array(x) for x in transform_integrals(
        np.array(b.hcore), np.array(b.eri), trafo)]
    return h1, h2


def test_jax_sigma_matches_host():
    h1, h2 = _ints()
    host = FCISolver(6, 6)
    sigma, (Na, Nb) = make_sigma_jax(6, 6)
    rng = np.random.default_rng(0)
    C = rng.standard_normal((Na, Nb))
    np.testing.assert_allclose(np.array(sigma(C, h1, h2)),
                               host.sigma(C, h1, h2), atol=1e-11)


def test_jax_davidson_ground_state():
    h1, h2 = _ints()
    e_host, v_host = FCISolver(6, 6).kernel(h1, h2)
    e_jax, v_jax = fci_davidson_jax(h1, h2, 6, 6)
    assert abs(e_jax - e_host) < 1e-7
    assert abs(np.vdot(v_jax, v_host)) > 1 - 1e-7
