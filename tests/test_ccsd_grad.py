"""Analytic CCSD nuclear gradients (solvers/ccsd_grad.py).

The reference's Zundel CCSD baseline MDs rely on pyscf's analytic
lambda-equation gradients (scripts/MD/H2O-H3O+/md_H2O-H3O+_CCSD.py:60-75);
round 2 fell back to central differences. These tests pin the autodiff
Lagrangian replacement: FD agreement, Lagrangian value consistency, and
translational invariance of the force.
"""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.solvers.ccsd_grad import ccsd_energy_and_gradient

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def _fd_gradient(engine, coords, eps=2e-4, **kw):
    """Central-difference total-energy gradient (the round-2 fallback)."""
    from evcont_tpu.solvers.ccsd import ccsd
    from evcont_tpu.solvers.scf import rhf_from_engine
    from evcont_tpu.oao import transform_integrals

    def etot(c):
        hf = rhf_from_engine(engine, coords=c)
        b = engine.compute_jit(c)
        h1m, erim = [np.array(x) for x in transform_integrals(
            np.array(b.hcore), np.array(b.eri), hf.mo_coeff)]
        nelec = kw.get("nelec")
        ec, _ = ccsd(h1m, erim, nelec, conv_tol=1e-11)
        return hf.e_tot + ec

    g = np.zeros_like(coords)
    for a in range(coords.shape[0]):
        for x in range(3):
            cp, cm = coords.copy(), coords.copy()
            cp[a, x] += eps
            cm[a, x] -= eps
            g[a, x] = (etot(cp) - etot(cm)) / (2 * eps)
    return g


def test_ccsd_grad_matches_fd_h4():
    """Slightly bent/stretched H4 chain (no symmetry) in STO-3G: analytic
    vs central differences to ~1e-7 Ha/Bohr, plus the free Lagrangian
    consistency check L(R0) == E_tot."""
    coords = np.array([[0.0, 0.0, 0.0],
                       [0.1, 0.0, 1.7],
                       [0.0, 0.15, 3.3],
                       [-0.05, 0.0, 5.1]])
    mol = Molecule.build([("H", tuple(c)) for c in coords], basis="sto-3g")
    eng = IntegralEngine(mol)
    e, g, info = ccsd_energy_and_gradient(eng, coords, nelec=4)
    assert info["lagrangian_consistency"] < 1e-8
    g_fd = _fd_gradient(eng, coords, nelec=4)
    assert np.abs(g - g_fd).max() < 1e-6
    # translational invariance: net force must vanish
    assert np.abs(g.sum(axis=0)).max() < 1e-9


def test_ccsd_grad_h2_631g_matches_fci_force():
    """For 2 electrons CCSD is FCI, so the analytic CCSD gradient must
    match the continuation framework's exact-FCI force machinery: compare
    against a tight FD of the FCI total energy."""
    from evcont_tpu.workloads.common import exact_fci_energy

    d = 1.45
    coords = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, d]])
    mol = Molecule.build([("H", tuple(c)) for c in coords], basis="6-31g")
    eng = IntegralEngine(mol)
    e, g, info = ccsd_energy_and_gradient(eng, coords, nelec=2)

    def e_fci(dz):
        m = Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, dz))],
                           basis="6-31g")
        return exact_fci_energy(m)[0]

    assert abs(e - e_fci(d)) < 1e-9
    eps = 2e-4
    fd = (e_fci(d + eps) - e_fci(d - eps)) / (2 * eps)
    assert abs(g[1, 2] - fd) < 1e-7
    assert abs(g[0, 2] + g[1, 2]) < 1e-10
