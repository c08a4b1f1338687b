"""CCSD(+T) tests: exactness for 2 electrons, near-FCI for H4."""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.solvers.scf import rhf_from_engine
from evcont_tpu.solvers.ccsd import ccsd
from evcont_tpu.oao import transform_integrals
from evcont_tpu.workloads.common import exact_fci_energy

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def _mo_ints(mol):
    eng = IntegralEngine(mol)
    res = rhf_from_engine(eng)
    b = eng.compute_jit(np.asarray(mol.coords))
    h1m, erim = [np.array(x) for x in transform_integrals(
        np.array(b.hcore), np.array(b.eri), res.mo_coeff)]
    return res, h1m, erim


def test_ccsd_exact_for_two_electrons():
    mol = Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                         basis="6-31g")
    res, h1m, erim = _mo_ints(mol)
    ec, et, _ = ccsd(h1m, erim, 2, with_triples=True)
    e_fci, _ = exact_fci_energy(mol)
    assert abs(res.e_tot + ec - e_fci) < 1e-10
    assert abs(et) < 1e-12      # no triples exist for 2 electrons


def test_ccsd_near_fci_h4():
    mol = Molecule.build([("H", (0, 0, 1.7 * i)) for i in range(4)],
                         basis="sto-3g")
    res, h1m, erim = _mo_ints(mol)
    ec, et, _ = ccsd(h1m, erim, 4, with_triples=True)
    e_fci, _ = exact_fci_energy(mol)
    assert res.e_tot + ec < res.e_tot          # captures correlation
    assert abs(res.e_tot + ec - e_fci) < 1e-4  # close to exact
    assert abs(res.e_tot + ec + et - e_fci) < 1e-4


def test_ccsd_rdm1_matches_fci_for_two_electrons():
    """For 2 electrons CCSD is exact, so the adjoint-VJP (Lambda)
    response density must equal the FCI density to machine precision."""
    from evcont_tpu.solvers.ccsd import ccsd_rdm1
    from evcont_tpu.solvers.fci import FCISolver

    mol = Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                         basis="6-31g")
    _, h1m, erim = _mo_ints(mol)
    D, e_tot = ccsd_rdm1(h1m, erim, 2)
    assert abs(np.trace(D) - 2.0) < 1e-12
    s = FCISolver(h1m.shape[0], (1, 1), spin=None)
    e_fci, ci = s.kernel(h1m, erim)
    r1, _ = s.trans_rdm12(ci, ci)
    assert abs(e_tot - e_fci) < 1e-9
    assert np.abs(D - r1).max() < 1e-9


def test_ccsd_rdm1_is_response_density_h4():
    """trace(D V) must equal the derivative of the (fixed-orbital) total
    CC energy under h1 -> h1 + eps*V — the defining property of the
    Lambda-equation density."""
    from evcont_tpu.solvers.ccsd import (ccsd_rdm1, spin_orbital_integrals,
                                         _e_total_so)

    mol = Molecule.build([("H", (0, 0, 1.8 * i)) for i in range(4)],
                         basis="sto-3g")
    _, h1m, erim = _mo_ints(mol)
    D, _ = ccsd_rdm1(h1m, erim, 4)
    assert abs(np.trace(D) - 4.0) < 1e-10

    rng = np.random.default_rng(0)
    V = rng.normal(size=h1m.shape)
    V = 0.5 * (V + V.T)
    eps = 1e-5

    def etot(hh):
        _, amps = ccsd(hh, erim, 4, conv_tol=1e-12)
        h_so, v_so, _ = spin_orbital_integrals(hh, erim, 4)
        return float(_e_total_so(amps[0], amps[1], h_so, v_so))

    fd = (etot(h1m + eps * V) - etot(h1m - eps * V)) / (2 * eps)
    assert abs(fd - np.sum(D * V)) < 1e-7
