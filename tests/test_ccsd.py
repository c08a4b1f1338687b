"""CCSD(+T) tests: exactness for 2 electrons, near-FCI for H4."""

import numpy as np

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.solvers.scf import rhf_from_engine
from evcont_tpu.solvers.ccsd import ccsd
from evcont_tpu.oao import transform_integrals
from evcont_tpu.workloads.common import exact_fci_energy


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
