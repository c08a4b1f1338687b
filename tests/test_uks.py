"""Unrestricted Kohn-Sham tests.

The reference's Zundel CAM-B3LYP reference dynamics run dft.UKS
(scripts/MD/Zundel_thermodynamics/reference_dynamics/Zundel_DFT_CAMB3LYP.py:55,
continuation/05_Zundel_test_potential_energy.py:161). Anchors used here:
  * every spin-polarized functional must reduce exactly to the
    closed-shell (RKS) form at zeta = 0;
  * UHF ('hf' pseudo-functional) on a one-electron system is exact
    (= lowest generalized eigenvalue of hcore);
  * triplet H2 at large separation must be size-consistent with two
    isolated doublet H atoms (validates the zeta = 1 limit end to end).
"""

import numpy as np
import pytest
import scipy.linalg as sla

from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.molecule import Molecule
from evcont_tpu.solvers import dft
from evcont_tpu.solvers.dft import rks, uks

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def _h2(d=1.4, spin=0):
    return Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, d))],
                          basis="sto-3g", spin=spin, unit="Bohr")


def test_spin_functionals_reduce_to_closed_shell():
    rng = np.random.default_rng(0)
    rho = 10.0 ** rng.uniform(-8, 1, 200)
    sigma = 10.0 ** rng.uniform(-10, 2, 200)
    for xc in ("lda", "pbe", "b3lyp", "camb3lyp", "hf"):
        f_r = rho * dft._xc_energy_density(rho, sigma, xc)
        f_u = dft._xc_f_spin(0.5 * rho, 0.5 * rho, 0.25 * sigma,
                             0.25 * sigma, 0.25 * sigma, xc)
        assert np.max(np.abs(f_r - f_u)
                      / np.maximum(np.abs(f_r), 1e-12)) < 1e-12, xc


def test_polarized_exchange_scaling():
    """Fully polarized LDA exchange = 2^(1/3) x unpolarized (exact spin
    scaling)."""
    rho = np.array([0.3, 1.0, 3.0])
    z = np.zeros_like(rho)
    f = dft._xc_f_spin(rho, 1e-30 + z, z, z, z, "lda")
    rs = (3.0 / (4 * np.pi * rho)) ** (1 / 3)
    ex_only = f - rho * dft._eps_c_pz_spin(rs, np.ones_like(rho))
    ratio = ex_only / (rho * dft._eps_x_lda(rho))
    np.testing.assert_allclose(ratio, 2.0 ** (1.0 / 3.0), rtol=1e-12)


def test_pw92_spin_limits():
    """The zeta = 1 PW92 correlation equals the polarized fit, zeta = 0 the
    unpolarized one."""
    rs = np.array([0.5, 1.0, 2.0, 5.0])
    np.testing.assert_allclose(dft._eps_c_pw92_spin(rs, 0.0 * rs),
                               dft._eps_c_pw92(rs), rtol=1e-14)
    ec1 = dft._pw92_G(rs, *dft._PW_EC1)
    np.testing.assert_allclose(dft._eps_c_pw92_spin(rs, 1.0 + 0 * rs),
                               ec1, rtol=1e-12)


@pytest.mark.parametrize("xc", ["lda", "pbe", "b3lyp", "camb3lyp", "hf"])
def test_uks_equals_rks_closed_shell(xc):
    mol = _h2()
    eng = IntegralEngine(mol)
    r = rks(eng, xc=xc, n_rad=40, angular=50)
    u = uks(eng, xc=xc, n_rad=40, angular=50)
    assert r.converged and u.converged
    assert abs(r.e_tot - u.e_tot) < 2e-7, xc
    assert abs(u.spin_sq) < 1e-8


def test_uhf_one_electron_exact():
    mol = Molecule.build([("H", (0, 0, 0))], basis="6-31g", spin=1)
    eng = IntegralEngine(mol)
    u = uks(eng, xc="hf", n_rad=40, angular=50)
    b = eng.compute_jit(np.asarray(mol.coords))
    e_exact = sla.eigh(np.array(b.hcore), np.array(b.ovlp))[0][0]
    assert u.converged
    assert abs(u.e_tot - e_exact) < 1e-8
    assert abs(u.spin_sq - 0.75) < 1e-10


@pytest.mark.parametrize("xc", ["lda", "pbe", "hf"])
def test_triplet_h2_size_consistent(xc):
    """E(triplet H2 at 60 Bohr) = 2 E(H atom): exercises the fully
    polarized branch of every channel through the SCF."""
    molh = Molecule.build([("H", (0, 0, 0))], basis="sto-3g", spin=1)
    e_atom = uks(IntegralEngine(molh), xc=xc, n_rad=60,
                 angular=50).e_tot
    mol2 = _h2(d=60.0, spin=2)
    e_trip = uks(IntegralEngine(mol2), xc=xc, n_rad=60,
                 angular=50).e_tot
    assert abs(e_trip - 2.0 * e_atom) < 5e-6, xc
