"""DFT baseline tests: grid exactness, functional cross-validation, SCF."""

import numpy as np
import pytest

from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.solvers.dft import rks, _eps_c_pz, _eps_c_pw92
from evcont_tpu.solvers.dft_grid import (
    lebedev26, lebedev50, product_angular, molecular_grid, eval_aos)
from evcont_tpu.workloads.common import water


def test_angular_rules_exact():
    for pts, wts in [lebedev26(), lebedev50(), product_angular(12)]:
        assert abs(wts.sum() - 1.0) < 1e-13
        np.testing.assert_allclose(np.linalg.norm(pts, axis=1), 1.0,
                                   atol=1e-12)
        # exact moments: <x^2> = 1/3, <x^2 y^2 z^2> = 1/105, <x^4 y^2> = 1/35
        assert abs((wts * pts[:, 0] ** 2).sum() - 1 / 3) < 1e-12
        f = pts[:, 0] ** 2 * pts[:, 1] ** 2 * pts[:, 2] ** 2
        assert abs((wts * f).sum() - 1 / 105) < 1e-12
        f2 = pts[:, 0] ** 4 * pts[:, 1] ** 2
        assert abs((wts * f2).sum() - 1 / 35) < 1e-12


def test_grid_reproduces_overlap():
    mol = water("sto-3g")
    eng = IntegralEngine(mol)
    pts, wts = molecular_grid(mol, n_rad=75, angular="product")
    phi = eval_aos(eng, pts)
    S_grid = np.einsum("n,ni,nj->ij", wts, phi, phi, optimize=True)
    S = np.array(eng.compute_jit(np.asarray(mol.coords)).ovlp)
    assert np.abs(S_grid - S).max() < 1e-6


def test_lda_parametrizations_agree():
    """PZ81 and PW92 are independent fits of the same uniform-gas QMC data;
    their sub-mHa agreement cross-validates both coefficient sets."""
    rs = np.array([0.5, 1.0, 2.0, 5.0, 10.0, 20.0])
    assert np.abs(_eps_c_pz(rs) - _eps_c_pw92(rs)).max() < 1e-3


def test_rks_h2o():
    eng = IntegralEngine(water("sto-3g"))
    lda = rks(eng, xc="lda")
    assert lda.converged
    assert abs(lda.n_elec_grid - 10.0) < 1e-6
    pbe = rks(eng, xc="pbe")
    assert pbe.converged
    # PBE adds gradient corrections that lower the energy vs LDA
    assert pbe.e_tot < lda.e_tot
    # sane range relative to HF
    from evcont_tpu.solvers.scf import rhf_from_engine
    e_hf = rhf_from_engine(eng).e_tot
    assert abs(pbe.e_tot - e_hf) < 1.0
