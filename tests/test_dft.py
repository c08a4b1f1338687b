"""DFT baseline tests: grid exactness, functional cross-validation, SCF."""

import numpy as np
import pytest

from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.solvers.dft import rks, _eps_c_pz, _eps_c_pw92
from evcont_tpu.solvers.dft_grid import (
    lebedev26, lebedev50, product_angular, molecular_grid, eval_aos)
from evcont_tpu.workloads.common import water

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



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


def test_vwn5_vs_pw92():
    """VWN5 and PW92 parametrize the same uniform-gas correlation; sub-mHa
    agreement cross-validates the VWN5 coefficients used in B3LYP/CAM."""
    from evcont_tpu.solvers.dft import _eps_c_vwn5
    rs = np.array([0.5, 1.0, 2.0, 5.0, 10.0, 20.0])
    assert np.abs(_eps_c_vwn5(rs) - _eps_c_pw92(rs)).max() < 1e-3


def test_b88_reduces_to_lda():
    """With zero density gradient B88 is exactly Slater exchange."""
    from evcont_tpu.solvers.dft import _ex_b88_spin, _eps_x_lda
    rho = np.array([1e-3, 0.1, 1.0, 10.0])
    e_b88 = 2.0 * _ex_b88_spin(0.5 * rho, np.zeros_like(rho))
    np.testing.assert_allclose(e_b88, rho * _eps_x_lda(rho), rtol=1e-12)


def test_cam_attenuation_limits():
    """g(a) -> 0 (all exchange short-range) for a -> 0 and -> 1 for
    a -> inf (Iikura/Tawada scheme), monotone in between."""
    from evcont_tpu.solvers.dft import _cam_lr_fraction
    a = np.logspace(-4, 3, 200)
    g = _cam_lr_fraction(a)
    assert g[0] < 1e-3
    assert g[-1] > 0.999
    assert np.all(np.diff(g) >= -1e-12)
    assert np.all((g >= 0) & (g <= 1))


def test_lyp_helium_anchor():
    """LYP was fitted to the He atom: E_c^LYP on the HF density is
    -0.0437 Ha (Lee/Yang/Parr 1988). Evaluate the implemented closed-shell
    Miehlich form on our RHF/cc-pVDZ He density."""
    from evcont_tpu.molecule import Molecule
    from evcont_tpu.solvers.scf import rhf_from_engine
    from evcont_tpu.solvers.dft import _ec_lyp_closed
    from evcont_tpu.solvers.dft_grid import molecular_grid, eval_aos
    import evcont_tpu.basis_data as bd

    bd.BASIS_SETS.setdefault("he-dz", {})["He"] = [
        (0, [38.36, 5.770, 1.240], [0.0238090, 0.1548910, 0.4699870]),
        (0, [0.2976], [1.0]),
        (1, [1.275], [1.0]),
    ]
    mol = Molecule.build([("He", (0.0, 0.0, 0.0))], basis="he-dz")
    eng = IntegralEngine(mol)
    res = rhf_from_engine(eng)
    assert abs(res.e_tot - (-2.8551605)) < 5e-4  # RHF/cc-pVDZ He
    pts, wts = molecular_grid(mol, n_rad=100, angular="product")
    phi, dphi = eval_aos(eng, pts, deriv=True)
    rho = np.einsum("ni,ij,nj->n", phi, res.dm, phi, optimize=True)
    grad = 2.0 * np.einsum("ndi,ij,nj->nd", dphi, res.dm, phi,
                           optimize=True)
    sigma = np.sum(grad * grad, axis=1)
    e_lyp = float(np.sum(wts * _ec_lyp_closed(rho, sigma)))
    assert abs(e_lyp - (-0.0437)) < 2e-3, e_lyp


def test_lr_eri_limits():
    """erf-attenuated ERIs: omega -> inf recovers the full Coulomb ERI,
    omega -> 0 kills it; intermediate omega lies strictly between."""
    import jax
    from evcont_tpu.workloads.common import water

    eng = IntegralEngine(water("sto-3g"))
    c = np.asarray(eng.mol.coords)
    g = np.array(jax.jit(eng.eri)(c))
    g_big = np.array(jax.jit(lambda x: eng.eri(x, omega=1e4))(c))
    g_small = np.array(jax.jit(lambda x: eng.eri(x, omega=1e-4))(c))
    g_mid = np.array(jax.jit(lambda x: eng.eri(x, omega=0.33))(c))
    np.testing.assert_allclose(g_big, g, atol=1e-6)
    assert np.abs(g_small).max() < 1e-3
    d = np.einsum("iiii->i", g_mid)
    d_full = np.einsum("iiii->i", g)
    assert np.all(d > 0) and np.all(d < d_full)


def test_hf_pseudofunctional_matches_rhf():
    """xc='hf' routes everything through the hybrid-exchange machinery and
    must reproduce RHF exactly (validates K-matrix contraction + energy)."""
    from evcont_tpu.solvers.scf import rhf_from_engine
    eng = IntegralEngine(water("sto-3g"))
    res = rks(eng, xc="hf", n_rad=30, angular=26)
    ref = rhf_from_engine(eng)
    assert res.converged
    assert abs(res.e_tot - ref.e_tot) < 1e-7


def test_camb3lyp_h2o():
    """CAM-B3LYP SCF end-to-end (reference baseline:
    Zundel_thermodynamics/reference_dynamics/Zundel_DFT_CAMB3LYP.py).
    Sanity: converges, integrates 10 electrons, sits between pure-GGA and
    HF total energies, and differs from B3LYP by the range separation."""
    from evcont_tpu.solvers.scf import rhf_from_engine
    eng = IntegralEngine(water("sto-3g"))
    cam = rks(eng, xc="camb3lyp")
    b3 = rks(eng, xc="b3lyp")
    assert cam.converged and b3.converged
    assert abs(cam.n_elec_grid - 10.0) < 1e-6
    e_hf = rhf_from_engine(eng).e_tot
    # hybrids carry correlation: below HF
    assert cam.e_tot < e_hf
    assert b3.e_tot < e_hf
    assert abs(cam.e_tot - b3.e_tot) > 1e-4  # range separation matters
    assert abs(cam.e_tot - b3.e_tot) < 0.1
