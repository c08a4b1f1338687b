"""Integral-engine correctness tests.

Oracles:
  * scipy's incomplete gamma for the Boys function
  * textbook H2/STO-3G values (Szabo & Ostlund tables 3.5/3.6)
  * literature RHF energies (H2O/6-31G)
  * internal consistency: permutation symmetries, translation invariance,
    finite-difference derivatives (validating the autodiff force path)
"""

import jax
import numpy as np
import pytest
from scipy.special import gammainc, gamma as Gamma

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.boys import boys
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.solvers.scf import rhf_from_engine


def water(basis):
    r, theta = 0.9572, np.deg2rad(104.52)
    atoms = [
        ("O", (0.0, 0.0, 0.0)),
        ("H", (r * np.sin(theta / 2), 0.0, r * np.cos(theta / 2))),
        ("H", (-r * np.sin(theta / 2), 0.0, r * np.cos(theta / 2))),
    ]
    return Molecule.build(atoms, basis=basis, unit="Angstrom")


def test_boys_vs_scipy():
    T = np.concatenate([
        np.linspace(0.0, 17.99, 300),
        np.linspace(18.01, 300.0, 300),
        [0.0, 1e-14, 1e-6, 18.0, 1e4],
    ])
    F = np.array(boys(8, T))
    m = np.arange(9)
    Tc = np.maximum(T[:, None], 1e-30)
    ref = np.where(
        T[:, None] < 1e-12,
        1.0 / (2 * m + 1),
        Gamma(m + 0.5) * gammainc(m + 0.5, Tc) / (2 * Tc ** (m + 0.5)),
    )
    rel = np.abs(F - ref) / np.maximum(np.abs(ref), 1e-300)
    assert rel.max() < 1e-13


def test_boys_derivative():
    # dF_m/dT = -F_{m+1} (carried by the custom JVP; check against the
    # identity AND against finite differences so the rule itself is pinned)
    T = np.array([0.3, 5.0, 17.9, 18.1, 40.0])
    jac = jax.vmap(jax.jacfwd(lambda t: boys(3, t)))(T)
    F = np.array(boys(4, T))
    np.testing.assert_allclose(np.array(jac), -F[:, 1:], rtol=1e-10, atol=1e-14)
    eps = 1e-6
    fd = (np.array(boys(3, T + eps)) - np.array(boys(3, T - eps))) / (2 * eps)
    np.testing.assert_allclose(np.array(jac), fd, rtol=5e-5, atol=1e-10)
    # reverse mode agrees (transpose of the linear tangent rule)
    g = jax.vmap(jax.grad(lambda t: boys(3, t).sum()))(T)
    np.testing.assert_allclose(np.array(g), -F[:, 1:].sum(axis=1),
                               rtol=1e-10, atol=1e-14)


def test_boys_f32_branch_accuracy():
    """The f32 series/switch configuration (TPU throughput path) must stay
    at f32 precision for every order the eri path can request (L up to 12
    covers f-shell quartets)."""
    T = np.concatenate([
        np.linspace(0.0, 60.0, 1201), [1e-8, 11.99, 12.01, 14.0, 200.0],
    ])
    for m_max in (4, 12):
        F32 = np.array(boys(m_max, T.astype(np.float32)), dtype=np.float64)
        F64 = np.array(boys(m_max, T))
        rel = np.abs(F32 - F64) / np.maximum(np.abs(F64), 1e-300)
        assert rel.max() < 4e-6, (m_max, rel.max())


def test_h2_sto3g_textbook():
    mol = Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, 1.4))], basis="sto-3g")
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    S, T, g = np.array(b.ovlp), np.array(b.hcore), np.array(b.eri)
    # Szabo & Ostlund: S12=0.6593, (11|11)=0.7746, (11|22)=0.5697, (12|12)=0.2970
    assert abs(S[0, 1] - 0.6593) < 2e-4
    assert abs(g[0, 0, 0, 0] - 0.7746) < 2e-4
    assert abs(g[0, 0, 1, 1] - 0.5697) < 2e-4
    assert abs(g[0, 1, 0, 1] - 0.2970) < 2e-4
    assert abs(float(b.enuc) - 1.0 / 1.4) < 1e-12


def test_h2o_631g_rhf_literature():
    res = rhf_from_engine(IntegralEngine(water("6-31g")))
    assert res.converged
    # literature RHF/6-31G at the experimental geometry
    assert abs(res.e_tot - (-75.98399747)) < 2e-5


def test_eri_symmetries():
    mol = water("sto-3g")
    eng = IntegralEngine(mol)
    g = np.array(jax.jit(eng.eri)(np.asarray(mol.coords)))
    np.testing.assert_allclose(g, g.transpose(1, 0, 2, 3), atol=1e-12)
    np.testing.assert_allclose(g, g.transpose(0, 1, 3, 2), atol=1e-12)
    np.testing.assert_allclose(g, g.transpose(2, 3, 0, 1), atol=1e-12)


def test_translation_invariance():
    mol = water("sto-3g")
    eng = IntegralEngine(mol)
    c0 = np.asarray(mol.coords)
    c1 = c0 + np.array([0.7, -0.3, 1.1])
    b0 = eng.compute_jit(c0)
    b1 = eng.compute_jit(c1)
    np.testing.assert_allclose(np.array(b0.ovlp), np.array(b1.ovlp), atol=1e-11)
    np.testing.assert_allclose(np.array(b0.hcore), np.array(b1.hcore), atol=1e-10)
    np.testing.assert_allclose(np.array(b0.eri), np.array(b1.eri), atol=1e-10)


def test_integral_gradients_vs_finite_difference():
    """Validates the autodiff path that replaces the reference's analytic
    derivative integrals (int1e_ipovlp / int2e_ip1 / hcore_generator)."""
    mol = Molecule.build(
        [("H", (0, 0, 0)), ("H", (0.1, 0.2, 1.5)), ("H", (0.0, 0.1, 3.1))],
        basis="sto-3g", spin=1)
    eng = IntegralEngine(mol)
    c0 = np.asarray(mol.coords)

    def loss(coords):
        b = eng.compute(coords)
        # arbitrary smooth scalar mixing all integral types
        return (jax.numpy.sum(b.ovlp ** 2) + jax.numpy.sum(b.hcore ** 3)
                + jax.numpy.sum(b.eri ** 2) + b.enuc)

    g = np.array(jax.jit(jax.grad(loss))(c0))
    eps = 1e-5
    for (i, d) in [(0, 0), (1, 2), (2, 1)]:
        cp, cm = c0.copy(), c0.copy()
        cp[i, d] += eps
        cm[i, d] -= eps
        fd = (float(loss(cp)) - float(loss(cm))) / (2 * eps)
        assert abs(g[i, d] - fd) < 1e-6 * max(1.0, abs(fd))


def test_h2o_ccpvdz_rhf_literature():
    """d-function path: spherical-harmonic AOs, per-shell cart->sph
    transform, cc-pVDZ basis data. Literature RHF/cc-pVDZ at the
    experimental geometry."""
    mol = water("cc-pvdz")
    eng = IntegralEngine(mol)
    assert eng.nao == 24
    b = eng.compute_jit(np.asarray(mol.coords))
    S = np.array(b.ovlp)
    np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-12)
    res = rhf_from_engine(eng)
    assert res.converged
    assert abs(res.e_tot - (-76.026799)) < 2e-5


@pytest.mark.slow
def test_f_shell_machinery():
    """l >= 3 spherical harmonics from the numerical harmonic-kernel basis:
    unit norms and exact rotation closure (a non-harmonic admixture would
    break the rotational invariance of generalized spectra)."""
    from evcont_tpu.integrals.shells import (cart2sph_matrix,
                                             cart_overlap_metric)
    from evcont_tpu import basis_data
    import scipy.linalg as sla

    for l in (3, 4):
        T = cart2sph_matrix(l)
        M = cart_overlap_metric(l)
        np.testing.assert_allclose(T @ M @ T.T, np.eye(2 * l + 1),
                                   atol=1e-12)

    basis_data.BASIS_SETS["test-f"] = {
        "H": [(0, [1.2], [1.0]), (3, [0.8], [1.0])],
    }
    mol = Molecule.build([("H", (0, 0, 0)), ("H", (0.3, 0.2, 1.6))],
                         basis="test-f")
    eng = IntegralEngine(mol)
    assert eng.nao == 16
    c = np.asarray(mol.coords)
    b = eng.compute_jit(c)
    S, h = np.array(b.ovlp), np.array(b.hcore)
    np.testing.assert_allclose(np.diag(S), 1.0, atol=1e-12)
    th = 0.7
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    b2 = eng.compute_jit(c @ R.T)
    e1 = sla.eigh(h, S, eigvals_only=True)
    e2 = sla.eigh(np.array(b2.hcore), np.array(b2.ovlp), eigvals_only=True)
    np.testing.assert_allclose(e1, e2, atol=1e-10)


def test_h2_ccpvtz_rhf():
    """cc-pVTZ H data (s/p/d shells): variationally below cc-pVDZ and
    within 1 mHa of the H2 HF limit (-1.13363 at R=1.4)."""
    mol = Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, 1.4))],
                         basis="cc-pvtz")
    eng = IntegralEngine(mol)
    assert eng.nao == 28
    res = rhf_from_engine(eng)
    assert res.converged
    assert -1.13363 < res.e_tot < -1.13250, res.e_tot


@pytest.mark.slow  # ~30 min cold compile on this 1-core host (58-AO eri
# graph); the d-shell/VTZ code paths stay covered in the core lane by
# test_h2_ccpvtz_rhf and test_h2o_ccpvdz_rhf_literature
def test_h2o_ccpvtz_rhf_literature():
    """cc-pVTZ O data incl. the f shell: literature RHF/cc-pVTZ at the
    experimental geometry (reference vtz workloads,
    scripts/MD/H2O/md_H2O_vtz_CAS_continuation.py:20-21). The 58-AO
    integral values are disk-cached keyed by the engine source hash
    (conftest.cached_bundle) — recomputed from scratch whenever any
    integrals/ source changes."""
    from conftest import cached_bundle
    from evcont_tpu.solvers.scf import rhf

    mol = water("cc-pvtz")
    ovlp, hcore, eri, enuc = cached_bundle(mol)
    assert ovlp.shape == (58, 58)
    res = rhf(ovlp, hcore, eri, enuc, mol.nelec)
    assert res.converged
    assert abs(res.e_tot - (-76.0571685)) < 2e-5


def test_h2o_sto6g_rhf():
    """STO-6G C/N/O rows were re-derived in this repo by the same
    overlap-maximizing fit the STO-NG papers use (see basis_data.py: the
    procedure reproduces the published STO-3G 1s/2sp and STO-6G 1s tables
    to <=1e-5). SCF anchor: H2O/STO-6G sits ~0.72 Ha below STO-3G (the
    STO-NG series converges toward the Slater-basis result from above),
    value pinned as a regression."""
    mol = water("sto-6g")
    eng = IntegralEngine(mol)
    assert eng.nao == 7
    res = rhf_from_engine(eng)
    assert res.converged
    e3g = -74.9629247356596          # same geometry, sto-3g (pinned above)
    assert res.e_tot < e3g - 0.5
    assert abs(res.e_tot - (-75.67867537180206)) < 1e-6


def test_eri_class_chunking_exact():
    """Splitting large pair classes into chunks must leave the ERI tensor
    bit-for-bit equivalent (the (1+T) symmetrization treats cross-chunk
    combos as ordinary distinct classes). Forces a tiny chunk so every
    class splits."""
    mol = Molecule.build([("H", (0, 0, 1.5 * i)) for i in range(4)],
                         basis="6-31g")
    eng_full = IntegralEngine(mol)
    c = np.asarray(mol.coords)
    g_full = np.array(jax.jit(eng_full.eri)(c))

    class ChunkedEngine(IntegralEngine):
        _ERI_CLASS_CHUNK = 7

    eng_chunk = ChunkedEngine(mol)
    g_chunk = np.array(jax.jit(eng_chunk.eri)(c))
    assert len(eng_chunk._upairs) > len(eng_full._upairs)
    np.testing.assert_allclose(g_chunk, g_full, atol=1e-13)
