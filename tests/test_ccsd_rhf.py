"""Closed-shell (spin-adapted) CCSD vs the spin-orbital oracle.

The strong test is rhs equality at RANDOM (non-converged) amplitudes:
embedding spatial abab amplitudes into the spin-orbital layout and
extracting the abab block of the spin-orbital rhs must reproduce the
spatial rhs exactly — this validates every term of the spin-adapted
equations, not just the converged fixed point.
"""

import numpy as np
import pytest

from evcont_tpu.solvers.ccsd import (
    _hbar_rhs,
    ccsd,
    spin_orbital_integrals,
)
from evcont_tpu.solvers.ccsd_rhf import (
    _embed_so,
    _rhs_rhf,
    ccsd_rhf,
    rhf_corr_energy,
)


def _random_problem(n=5, no=2, seed=7, scale=0.05):
    rng = np.random.default_rng(seed)
    h1 = rng.normal(size=(n, n)) * 0.1
    h1 = 0.5 * (h1 + h1.T)
    # make the diagonal dominant so denominators are well separated
    h1 += np.diag(np.arange(n, dtype=float) * 2.0 - 2.0 * no)
    a = rng.normal(size=(n, n, n, n)) * scale
    # chemist (pq|rs) 8-fold symmetry for a real orbital basis
    eri = a + a.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    return h1, eri, 2 * no


def _random_amplitudes(no, nv, seed=11):
    rng = np.random.default_rng(seed)
    t1 = rng.normal(size=(no, nv)) * 0.05
    t2 = rng.normal(size=(no, no, nv, nv)) * 0.05
    t2 = 0.5 * (t2 + t2.transpose(1, 0, 3, 2))  # abab symmetry
    return t1, t2


def test_rhs_matches_spin_orbital_oracle():
    h1, eri, nelec = _random_problem()
    n = h1.shape[0]
    no = nelec // 2
    nv = n - no
    t1, t2 = _random_amplitudes(no, nv)

    V = np.asarray(eri).transpose(0, 2, 1, 3)
    f = (h1 + 2.0 * np.einsum("piqi->pq", V[:, :no, :, :no])
         - np.einsum("piiq->pq", V[:, :no, :no, :]))
    rhs1, rhs2 = _rhs_rhf(t1, t2, f, V)

    h_so, v_so, no_so = spin_orbital_integrals(h1, eri, nelec)
    f_so = h_so + np.einsum("piqi->pq", v_so[:, :no_so, :, :no_so])
    t1_so, t2_so = _embed_so(t1, t2)
    rhs1_so, rhs2_so = _hbar_rhs(t1_so, t2_so, f_so, v_so)

    np.testing.assert_allclose(rhs1, rhs1_so[::2, ::2], atol=1e-12)
    np.testing.assert_allclose(rhs2, rhs2_so[::2, 1::2, ::2, 1::2],
                               atol=1e-12)


def test_energy_matches_spin_orbital_oracle():
    h1, eri, nelec = _random_problem(seed=3)
    n = h1.shape[0]
    no = nelec // 2
    t1, t2 = _random_amplitudes(no, n - no, seed=5)

    V = np.asarray(eri).transpose(0, 2, 1, 3)
    f = (h1 + 2.0 * np.einsum("piqi->pq", V[:, :no, :, :no])
         - np.einsum("piiq->pq", V[:, :no, :no, :]))
    e_sp = float(rhf_corr_energy(t1, t2, f, V))

    # spin-orbital correlation energy functional at the embedded point
    h_so, v_so, no_so = spin_orbital_integrals(h1, eri, nelec)
    f_so = h_so + np.einsum("piqi->pq", v_so[:, :no_so, :, :no_so])
    t1_so, t2_so = _embed_so(t1, t2)
    o, u = slice(None, no_so), slice(no_so, None)
    tau = t2_so + np.einsum("ia,jb->ijab", t1_so, t1_so) \
        - np.einsum("ib,ja->ijab", t1_so, t1_so)
    e_so = (np.einsum("ia,ia->", f_so[o, u], t1_so)
            + 0.25 * np.einsum("ijab,ijab->", v_so[o, o, u, u], tau))
    assert abs(e_sp - e_so) < 1e-12


def test_converged_energy_and_triples_match():
    h1, eri, nelec = _random_problem(n=6, no=2, seed=19, scale=0.01)
    e_so, et_so, _ = ccsd(h1, eri, nelec, with_triples=True)
    e_sp, et_sp, _ = ccsd_rhf(h1, eri, nelec, with_triples=True)
    assert abs(e_sp - e_so) < 1e-8
    assert abs(et_sp - et_so) < 1e-8


def test_open_shell_rejected():
    h1, eri, _ = _random_problem()
    with pytest.raises(ValueError):
        ccsd_rhf(h1, eri, 3)
    with pytest.raises(ValueError):
        ccsd_rhf(h1, eri, (3, 2))


@pytest.mark.slow
def test_physical_h4_matches_spin_orbital():
    """Real molecular integrals: the spatial solver must reproduce the
    spin-orbital CCSD(T) energies on H4/STO-3G."""
    from evcont_tpu.integrals.engine import IntegralEngine
    from evcont_tpu.molecule import Molecule
    from evcont_tpu.oao import transform_integrals
    from evcont_tpu.solvers.scf import rhf_from_engine

    mol = Molecule.build([("H", (0, 0, 1.7 * i)) for i in range(4)],
                         basis="sto-3g")
    eng = IntegralEngine(mol)
    res = rhf_from_engine(eng)
    b = eng.compute_jit(np.asarray(mol.coords))
    h1m, erim = [np.array(x) for x in transform_integrals(
        np.array(b.hcore), np.array(b.eri), res.mo_coeff)]
    ec_so, et_so, _ = ccsd(h1m, erim, 4, with_triples=True)
    ec_sp, et_sp, _ = ccsd_rhf(h1m, erim, 4, with_triples=True)
    assert abs(ec_sp - ec_so) < 1e-8
    assert abs(et_sp - et_so) < 1e-8
