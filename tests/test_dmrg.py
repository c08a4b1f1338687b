"""In-framework DMRG tests: MPO exactness, ground states vs FCI, and the
DMRG training backend."""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.oao import loewdin_trafo, transform_integrals
from evcont_tpu.solvers.fci import FCISolver
from evcont_tpu.solvers.dmrg import (
    build_hamiltonian_mpo, dmrg_ground_state, mpo_to_dense,
    mps_to_ci, mpo_expectation,
)

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'


def _ints(natoms, d):
    mol = Molecule.build([("H", (0, 0, d * i)) for i in range(natoms)],
                         basis="sto-3g")
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = [np.array(x) for x in transform_integrals(
        np.array(b.hcore), np.array(b.eri), trafo)]
    return h1, h2


def _dense_fock_h(h1, eri):
    """Independent Fock-space construction via kron products."""
    norb = h1.shape[0]
    n = 2 * norb
    I2, Z = np.eye(2), np.diag([1.0, -1.0])
    CR = np.array([[0.0, 0.0], [1.0, 0.0]])

    def mode_op(i, op):
        out = np.array([[1.0]])
        for m in [Z] * i + [op] + [I2] * (n - i - 1):
            out = np.kron(out, m)
        return out

    ad = [mode_op(i, CR) for i in range(n)]
    a = [m.T for m in ad]
    H = np.zeros((2 ** n, 2 ** n))
    for p in range(norb):
        for q in range(norb):
            if abs(h1[p, q]) > 1e-14:
                for s in range(2):
                    H += h1[p, q] * (ad[2 * p + s] @ a[2 * q + s])
    for p in range(norb):
        for q in range(norb):
            for r in range(norb):
                for s_ in range(norb):
                    g = eri[p, q, r, s_]
                    if abs(g) < 1e-14:
                        continue
                    for sa in range(2):
                        for sb in range(2):
                            H += 0.5 * g * (ad[2 * p + sa] @ ad[2 * r + sb]
                                            @ a[2 * s_ + sb]
                                            @ a[2 * q + sa])
    return H


def test_mpo_exact_vs_dense_fock():
    h1, h2 = _ints(3, 1.6)
    W = build_hamiltonian_mpo(h1, h2)
    np.testing.assert_allclose(mpo_to_dense(W), _dense_fock_h(h1, h2),
                               atol=1e-11)


def test_dmrg_ground_state_vs_fci():
    h1, h2 = _ints(4, 1.8)
    W = build_hamiltonian_mpo(h1, h2)
    e, mps = dmrg_ground_state(W, 8, 4, bond_dims=(16, 32, 64),
                               sweeps_per_dim=2)
    e_fci, v_fci = FCISolver(4, 4).kernel(h1, h2)
    assert abs(e - e_fci) < 1e-8
    # CI extraction with JW reordering signs: state overlap up to phase
    ci = mps_to_ci(mps, 4, (2, 2))
    ci = ci / np.linalg.norm(ci)
    assert abs(abs(np.vdot(ci, v_fci)) - 1.0) < 1e-7


def test_dmrg_backend_matches_fci_backend():
    from evcont_tpu.backends.dmrg_backend import DMRGBackend
    from evcont_tpu.backends.fci_backend import FCIBackend
    from evcont_tpu.model import ContinuationModel

    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    bd = DMRGBackend(bond_dims=(16, 32), sweeps_per_dim=2)
    bf = FCIBackend()
    for d in [1.4, 2.1]:
        bd.append_to_rdms(h4(d))
        bf.append_to_rdms(h4(d))
    np.testing.assert_allclose(bd.ens, bf.ens, atol=1e-8)
    md = ContinuationModel.from_backend(h4(1.8), bd)
    mf = ContinuationModel.from_backend(h4(1.8), bf)
    for d in [1.6, 2.3]:
        ed = float(md.potential(h4(d).coords))
        ef = float(mf.potential(h4(d).coords))
        assert abs(ed - ef) < 1e-7


def test_mps_cross_expectations():
    """MPS-native overlap and transition 1-RDM between different MPSes
    (bra != ket) must match the dense CI extraction — the first rung of
    orbital-unlimited DMRG t-RDMs."""
    from evcont_tpu.solvers.dmrg import (
        mps_overlap, mps_transition_rdm1, mps_to_ci)

    # random-MPS sanity: overlap equals the statevector dot product
    from evcont_tpu.solvers.dmrg import mps_to_statevector
    rng = np.random.default_rng(0)
    A = [rng.standard_normal(s) for s in [(1, 2, 3), (3, 2, 4), (4, 2, 1)]]
    B = [rng.standard_normal(s) for s in [(1, 2, 2), (2, 2, 5), (5, 2, 1)]]
    assert abs(mps_overlap(A, B)
               - np.vdot(mps_to_statevector(A),
                         mps_to_statevector(B))) < 1e-12

    mps_list, ci_list = [], []
    for d in [1.5, 2.2]:
        h1, h2 = _ints(4, d)
        W = build_hamiltonian_mpo(h1, h2)
        _, mps = dmrg_ground_state(W, 8, 4, bond_dims=(16, 32),
                                   sweeps_per_dim=2)
        mps_list.append(mps)
        ci_list.append(mps_to_ci(mps, 4, (2, 2)))
    assert abs(mps_overlap(*mps_list)
               - np.vdot(ci_list[0], ci_list[1])) < 1e-8
    r1_mps = mps_transition_rdm1(mps_list[0], mps_list[1], 4)
    r1_ci, _ = FCISolver(4, 4, spin=None).trans_rdm12(ci_list[0],
                                                      ci_list[1])
    np.testing.assert_allclose(r1_mps, r1_ci, atol=1e-8)


def test_mps_cross_rdm2_and_backend_mode():
    """MPS-native transition 2-RDM matches dense CI algebra, and the
    DMRG backend's trdm_method='mps' matches 'dense' end to end."""
    from evcont_tpu.solvers.dmrg import mps_transition_rdm12, mps_to_ci
    from evcont_tpu.backends.dmrg_backend import DMRGBackend
    from evcont_tpu.model import ContinuationModel

    mps_list, ci_list = [], []
    for d in [1.5, 2.2]:
        h1, h2 = _ints(4, d)
        W = build_hamiltonian_mpo(h1, h2)
        _, mps = dmrg_ground_state(W, 8, 4, bond_dims=(16, 32),
                                   sweeps_per_dim=2)
        mps_list.append(mps)
        ci_list.append(mps_to_ci(mps, 4, (2, 2)))
    r1_mps, r2_mps = mps_transition_rdm12(mps_list[0], mps_list[1], 4)
    r1_ci, r2_ci = FCISolver(4, 4, spin=None).trans_rdm12(
        ci_list[0], ci_list[1])
    np.testing.assert_allclose(r1_mps, r1_ci, atol=1e-8)
    np.testing.assert_allclose(r2_mps, r2_ci, atol=1e-8)

    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    b1 = DMRGBackend(bond_dims=(16, 32), trdm_method="dense")
    b2 = DMRGBackend(bond_dims=(16, 32), trdm_method="mps")
    for d in [1.4, 2.1]:
        b1.append_to_rdms(h4(d))
        b2.append_to_rdms(h4(d))
    m1 = ContinuationModel.from_backend(h4(1.8), b1)
    m2 = ContinuationModel.from_backend(h4(1.8), b2)
    for d in [1.6, 2.3]:
        e1 = float(m1.potential(h4(d).coords))
        e2 = float(m2.potential(h4(d).coords))
        assert abs(e1 - e2) < 1e-7


def test_sweep_trdm_matches_strings_oracle():
    """Batched cached-environment t-RDM sweep == exact string contraction
    on random MPSes (exercises every operator pattern: all site orders,
    fused same-site composites, JW parity)."""
    from evcont_tpu.solvers.dmrg import (mps_transition_rdm12,
                                         mps_transition_rdm12_strings)
    rng = np.random.default_rng(11)

    def rand_mps(n, m):
        mps, D = [], 1
        for i in range(n):
            Dn = 1 if i == n - 1 else min(m, 2 ** (min(i + 1, n - 1 - i) + 2))
            mps.append(rng.standard_normal((D, 2, Dn)) * 0.5)
            D = Dn
        return mps

    for norb in (3, 4, 5):
        A, B = rand_mps(2 * norb, 8), rand_mps(2 * norb, 8)
        r1s, r2s = mps_transition_rdm12_strings(A, B, norb)
        r1f, r2f = mps_transition_rdm12(A, B, norb, method="sweep")
        scale = max(np.abs(r2s).max(), 1.0)
        assert np.abs(r1f - r1s).max() / scale < 1e-12
        assert np.abs(r2f - r2s).max() / scale < 1e-12


def test_converge_dmrg_schedule_parity(tmp_path):
    """converge_dmrg reproduces the reference's control flow
    (converge_dmrg.py:10-107): per-rung noise 4^-i decay, result rows
    (bond_dim, energy, dw, noise) in DMRG_result_{tag}.txt, energy-tol
    early stop, and MPS save/restart."""
    from evcont_tpu.solvers.dmrg import converge_dmrg, mps_overlap

    h1, h2 = _ints(4, 1.8)
    ladder = np.array([8, 16, 32, 64])
    noises = np.append(np.logspace(-2, -7, num=4), 0)
    mps, e = converge_dmrg(h1, h2, (2, 2), "t0",
                           bond_dim_schedule=ladder, noises=noises,
                           tolerance=1e-6, workdir=str(tmp_path))
    # exact reference energy
    from evcont_tpu.solvers.fci import FCISolver
    ef, _ = FCISolver(4, 4, spin=None).kernel(h1, h2)
    assert abs(e - ef) < 1e-5

    log = np.loadtxt(tmp_path / "DMRG_result_t0.txt")
    log = np.atleast_2d(log)
    assert log.shape[1] == 4                        # bd, E, dw, noise
    # first rung's first sweep carries the undecayed first noise
    assert abs(log[0, 3] - 1e-2) < 1e-12
    assert int(log[0, 0]) == 8
    # rungs only from the ladder (last entry excluded, reference loop bound)
    assert set(log[:, 0].astype(int)) <= {8, 16, 32}
    # noise decays 4^-i between rungs: rung of bd=16 starts at 1e-2/4
    rows16 = log[log[:, 0] == 16]
    if len(rows16):
        assert abs(rows16[0, 3] - 1e-2 / 4) < 1e-12

    # restart: loads the saved MPS and converges immediately
    assert (tmp_path / "t0-mps.npz").exists()
    mps2, e2 = converge_dmrg(h1, h2, (2, 2), "t0b",
                             bond_dim_schedule=ladder, noises=0 * noises,
                             tolerance=1e-6, restart_tag="t0",
                             workdir=str(tmp_path))
    assert abs(e2 - e) < 1e-6
    assert abs(abs(mps_overlap(mps, mps2)) - 1.0) < 1e-6


def test_dmrg_backend_schedule_workdir(tmp_path):
    """DMRGBackend(workdir=...) routes through converge_dmrg: per-state
    logs and restartable MPS files appear, energies match FCI."""
    from evcont_tpu.backends.dmrg_backend import DMRGBackend
    from evcont_tpu.backends.fci_backend import FCIBackend

    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    bd = DMRGBackend(bond_dims=(16, 32), workdir=str(tmp_path),
                     tolerance=1e-7)
    bf = FCIBackend()
    for d in [1.5]:
        bd.append_to_rdms(h4(d))
        bf.append_to_rdms(h4(d))
    np.testing.assert_allclose(bd.ens, bf.ens, atol=1e-6)
    assert (tmp_path / "DMRG_result_state_0.txt").exists()
    assert (tmp_path / "state_0-mps.npz").exists()


def test_reference_ladder():
    from evcont_tpu.backends.dmrg_backend import reference_ladder
    lad = reference_ladder(256)
    assert lad[0] == 34                  # round(1.8^6)
    assert all(a < b for a, b in zip(lad, lad[1:]))
    assert max(lad) <= 256
    full = reference_ladder(10 ** 9)
    assert full[-1] == 6747              # round(1.8^15)


def test_rerun_append_strategy_matches_oao():
    """The rerun append strategy (reference DMRG_EVCont.py:90-272): solve
    each geometry in its own split-localized Fiedler-reordered basis, re-
    solve the ket Hamiltonian in the bra-aligned frame per cross term. At
    exact bond dimension every solve is exact, so the OAO-rotated t-RDM
    store — and the continuation PES — must match the default OAO
    strategy."""
    from evcont_tpu.backends.dmrg_backend import DMRGBackend
    from evcont_tpu.model import ContinuationModel

    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    kw = dict(bond_dims=(16, 32, 64), sweeps_per_dim=3, trdm_method="mps")
    b_oao = DMRGBackend(**kw)
    b_rr = DMRGBackend(append_strategy="rerun", cibasis="split", **kw)
    for d in [1.4, 2.1, 2.8]:
        b_oao.append_to_rdms(h4(d))
        b_rr.append_to_rdms(h4(d))
    # training energies are basis independent up to the convergence of two
    # INDEPENDENT variational solves (measured 1.4e-6 at these settings)
    np.testing.assert_allclose(b_rr.ens, b_oao.ens, atol=3e-6)
    # overlap Gram matrices agree entrywise (positive-overlap convention;
    # measured 8.8e-8)
    np.testing.assert_allclose(np.abs(b_rr.overlap),
                               np.abs(b_oao.overlap), atol=1e-6)
    m_oao = ContinuationModel.from_backend(h4(1.8), b_oao)
    m_rr = ContinuationModel.from_backend(h4(1.8), b_rr)
    for d in [1.6, 2.4]:
        e_o = float(m_oao.potential(h4(d).coords))
        e_r = float(m_rr.potential(h4(d).coords))
        # f32 prediction path; measured 4.8e-7
        assert abs(e_r - e_o) < 2e-6, (d, e_r, e_o)


def test_fiedler_orbital_reordering():
    """Fiedler ordering is a valid permutation, deterministic, and places
    the strongly-coupled orbital pair adjacent on the chain."""
    from evcont_tpu.solvers.localization import fiedler_orbital_reordering

    rng = np.random.default_rng(3)
    n = 6
    # weak uniform background (connected graph — a disconnected Laplacian
    # has a degenerate null space and no meaningful Fiedler vector) plus
    # one dominant 0-5 coupling
    h1 = np.full((n, n), 0.01) + np.diag(rng.normal(size=n) * 0.1)
    h1[0, 5] = h1[5, 0] = 2.0
    h2 = np.zeros((n, n, n, n))
    perm = fiedler_orbital_reordering(h1, h2)
    assert sorted(perm.tolist()) == list(range(n))
    p = perm.tolist()
    assert abs(p.index(0) - p.index(5)) == 1     # strongest edge adjacent
    np.testing.assert_array_equal(
        perm, fiedler_orbital_reordering(h1, h2))  # deterministic


def test_rerun_strategy_snapshot_resume_and_prune():
    """rerun_states travel through snapshot/restore (crash-resume parity
    with the OAO strategy) and prune_datapoints keeps records aligned."""
    from evcont_tpu.backends.dmrg_backend import DMRGBackend

    def h4(d):
        return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                              basis="sto-3g")

    kw = dict(bond_dims=(16, 32), sweeps_per_dim=2, trdm_method="mps",
              append_strategy="rerun", cibasis="canonical")
    b = DMRGBackend(**kw)
    for d in [1.4, 2.1]:
        b.append_to_rdms(h4(d))
    snap = b.snapshot()

    b2 = DMRGBackend(**kw)
    b2.restore(snap)
    assert len(b2.rerun_states) == 2
    b2.append_to_rdms(h4(2.8))

    b3 = DMRGBackend(**kw)
    for d in [1.4, 2.1, 2.8]:
        b3.append_to_rdms(h4(d))
    np.testing.assert_allclose(b2.ens, b3.ens, atol=1e-7)
    np.testing.assert_allclose(b2.overlap, b3.overlap, atol=1e-6)

    b3.prune_datapoints([0, 2])
    assert len(b3.rerun_states) == 2 and len(b3.ens) == 2
    assert b3.overlap.shape == (2, 2)
