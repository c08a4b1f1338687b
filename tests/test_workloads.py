"""Workload smoke tests at reduced scale (full configurations are run via
the module CLIs; see evcont_tpu/workloads/)."""

import numpy as np
import pytest

from evcont_tpu.workloads.common import water

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def test_h6_pes_workload(tmp_path):
    from evcont_tpu.workloads import h6_pes
    h6_pes.main(n_atoms=4, basis="sto-3g", n_test=6, workdir=str(tmp_path),
                with_references=True)
    pred = np.loadtxt(tmp_path / "predicted_surface_3_datapoints.txt")
    exact = np.loadtxt(tmp_path / "exact_surface.txt")
    hf = np.loadtxt(tmp_path / "HF_surface.txt")
    # 3-training-point continuation tracks FCI closely and beats HF
    assert np.abs(pred[:, 1] - exact[:, 1]).max() < 5e-3
    assert (np.abs(pred[:, 1] - exact[:, 1]).mean()
            < np.abs(hf[:, 1] - exact[:, 1]).mean())


def test_h6_excited_workload(tmp_path):
    from evcont_tpu.workloads import h6_excited
    h6_excited.main(n_atoms=4, n_test=4, nroots_reference=4,
                    nroots_predict=2, workdir=str(tmp_path))
    ms = np.loadtxt(tmp_path / "predicted_surface_multistate_0_1.txt")
    ex = np.loadtxt(tmp_path / "exact_surface_multistate.txt")
    # trained on roots {0,1}: both predicted roots close to exact
    assert np.abs(ms[:, 1] - ex[:, 1]).max() < 5e-3
    assert np.abs(ms[:, 2] - ex[:, 2]).max() < 5e-2


@pytest.fixture(scope="module")
def zundel_trained(tmp_path_factory):
    """Stages 1-3 of the Zundel pipeline (training-set selection, CAS
    solves, pair t-RDMs) on a reduced water system — shared between the
    stage-4/5 tests below, which only differ downstream."""
    from evcont_tpu.workloads import zundel_pipeline as zp
    mol = water("sto-3g")
    rng = np.random.default_rng(0)
    pool = np.asarray(mol.coords)[None] \
        + 0.08 * rng.standard_normal((12, mol.natm, 3))
    wd = str(tmp_path_factory.mktemp("zundel_pipeline"))
    n_train = 2
    zp.stage1_select_training_set(mol, [pool], n_train, workdir=wd)
    for i in range(n_train):
        zp.stage2_solve_training_state(mol, i, workdir=wd)
        for j in range(i + 1):
            zp.stage3_pair_trdm(mol, i, j, workdir=wd)
    return mol, wd, n_train


def test_zundel_pipeline_stages(zundel_trained):
    from evcont_tpu.workloads import zundel_pipeline as zp
    mol, wd, n_train = zundel_trained
    import pathlib
    tmp_path = pathlib.Path(wd)
    coords, dips, charges = zp.stage4_continuation_md(
        mol, n_train, seed=1, steps=5, dt=10.0, workdir=wd)
    assert coords.shape == (5, 3, 3)
    assert dips.shape == (5, 3)
    # Mulliken charges sum to the molecular charge (0)
    np.testing.assert_allclose(charges.sum(axis=1), 0.0, atol=1e-8)

    geoms = np.load(tmp_path / "trn_geometries.npy")
    res = zp.stage5_test_potential(mol, n_train, geoms, workdir=wd,
                                   subset_sizes=[n_train])
    assert np.all(np.isfinite(res[n_train]))

    # standalone observable evaluator must reproduce the in-scan
    # stage-4 observables on the same trajectory
    d2, q2 = zp.evaluate_observables(mol, n_train, coords, workdir=wd,
                                     chunk_size=3)
    np.testing.assert_allclose(d2, dips, atol=1e-9)
    np.testing.assert_allclose(q2, charges, atol=1e-9)


def test_h30_workload_restart_path(tmp_path):
    from evcont_tpu.workloads import h30_md
    coords, epot = h30_md.main(
        n_atoms=4, basis="sto-3g", d0=1.8, steps=5, dt=5.0,
        workdir=str(tmp_path), train_fci=True,
        train_dists=(1.4, 1.8, 2.4))
    assert coords.shape == (5, 4, 3)
    assert np.all(np.isfinite(epot))
    # restart: a second run reuses the saved artifacts without retraining
    coords2, _ = h30_md.main(
        n_atoms=4, basis="sto-3g", d0=1.8, steps=5, dt=5.0,
        workdir=str(tmp_path), train_fci=False)
    np.testing.assert_allclose(coords2, coords, atol=1e-10)


def test_zundel_zmatrix_geometry():
    """The Zundel geometry must reproduce the literature internal
    coordinates the reference builds from (construct_geometry.py)."""
    from evcont_tpu.workloads.common import zundel
    mol = zundel()
    assert mol.symbols == ("O", "H", "H", "H", "O", "H", "H")
    assert mol.charge == 1
    g = np.asarray(mol.coords) * 0.52917721092   # Bohr -> Angstrom
    O1, H1, H2, Hp, O2, H3, H4 = g
    assert abs(np.linalg.norm(O1 - Hp) - 1.1950) < 1e-10
    assert abs(np.linalg.norm(O2 - Hp) - 1.1950) < 1e-10
    assert abs(np.linalg.norm(O1 - H1) - 0.9686) < 1e-10
    assert abs(np.linalg.norm(O2 - H4) - 0.9682) < 1e-10
    v1, v2 = O1 - Hp, O2 - Hp
    ang = np.degrees(np.arccos(
        v1 @ v2 / np.linalg.norm(v1) / np.linalg.norm(v2)))
    assert abs(ang - 173.730) < 1e-6


def test_h10_workload_analytic_forces(tmp_path):
    """Downscaled H10 flow (H4 for FCI speed): analytic FCI and HF forces
    validated against finite differences, full workload artifacts written
    (reference: H10_continuation_3D_replacements.py)."""
    import numpy as np
    from evcont_tpu.workloads.h10_pes import (main, fci_energy_and_force,
                                              hf_energy_and_force)
    from evcont_tpu.workloads.common import h_chain
    from evcont_tpu.integrals.engine import IntegralEngine
    from evcont_tpu.solvers.fci import FCISolver

    base = h_chain(4, 1.78596, basis="sto-6g")
    eng = IntegralEngine(base)
    solver = FCISolver(4, base.nelec)
    rng = np.random.default_rng(3)
    c = np.asarray(base.coords) + 0.05 * rng.standard_normal((4, 3))

    e, f = fci_energy_and_force(eng, solver, c)
    e_hf, f_hf = hf_energy_and_force(eng, c)
    assert e < e_hf  # correlation
    # finite-difference check of both analytic forces
    eps = 1e-4
    for (force, efn) in [
            (f, lambda x: fci_energy_and_force(eng, solver, x)[0]),
            (f_hf, lambda x: hf_energy_and_force(eng, x)[0])]:
        d = rng.standard_normal(c.shape)
        d /= np.linalg.norm(d)
        fd = -(efn(c + eps * d) - efn(c - eps * d)) / (2 * eps)
        assert abs(np.sum(force * d) - fd) < 5e-6, (np.sum(force * d), fd)

    ens, forces = main(n_atoms=4, n_test=6, n_exact=3, workdir=str(tmp_path),
                       batch_size=3, gap_baseline=True)
    assert (tmp_path / "H10_predicted_energies_0.1.txt").exists()
    assert (tmp_path / "H10_FCI_gradients_0.1.txt").exists()
    tab = np.loadtxt(tmp_path / "H10_predicted_energies_0.1.txt")
    assert tab.shape == (3, 4)
    ferr = np.loadtxt(tmp_path / "continuation_force_error.txt")
    assert np.all(ferr < 0.2)


def test_zundel_reference_md_baselines(tmp_path):
    """Reference-dynamics baseline MDs (Zundel_{CCSD,DFT_*}.py parity):
    HF with analytic forces drives a short NVT; the correlated/DFT
    energy functions evaluate on the real cation."""
    from evcont_tpu.workloads.zundel_reference_md import (main, _energy_fn,
                                                          energy_and_force)
    from evcont_tpu.workloads.common import zundel
    from evcont_tpu.integrals.engine import IntegralEngine

    traj, ens = main(method="hf", steps=4, workdir=str(tmp_path))
    assert traj.shape == (4, 7, 3)
    assert np.all(np.isfinite(ens)) and np.all(ens < -150)

    mol = zundel(basis="6-31g")
    eng = IntegralEngine(mol)
    c = np.asarray(mol.coords)
    e_hf = _energy_fn("camb3lyp", eng, mol)
    e_cam = e_hf(c)
    assert np.isfinite(e_cam) and e_cam < -150
    e_cc = _energy_fn("ccsd", eng, mol)(c)
    ehf, _ = energy_and_force("hf", eng, mol, c)
    assert e_cc < ehf  # correlation lowers the energy


def test_zundel_stage4_ensemble(zundel_trained):
    """The vmapped multi-seed stage 4 must produce per-seed trajectories
    matching the single-seed driver's dynamics shape-wise and starting
    from the same Maxwell-Boltzmann draws."""
    from evcont_tpu.workloads import zundel_pipeline as zp
    mol, wd, _ = zundel_trained
    out = zp.stage4_continuation_md_ensemble(
        mol, 2, seeds=(3, 4), steps=7, dt=10.0, workdir=wd, chunk_steps=4)
    assert out["coords"].shape == (2, 7, 3, 3)
    assert np.all(np.isfinite(out["epot"]))
    # seeds differ (independent Maxwell-Boltzmann draws)
    assert np.abs(out["coords"][0] - out["coords"][1]).max() > 1e-6


def test_zundel_al_smoke_resume_and_replay(tmp_path):
    """On-the-fly Zundel AL (zundel_al.py) at toy scale: fresh run, then
    the two crash-recovery branches — resume from the worker snapshot,
    and the legacy replay of training geometries when only the store
    artifacts survive (the branch that recovered the production run)."""
    import os
    from evcont_tpu.workloads import zundel_al

    wd = str(tmp_path)
    kw = dict(workdir=wd, basis="sto-3g", ncas=4, nelecas=2,
              steps=6, dt=10.0)
    zundel_al.run(max_iterations=1, **kw)
    assert (tmp_path / "traj_EVCont_0.npy").exists()
    assert (tmp_path / "solver_state.pkl").exists()
    tt = np.loadtxt(tmp_path / "trn_times.txt").reshape(-1)
    assert len(tt) >= 1

    # resume from the snapshot and run one more iteration
    traj = zundel_al.run(max_iterations=2, **kw)
    assert np.all(np.isfinite(traj))
    assert (tmp_path / "en_diff_1.txt").exists()

    # legacy-checkpoint replay: drop the snapshot, keep the store
    os.remove(tmp_path / "solver_state.pkl")
    traj = zundel_al.run(max_iterations=2, **kw)
    assert np.all(np.isfinite(traj))
    assert (tmp_path / "solver_state.pkl").exists()


def test_h30_al_smoke_and_resume(tmp_path):
    """On-the-fly H-chain AL from the in-framework DMRG backend
    (h30_al.py) at toy scale, plus resume from the per-append snapshot."""
    from evcont_tpu.workloads import h30_al

    wd = str(tmp_path)
    kw = dict(workdir=wd, n_atoms=4, d0=1.8, steps=6, dt=10.0,
              bond_dims=(8,))
    h30_al.run(max_iterations=1, **kw)
    assert (tmp_path / "solver_state.pkl").exists()
    assert (tmp_path / "traj_EVCont_0.npy").exists()

    traj = h30_al.run(max_iterations=2, **kw)
    assert np.all(np.isfinite(traj))
    assert (tmp_path / "en_diff_1.txt").exists()


def test_energetics_ccsdt_column(tmp_path):
    """The training-point energetics table's CCSD(T) column (VERDICT r3
    #6; reference 05_Zundel_test_potential_energy.py:182-210 compares
    against CCSD(T)): the column must equal RHF + CCSD(T) correlation
    from the solver, and lie below plain CCSD (triples lower the
    energy)."""
    from evcont_tpu.integrals.engine import IntegralEngine
    from evcont_tpu.solvers.ccsd import ccsd
    from evcont_tpu.solvers.scf import rhf_from_engine
    from evcont_tpu.oao import transform_integrals
    from evcont_tpu.workloads.zundel_energetics import (
        evaluate_energetics_training_points)

    mol = water("sto-3g")
    eng = IntegralEngine(mol)
    nao = eng.nao
    c0 = np.asarray(mol.coords)
    # minimal converge_EVCont_MD-style workdir: one training point
    np.savetxt(tmp_path / "trn_times.txt", [0])
    np.save(tmp_path / "traj_EVCont_0.npy", c0[None])
    np.save(tmp_path / "overlap.npy", np.eye(1))
    np.save(tmp_path / "one_rdm.npy", np.zeros((1, nao, nao)))
    np.save(tmp_path / "two_rdm.npy",
            np.zeros((1, nao * nao * (nao * nao + 1) // 2)))

    out = evaluate_energetics_training_points(
        mol, workdir=str(tmp_path), methods=("ccsd", "ccsdt", "hf"))
    (conv_t, e_t), = out["ccsdt"]
    (conv_c, e_c), = out["ccsd"]
    assert np.isfinite(e_t) and conv_t == e_t
    assert e_t < e_c  # (T) lowers the energy
    assert (tmp_path / "energies_trn_points_CCSD_T.txt").exists()

    hf = rhf_from_engine(eng, coords=c0)
    b = eng.compute_jit(c0)
    h1m, erim = transform_integrals(np.array(b.hcore), np.array(b.eri),
                                    hf.mo_coeff)
    ec, et_corr, _ = ccsd(np.array(h1m), np.array(erim), sum(mol.nelec),
                          with_triples=True)
    assert abs(e_t - (hf.e_tot + ec + et_corr)) < 1e-10
