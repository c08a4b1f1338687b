"""MD integrator and active-learning tests (small systems for CPU speed)."""

import os

import jax
import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.backends.fci_backend import FCIBackend
from evcont_tpu.model import ContinuationModel
from evcont_tpu.md.driver import get_trajectory
from evcont_tpu.md.integrators import (
    maxwell_boltzmann,
    temperature,
    kinetic_energy,
)
from evcont_tpu.md.observables import dipole_moment, mulliken_charges


def h2(d):
    return Molecule.build([("H", (0, 0, 0)), ("H", (0, 0, d))],
                          basis="sto-3g")


@pytest.fixture(scope="module")
def h2_model():
    backend = FCIBackend()
    for d in [1.2, 1.4, 1.8]:
        backend.append_to_rdms(h2(d))
    return ContinuationModel.from_backend(h2(1.4), backend)


def test_nve_energy_conservation(h2_model):
    coords, epot, ekin = get_trajectory(
        h2_model, init_coords=h2(1.6).coords, dt=5.0, steps=60)
    etot = epot + ekin
    assert np.abs(etot - etot[0]).max() < 1e-4
    assert coords.shape == (60, 2, 3)


def test_nve_artifact_files(h2_model, tmp_path):
    tf = open(tmp_path / "traj.xyz", "w")
    ef = open(tmp_path / "ens.xyz", "w")
    get_trajectory(h2_model, init_coords=h2(1.5).coords, dt=5.0, steps=5,
                   trajectory_output=tf, energy_output=ef)
    tf.close()
    ef.close()
    # reference active-learning loop parses column 1 as Epot
    # (MD_utils.py:207-209)
    ens = np.genfromtxt(tmp_path / "ens.xyz")
    assert ens.shape == (5, 4)
    assert np.all(ens[:, 1] < 0)
    lines = open(tmp_path / "traj.xyz").read().splitlines()
    assert lines[0].strip() == "2"
    assert len(lines) == 5 * 4


def test_energy_fn_with_store_matches_and_scans(h2_model):
    """The parametric energy fn (bench.py MD rung) must match the closure
    form and survive jit with the store as traced arguments — closing over
    a multi-GB store embeds it as compile-time constants, which broke the
    remote-compile RPC at the Zundel-84 scale (see model.py docstring)."""
    from evcont_tpu.md.integrators import run_nve

    c = np.asarray(h2(1.5).coords, dtype=h2_model.one_rdm.dtype)
    efn_s, store = h2_model.energy_fn_with_store()
    e_param = float(jax.jit(efn_s)(c, *store))
    e_closure = float(h2_model.energy_fn()(c))
    assert abs(e_param - e_closure) < 1e-10

    masses = h2_model.mol.masses_au().astype(c.dtype)

    def _run(cc, ov, r1, r2):
        return run_nve(lambda x: efn_s(x, ov, r1, r2), masses, cc,
                       None, c.dtype.type(5.0), 10)

    out = jax.jit(_run)(c, *store)
    epot = np.array(out["epot"])
    assert epot.shape == (10,)
    assert np.all(np.isfinite(epot))


def test_maxwell_boltzmann_temperature():
    masses = Molecule.build(
        [("O", (0, 0, 0))] * 8, basis="sto-3g").masses_au()
    key = jax.random.PRNGKey(3)
    keys = jax.random.split(key, 200)
    temps = [float(temperature(maxwell_boltzmann(k, masses, 300.0), masses))
             for k in keys]
    assert abs(np.mean(temps) - 300.0) < 15.0


def test_nvt_berendsen_thermalizes(h2_model):
    masses = h2(1.4).masses_au()
    v0 = np.array(maxwell_boltzmann(jax.random.PRNGKey(0), masses, 600.0))
    coords, epot, ekin = get_trajectory(
        h2_model, init_coords=h2(1.5).coords, dt=5.0, steps=80,
        init_veloc=v0, ensemble="nvt_berendsen", T=150.0, taut=100.0)
    # thermostat drags kinetic energy down from the hot start
    assert np.mean(ekin[-20:]) < np.mean(ekin[:5])


def test_observables(h2_model):
    """Dipole/Mulliken from the predicted 1-RDM. H2 is symmetric: dipole
    ~ 0 and charges ~ 0; the LiH-like asymmetric check uses displaced H2."""
    mol = h2(1.4)
    coords = np.asarray(mol.coords)
    _, _, rdm1, _ = h2_model.state(coords)
    dip = np.array(dipole_moment(h2_model.engine, mol.masses_au(), coords,
                                 rdm1))
    np.testing.assert_allclose(dip, 0.0, atol=1e-8)
    q = np.array(mulliken_charges(h2_model.engine, coords, rdm1))
    np.testing.assert_allclose(q, 0.0, atol=1e-8)
    assert abs(np.trace(np.array(rdm1)) - 2.0) < 1e-8


@pytest.mark.slow
def test_active_learning_converges(tmp_path):
    from evcont_tpu.learn.active import converge_EVCont_MD

    def h3p(d):
        xs = (np.arange(3) - 1.0) * d
        return Molecule.build([("H", (x, 0, 0)) for x in xs],
                              basis="sto-3g", charge=1)

    backend = FCIBackend()
    traj = converge_EVCont_MD(
        backend, h3p(1.8), steps=10, dt=5.0, convergence_thresh=2e-3,
        data_addition="farthest_point_ham", workdir=str(tmp_path))
    assert backend.ntrain >= 2
    assert traj.shape[0] == 10
    # reference artifact schema present
    for f in ["overlap.npy", "one_rdm.npy", "two_rdm.npy", "trn_times.txt",
              "traj_EVCont_0.npy", "ens_EVCont_0.xyz", "en_diff_0.txt"]:
        assert os.path.exists(tmp_path / f), f


def test_selection_criteria_smoke(h2_model):
    from evcont_tpu.learn import selection
    traj = np.stack([np.asarray(h2(d).coords) for d in np.linspace(1.2, 2.2, 7)])
    trn = [np.asarray(h2(1.4).coords)]
    i_fp = selection.select_farthest_point(trn, traj)
    assert i_fp == 6  # farthest from d=1.4 is d=2.2
    i_ham = selection.select_farthest_point_ham(h2_model.engine, trn, traj,
                                                chunk_size=4)
    assert i_ham == 6


def test_active_learning_resume(tmp_path):
    """Resume parity: converge_EVCont_MD continued from checkpoint
    artifacts must reuse stored trajectories and finish with the same
    training set as an uninterrupted run."""
    from evcont_tpu.learn.active import converge_EVCont_MD
    from evcont_tpu.learn.checkpoints import load_state
    from evcont_tpu.backends.trdm_ingest import TRDMIngestBackend

    def h3p(d):
        xs = (np.arange(3) - 1.0) * d
        return Molecule.build([("H", (x, 0, 0)) for x in xs],
                              basis="sto-3g", charge=1)

    wd = str(tmp_path)
    backend = FCIBackend()
    traj1 = converge_EVCont_MD(
        backend, h3p(1.8), steps=8, dt=5.0, convergence_thresh=2e-3,
        data_addition="farthest_point", workdir=wd)
    n_final = backend.ntrain

    # resume from the artifacts with an ingest backend: should converge
    # immediately (trajectories reused, no retraining possible/needed)
    overlap, one_rdm, two_rdm, trn_times = load_state(wd)
    resumed = TRDMIngestBackend()
    resumed.overlap, resumed.one_rdm, resumed.two_rdm = \
        overlap, one_rdm, two_rdm
    traj2 = converge_EVCont_MD(
        resumed, h3p(1.8), steps=8, dt=5.0, convergence_thresh=2e-3,
        data_addition="farthest_point", workdir=wd, trn_times=trn_times)
    assert resumed.ntrain == n_final
    np.testing.assert_allclose(traj2, traj1, atol=1e-10)


def test_subset_state_layouts():
    """_subset_state must agree between full (Ntrn,Ntrn,...) and
    pair-compressed layouts (regression: leave-one-out pruning mis-sliced
    pair-compressed stores with np.ix_, ADVICE r1 medium)."""
    from evcont_tpu.learn.active import _subset_state
    from evcont_tpu.continuation import to_pair_layout
    from evcont_tpu.oao import restore_exchange
    import jax.numpy as jnp

    backend = FCIBackend()
    for d in [1.2, 1.5, 1.9]:
        backend.append_to_rdms(h2(d))
    ov, r1, r2 = backend.overlap, backend.one_rdm, backend.two_rdm
    r1p, r2p = to_pair_layout(r1, r2)

    keep = [0, 2]
    ov_f, r1_f, r2_f = _subset_state(ov, r1, r2, keep)
    ov_p, r1_p, r2_p = _subset_state(ov, r1p, r2p, keep)
    np.testing.assert_allclose(ov_p, ov_f, atol=1e-14)

    # pair-compressed subset must reproduce the full-layout subset
    rows, cols = np.tril_indices(len(keep))
    np.testing.assert_allclose(r1_p, r1_f[rows, cols], atol=1e-14)
    norb = r1.shape[-1]
    for k, (a, b) in enumerate(zip(rows, cols)):
        dense = np.array(restore_exchange(jnp.asarray(r2_p[k]), norb))
        np.testing.assert_allclose(dense, r2_f[a, b], atol=1e-12)


def test_converge_with_pruning(tmp_path):
    """End-to-end active learning with leave-one-out pruning enabled
    (reference: MD_utils.py:279-305, 463-489)."""
    from evcont_tpu.learn.active import converge_EVCont_MD

    backend = FCIBackend()
    traj = converge_EVCont_MD(
        backend, h2(1.4), steps=10, dt=5.0, convergence_thresh=5e-3,
        prune_irrelevant_data=True, data_addition="farthest_point",
        max_iterations=4, workdir=str(tmp_path))
    assert traj.shape == (10, 2, 3)
    # pruning writes suffixed checkpoints trn_times_{i}.txt
    tt_files = sorted(tmp_path.glob("trn_times_*.txt"),
                      key=lambda p: int(p.stem.split("_")[-1]))
    assert tt_files
    assert backend.ntrain >= 1


def test_chunked_trajectory_matches_single_scan(h2_model):
    """chunk_steps stitches (coords, veloc) across dispatches; the chunked
    trajectory must equal the single-scan one to roundoff."""
    from evcont_tpu.md.driver import get_trajectory
    import numpy as np

    c1, e1, k1 = get_trajectory(h2_model, dt=10.0, steps=7)
    c2, e2, k2 = get_trajectory(h2_model, dt=10.0, steps=7, chunk_steps=3)
    assert c2.shape == c1.shape
    assert np.abs(c1 - c2).max() < 1e-10
    assert np.abs(e1 - e2).max() < 1e-10


def test_nve_stateful_krylov_matches_eigh():
    """The warm-started Krylov MD scan (per-step eigensolve replaced by
    carried-vector Rayleigh-Ritz, Hellmann-Feynman forces) must
    reproduce the eigh-based NVE trajectory."""
    import jax
    from evcont_tpu.md.integrators import run_nve, run_nve_stateful

    backend = FCIBackend()
    for d in [1.2, 1.4, 1.8]:
        backend.append_to_rdms(h2(d))
    model = ContinuationModel.from_backend(h2(1.4), backend)
    masses = model.mol.masses_au()
    c0 = np.asarray(h2(1.6).coords)

    efn_s, store, _ = None, None, None
    efn, (ov, r1, r2) = model.energy_fn_with_store()
    ref = jax.jit(lambda c: run_nve(
        lambda x: efn(x, ov, r1, r2), masses, c, None, 5.0, 30))(c0)

    fK, (r1k, r2k), y0 = model.energy_fn_with_store_krylov(
        k=6, init_coords=c0)
    out = jax.jit(lambda c, y: run_nve_stateful(
        lambda x, s: fK(x, s, r1k, r2k), masses, c, None, 5.0, 30, y)
    )(c0, y0)

    np.testing.assert_allclose(np.array(out["epot"]),
                               np.array(ref["epot"]), atol=5e-9)
    np.testing.assert_allclose(np.array(out["coords"]),
                               np.array(ref["coords"]), atol=1e-7)

    # the custom-call-free small stage (serial-MD latency path on TPU)
    # must track the same trajectory
    fN, (r1n, r2n), y0n = model.energy_fn_with_store_krylov(
        k=4, small="nocall", init_coords=c0)
    outn = jax.jit(lambda c, y: run_nve_stateful(
        lambda x, s: fN(x, s, r1n, r2n), masses, c, None, 5.0, 30, y)
    )(c0, y0n)
    np.testing.assert_allclose(np.array(outn["epot"]),
                               np.array(ref["epot"]), atol=5e-9)
    np.testing.assert_allclose(np.array(outn["coords"]),
                               np.array(ref["coords"]), atol=1e-7)
