"""Device-resident (jitted) DMRG sweep tests, pinned against the numpy
solver and exact FCI."""

import numpy as np
import pytest

from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.molecule import Molecule
from evcont_tpu.oao import loewdin_trafo, transform_integrals
from evcont_tpu.solvers.dmrg import (
    build_hamiltonian_mpo_fast, mpo_add, mpo_compress, mpo_expectation,
    number_penalty_mpo, _hf_product_mps)
from evcont_tpu.solvers.dmrg_jax import DeviceDMRG, dmrg_ground_state_device
from evcont_tpu.solvers.fci import FCISolver

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def _ints(natoms, d=1.6):
    mol = Molecule.build([("H", (0, 0, d * i)) for i in range(natoms)],
                         basis="sto-3g")
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = [np.array(x) for x in transform_integrals(
        np.array(b.hcore), np.array(b.eri), trafo)]
    return h1, h2


def test_padded_expectation_matches_numpy():
    """Zero padding is exact: device expectation == ragged numpy
    expectation for the HF product state."""
    h1, h2 = _ints(2)
    n_sites = 4
    W = build_hamiltonian_mpo_fast(h1, h2)
    mps = _hf_product_mps(n_sites, 2, 0.0)
    solver = DeviceDMRG(W, n_sites, m=8, mps0=mps)
    e_dev = solver.expectation(W)
    e_np = mpo_expectation(mps, W)
    assert abs(e_dev - e_np) < 1e-10


def test_device_sweep_reaches_fci_h2():
    h1, h2 = _ints(2)
    e_fci = FCISolver(2, 2).kernel(h1, h2)[0]
    e, _mps = dmrg_ground_state_device(h1, h2, 2, bond_dims=(4, 8),
                                       sweeps_per_dim=3, noise=1e-4)
    assert abs(e - e_fci) < 1e-8


def test_device_sweep_reaches_fci_h4():
    h1, h2 = _ints(4)
    e_fci = FCISolver(4, 4).kernel(h1, h2)[0]
    e, mps = dmrg_ground_state_device(h1, h2, 4, bond_dims=(8, 16),
                                      sweeps_per_dim=3, noise=1e-4)
    assert abs(e - e_fci) < 1e-7
    # the returned ragged MPS is consumable by the numpy t-RDM machinery
    W = build_hamiltonian_mpo_fast(h1, h2)
    assert abs(mpo_expectation(mps, W) - e) < 1e-9


def test_device_sweep_open_shell_doublet():
    """Odd-electron sector (H3 doublet, sz = 1/2): the device sweeps must
    land on exact FCI for nelec = (2, 1). (A noiseless numpy sweep from
    the product start gets stuck in this sector — the Lanczos solver's
    Krylov exploration is what escapes; this pins the device behavior to
    the exact answer rather than to the stuck trajectory.)"""
    h1, h2 = _ints(3)
    e_fci = FCISolver(3, (2, 1)).kernel(h1, h2)[0]
    n_sites = 6
    W_ham = build_hamiltonian_mpo_fast(h1, h2)
    W_pen = number_penalty_mpo(n_sites, 3, 0.5, lam=8.0)
    W = mpo_compress(mpo_add(W_ham, W_pen))
    dev = DeviceDMRG(W, n_sites, m=8, n_elec=3, sz=0.5)
    for s in range(3):
        dev.sweep(noise=0.0, k=24, seed=s)
    e_dev = mpo_expectation(dev.mps(), W_ham)
    assert abs(e_dev - e_fci) < 1e-8


def test_converge_dmrg_device(tmp_path):
    """The schedule-parity driver with device=True: same ladder/noise/
    logging/restart semantics, sweeps on the jitted kernel."""
    from evcont_tpu.solvers.dmrg import converge_dmrg

    h1, h2 = _ints(2)
    e_fci = FCISolver(2, 2).kernel(h1, h2)[0]
    mps, e = converge_dmrg(
        h1, h2, 2, "dev0", bond_dim_schedule=np.array([4, 8, 8]),
        tolerance=1e-9, workdir=str(tmp_path), device=True)
    assert abs(e - e_fci) < 1e-7
    log = (tmp_path / "DMRG_result_dev0.txt").read_text().strip()
    assert len(log.splitlines()) >= 2          # per-rung rows written
    assert (tmp_path / "dev0-mps.npz").exists()  # restart bundle saved


def test_f32_device_sweeps_plus_f64_host_polish():
    """The TPU-native accuracy split for production bond dims: f32 device
    sweeps carry the m-ladder (on TPU they floor at ~1e-5 relative — the
    f32 local-Lanczos limit, measured at H30/m=256 in RESULTS round 5),
    then host_polish_f64 runs noiseless f64 host sweeps from the warm
    state. At H4 toy scale the f32 state is already near-exact (the
    host-f64 expectation squares the state error away), so the floor is
    emulated by an under-converged noisy f32 solve; one warm-started
    polish sweep must recover FCI to 1e-8."""
    import jax.numpy as jnp
    from evcont_tpu.solvers.dmrg_jax import host_polish_f64

    h1, h2 = _ints(4)
    e_fci = FCISolver(4, 4).kernel(h1, h2)[0]
    # under-converged f32 device state: one noisy sweep at m=8 only
    e32, mps = dmrg_ground_state_device(
        h1, h2, 4, bond_dims=(8,), sweeps_per_dim=1, noise=1e-2,
        dtype=jnp.float32)
    err32 = abs(e32 - e_fci)
    assert err32 > 1e-8          # visibly unconverged warm state

    W_ham = build_hamiltonian_mpo_fast(h1, h2)
    W_pen = number_penalty_mpo(8, 4, 0.0, lam=8.0)
    W = mpo_compress(mpo_add(W_ham, W_pen))
    host_polish_f64(mps, W, 16, sweeps=2)
    e64 = mpo_expectation(mps, W_ham)
    assert abs(e64 - e_fci) < 1e-8
    # integrated path: fully f32-converged ladder + one f64 polish sweep
    e_int, _ = dmrg_ground_state_device(
        h1, h2, 4, bond_dims=(8, 16), sweeps_per_dim=3, noise=1e-4,
        dtype=jnp.float32, final_f64_sweeps=1)
    assert abs(e_int - e_fci) < 1e-8
