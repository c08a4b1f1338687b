"""Device cached-environment t-RDM sweep vs the numpy sweep (and the
string oracle) — solvers/dmrg_trdm_device.py must be an exact twin."""

import numpy as np
import pytest

from evcont_tpu.solvers.dmrg import (_sweep_all_elements,
                                     mps_transition_rdm12)
from evcont_tpu.solvers.dmrg_trdm_device import _sweep_all_elements_device

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def _rand_mps(n, m, seed):
    rng = np.random.default_rng(seed)
    mps, Dl = [], 1
    for i in range(n):
        Dr = min(m, 2 ** min(i + 1, n - i - 1))
        mps.append(rng.standard_normal((Dl, 2, Dr)) / np.sqrt(Dl * Dr))
        Dl = Dr
    for i in range(n - 1):
        A = mps[i]
        a, d, b = A.shape
        Q, R = np.linalg.qr(A.reshape(a * d, b))
        mps[i] = Q.reshape(a, d, -1)
        mps[i + 1] = np.einsum("ab,bxc->axc", R, mps[i + 1])
    mps[-1] /= np.linalg.norm(mps[-1])
    return mps


@pytest.mark.parametrize("norb,m", [(4, 6), (6, 8)])
def test_device_sweep_matches_numpy(norb, m):
    A = _rand_mps(2 * norb, m, 0)
    B = _rand_mps(2 * norb, m, 1)
    k_np, v_np = _sweep_all_elements(A, B)
    k_dev, v_dev = _sweep_all_elements_device(A, B)
    np.testing.assert_array_equal(k_np, k_dev)
    np.testing.assert_allclose(v_dev, v_np, atol=1e-13)


def test_fully_device_backend_matches_dense():
    """DMRGBackend(device=True, trdm_method="mps"): sweeps AND t-RDM
    extraction on the accelerator must reproduce the dense-CI store."""
    from evcont_tpu.backends.dmrg_backend import DMRGBackend
    from evcont_tpu.molecule import Molecule

    def chain(d):
        return Molecule.build([("H", (0.0, 0.0, d * i)) for i in range(4)],
                              basis="sto-6g", unit="Bohr")

    dev = DMRGBackend(bond_dims=(8, 16), sweeps_per_dim=4,
                      trdm_method="mps", device=True)
    ref = DMRGBackend(bond_dims=(8, 16), sweeps_per_dim=4,
                      trdm_method="dense")
    for d in (1.6, 2.0):
        dev.append_to_rdms(chain(d))
        ref.append_to_rdms(chain(d))
    np.testing.assert_allclose(dev.ens, ref.ens, atol=1e-6)
    # t-RDM stores agree up to state-sign gauge: compare |.| since the
    # two solvers may converge states of opposite global sign
    np.testing.assert_allclose(np.abs(dev.overlap), np.abs(ref.overlap),
                               atol=1e-6)
    np.testing.assert_allclose(np.abs(dev.one_rdm), np.abs(ref.one_rdm),
                               atol=1e-5)


def test_device_rdm12_matches_sweep_and_strings():
    norb, m = 5, 8
    A = _rand_mps(2 * norb, m, 3)
    B = _rand_mps(2 * norb, m, 4)
    r1_s, r2_s = mps_transition_rdm12(A, B, norb, method="strings")
    r1_d, r2_d = mps_transition_rdm12(A, B, norb, method="sweep-device")
    np.testing.assert_allclose(r1_d, r1_s, atol=1e-12)
    np.testing.assert_allclose(r2_d, r2_s, atol=1e-12)


def test_multi_ket_sweep_matches_single():
    """The multi-ket batched sweep (one jitted site step serving every
    stored state — the active-learning append shape) must reproduce the
    single-pair device sweep and the strings oracle exactly, across
    chunk boundaries."""
    from evcont_tpu.solvers.dmrg import (mps_transition_rdm12,
                                         mps_transition_rdm12_multi)

    norb = 4
    # ragged bond dims across kets (the padding path must stay exact)
    bra = _rand_mps(2 * norb, 8, 0)
    kets = [_rand_mps(2 * norb, m, seed)
            for m, seed in [(6, 1), (8, 2), (4, 3)]]
    multi = mps_transition_rdm12_multi(bra, kets, norb,
                                       method="sweep-device", chunk=2)
    assert len(multi) == 3
    for (r1m, r2m), ket in zip(multi, kets):
        r1s, r2s = mps_transition_rdm12(bra, ket, norb,
                                        method="sweep-device")
        np.testing.assert_allclose(r1m, r1s, atol=1e-12)
        np.testing.assert_allclose(r2m, r2s, atol=1e-12)
        r1o, r2o = mps_transition_rdm12(bra, ket, norb, method="strings")
        np.testing.assert_allclose(r1m, r1o, atol=1e-10)
        np.testing.assert_allclose(r2m, r2o, atol=1e-10)
