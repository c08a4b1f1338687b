"""GAP/SOAP baseline tests (the dscribe + GP replacement)."""

import numpy as np
import pytest

from evcont_tpu.baselines.gap import GAPModel, soap_descriptors
from evcont_tpu.workloads.common import h_chain

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def test_soap_invariances():
    rng = np.random.default_rng(0)
    c = np.asarray(h_chain(4, 1.7).coords) + 0.1 * rng.standard_normal((4, 3))
    # rotation
    th = 0.6
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]])
    p1 = np.array(soap_descriptors(c))
    p2 = np.array(soap_descriptors(c @ R.T))
    np.testing.assert_allclose(p1, p2, atol=1e-12)
    # translation
    p3 = np.array(soap_descriptors(c + np.array([1.0, -2.0, 0.5])))
    np.testing.assert_allclose(p1, p3, atol=1e-12)
    # permutation of identical atoms permutes rows only
    perm = [2, 0, 3, 1]
    p4 = np.array(soap_descriptors(c[perm]))
    np.testing.assert_allclose(p1[perm], p4, atol=1e-12)


def test_gap_interpolation_and_forces():
    # smooth synthetic PES (Morse-like in the chain spacing)
    ds = np.linspace(1.2, 2.8, 7)

    def energy(d):
        return (1.0 - np.exp(-1.2 * (d - 1.8))) ** 2 - 2.0

    coords_list = [np.asarray(h_chain(4, d).coords) for d in ds]
    ens = [energy(d) for d in ds]
    gap = GAPModel(rcut=8.0, nmax=5, sigma=0.7).fit(coords_list, ens)
    # near-interpolation at training points
    for c, e in zip(coords_list, ens):
        assert abs(gap.predict(c) - e) < 1e-4
    # interpolation between points + finite forces
    e_mid, F = gap.predict_with_forces(np.asarray(h_chain(4, 2.0).coords))
    assert abs(e_mid - energy(2.0)) < 5e-3
    assert np.all(np.isfinite(F))
    # forces vs finite difference
    c0 = np.asarray(h_chain(4, 1.9).coords)
    _, F0 = gap.predict_with_forces(c0)
    eps = 1e-5
    cp, cm = c0.copy(), c0.copy()
    cp[1, 0] += eps
    cm[1, 0] -= eps
    fd = -(gap.predict(cp) - gap.predict(cm)) / (2 * eps)
    assert abs(F0[1, 0] - fd) < 1e-6
