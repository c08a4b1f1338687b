"""Analytic (autodiff, fixed-OAO-density) Kohn-Sham forces vs central
finite differences of the numpy SCF (solvers/dft_force.py). Also guards
the displaced-geometry AO-center fix in dft_grid.eval_aos — FD through
rks() only agrees when the SCF evaluates AOs at the displaced centers."""

import numpy as np
import pytest

from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.molecule import Molecule
from evcont_tpu.solvers.dft import rks
from evcont_tpu.solvers.dft_force import rks_energy_and_force

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'


_GRID = dict(n_rad=30, angular=26)


@pytest.fixture(scope="module")
def h2():
    mol = Molecule.build([("H", (0.0, 0.0, 0.0)), ("H", (0.0, 0.0, 0.78))],
                         basis="sto-3g", unit="Angstrom")
    return mol, IntegralEngine(mol)


@pytest.mark.parametrize("xc", ["lda", "pbe", "b3lyp", "camb3lyp"])
def test_autodiff_force_matches_fd(h2, xc):
    mol, eng = h2
    c0 = np.asarray(mol.coords)
    e, F, res = rks_energy_and_force(eng, c0, xc=xc, **_GRID)
    assert res.converged
    # the differentiated expression must equal the SCF total energy
    assert abs(e - res.e_tot) < 1e-12
    # translational invariance of the full gradient (incl. grid response)
    assert np.abs(F.sum(axis=0)).max() < 1e-10
    eps = 2e-4
    cp = c0.copy()
    cp[1, 2] += eps
    cm = c0.copy()
    cm[1, 2] -= eps
    f_fd = -(rks(eng, cp, xc=xc, **_GRID).e_tot
             - rks(eng, cm, xc=xc, **_GRID).e_tot) / (2 * eps)
    assert abs(F[1, 2] - f_fd) < 5e-7


def test_scf_reuse_skips_resolve(h2):
    mol, eng = h2
    c0 = np.asarray(mol.coords)
    res = rks(eng, c0, xc="pbe", **_GRID)
    e, F, res2 = rks_energy_and_force(eng, c0, xc="pbe", scf_result=res,
                                      **_GRID)
    assert res2 is res
    assert abs(e - res.e_tot) < 1e-12
