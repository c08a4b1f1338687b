"""CASCI solver / CI-transform / localization / CASCI-backend tests."""

import numpy as np
import pytest

from evcont_tpu.molecule import Molecule
from evcont_tpu.integrals.engine import IntegralEngine
from evcont_tpu.oao import loewdin_trafo, transform_integrals
from evcont_tpu.solvers.fci import FCISolver
from evcont_tpu.solvers.ci_transform import transform_ci
from evcont_tpu.solvers.casci import casci, embed_cas_civec
from evcont_tpu.solvers.localization import get_basis

pytestmark = pytest.mark.slow  # multi-minute fixture; core run: -m 'not slow'



def h4(d):
    return Molecule.build([("H", (0, 0, d * i)) for i in range(4)],
                          basis="sto-3g")


@pytest.fixture(scope="module")
def ints():
    mol = h4(1.7)
    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    return mol, eng, np.array(b.ovlp), np.array(b.hcore), np.array(b.eri), \
        float(b.enuc)


def test_transform_ci_between_bases(ints):
    """FCI state solved in canonical MOs, rotated to OAO, must coincide
    with the state solved directly in OAO (up to phase) — the machinery
    replacing pyscf's transform_ci (FCI_EVCont.py:79-85)."""
    mol, eng, S, h, g, enuc = ints
    oao = np.array(loewdin_trafo(S))
    can = get_basis(eng, mol.coords, "canonical")
    h1c, h2c = [np.array(x) for x in transform_integrals(h, g, can)]
    h1o, h2o = [np.array(x) for x in transform_integrals(h, g, oao)]
    solver = FCISolver(4, 4)
    ec, vc = solver.kernel(h1c, h2c)
    eo, vo = solver.kernel(h1o, h2o)
    assert abs(ec - eo) < 1e-10
    u = can.T @ S @ oao
    v_trans = transform_ci(vc, (2, 2), u)
    assert abs(abs(np.vdot(v_trans, vo)) - 1.0) < 1e-9
    assert abs(np.linalg.norm(v_trans) - 1.0) < 1e-9


def test_casci_full_space_equals_fci(ints):
    mol, eng, S, h, g, enuc = ints
    oao = np.array(loewdin_trafo(S))
    h1o, h2o = [np.array(x) for x in transform_integrals(h, g, oao)]
    e_fci, _ = FCISolver(4, 4).kernel(h1o, h2o)
    res = casci(S, h, g, enuc, 4, 4, 4)
    assert abs(res.e_tot - (e_fci + enuc)) < 1e-9


def test_casci_variational(ints):
    mol, eng, S, h, g, enuc = ints
    oao = np.array(loewdin_trafo(S))
    h1o, h2o = [np.array(x) for x in transform_integrals(h, g, oao)]
    e_fci, _ = FCISolver(4, 4).kernel(h1o, h2o)
    res = casci(S, h, g, enuc, 4, 2, 2)
    assert res.e_tot >= e_fci + enuc - 1e-10


def test_embed_cas_energy(ints):
    """Embedded full-space CAS vector must reproduce the CASCI energy via
    full-space RDM contraction."""
    mol, eng, S, h, g, enuc = ints
    res = casci(S, h, g, enuc, 4, 2, 2)
    ci_full = embed_cas_civec(res.ci, 4, res.ncore, res.ncas, (2, 2))
    can = res.mo_coeff
    h1c, h2c = [np.array(x) for x in transform_integrals(h, g, can)]
    solver = FCISolver(4, 4, spin=None)
    r1, r2 = solver.trans_rdm12(ci_full, ci_full)
    e = solver.energy_from_rdms(h1c, h2c, r1, r2) + enuc
    assert abs(e - res.e_tot) < 1e-9


def test_casci_backend_continuation():
    from evcont_tpu.backends.casci_backend import CASCIBackend
    from evcont_tpu.model import ContinuationModel

    be = CASCIBackend(ncas=2, nelecas=2)
    for d in [1.4, 1.8, 2.4]:
        be.append_to_rdms(h4(d))
    model = ContinuationModel.from_backend(h4(1.8), be)
    for i, d in enumerate([1.4, 1.8, 2.4]):
        e = float(model.potential(h4(d).coords))
        # CASCI training states are approximate, so the multi-geometry
        # subspace can lower the energy below the single-point CASCI —
        # but only by a small variational margin
        assert e <= be.ens[i] + 1e-9
        assert abs(e - be.ens[i]) < 5e-3


def test_split_basis_orthonormal(ints):
    mol, eng, S, h, g, enuc = ints
    sp = get_basis(eng, mol.coords, "split")
    np.testing.assert_allclose(sp.T @ S @ sp, np.eye(4), atol=1e-10)
