"""Shared helpers for the workload scripts."""

import numpy as np

from ..molecule import Molecule


def h_chain(n_atoms, dist, basis="sto-6g"):
    """Linear H chain centered at the origin (reference:
    scripts/PES_H_chain/H6_PES/H6_continuation.py:22-35)."""
    xs = (np.arange(n_atoms) - np.median(np.arange(n_atoms))) * dist
    return Molecule.build([("H", (x, 0.0, 0.0)) for x in xs], basis=basis)


def water(basis="sto-3g", r=0.9572, theta_deg=104.52):
    theta = np.deg2rad(theta_deg)
    atoms = [
        ("O", (0.0, 0.0, 0.0)),
        ("H", (r * np.sin(theta / 2), 0.0, r * np.cos(theta / 2))),
        ("H", (-r * np.sin(theta / 2), 0.0, r * np.cos(theta / 2))),
    ]
    return Molecule.build(atoms, basis=basis, unit="Angstrom")


def zundel(basis="6-31g"):
    """H5O2+ (Zundel cation) at the literature ground-state geometry,
    built from the same internal coordinates as the reference
    (scripts/MD/Zundel_thermodynamics/construct_geometry.py); atom order
    (O, H, H, H+, O, H, H) with the bridging proton at index 3."""
    from ..utils.zmatrix import zundel_geometry
    g = zundel_geometry()
    symbols = ["O", "H", "H", "H", "O", "H", "H"]
    atoms = [(s, tuple(x)) for s, x in zip(symbols, g)]
    return Molecule.build(atoms, basis=basis, charge=1, unit="Angstrom")


def exact_fci_energy(mol):
    """Direct FCI total energy at a geometry (host oracle)."""
    from ..integrals.engine import IntegralEngine
    from ..oao import loewdin_trafo, transform_integrals
    from ..solvers.fci import FCISolver

    eng = IntegralEngine(mol)
    b = eng.compute_jit(np.asarray(mol.coords))
    trafo = np.array(loewdin_trafo(b.ovlp))
    h1, h2 = transform_integrals(np.array(b.hcore), np.array(b.eri), trafo)
    e, vec = FCISolver(eng.nao, mol.nelec).kernel(np.array(h1), np.array(h2))
    return e + float(b.enuc), vec
