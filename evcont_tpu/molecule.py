"""Molecule description.

Replaces the reference's use of `pyscf.gto.Mole` (e.g.
scripts/PES_H_chain/H6_PES/H6_continuation.py:22-35) with a light, immutable
host-side descriptor. The *static* structure (elements, basis, charge) is
fixed; nuclear coordinates are a plain array that flows through jitted code,
so a single compiled function serves every geometry of the same molecule.
"""

from dataclasses import dataclass, replace

import numpy as np

from .utils.constants import (
    ANGSTROM_TO_BOHR,
    ATOMIC_MASSES,
    AMU_TO_AU,
    SYMBOL_TO_Z,
)


@dataclass(frozen=True)
class Molecule:
    """Immutable molecular-structure descriptor.

    Attributes:
        symbols: element symbols, e.g. ("O", "H", "H").
        coords: nuclear coordinates in Bohr, shape (natm, 3). Stored as a
            numpy array on the host; device code receives coordinates as
            explicit function arguments.
        charge: total molecular charge.
        spin: 2S = nalpha - nbeta.
        basis: basis-set name resolved against evcont_tpu.basis_data.
    """

    symbols: tuple
    coords: np.ndarray
    charge: int = 0
    spin: int = 0
    basis: str = "sto-3g"

    @staticmethod
    def build(atoms, basis="sto-3g", charge=0, spin=0, unit="Bohr"):
        """Build a molecule from a list of (symbol, (x, y, z)) tuples.

        Mirrors pyscf's `mol.build(atom=..., basis=..., unit=...)` surface
        used throughout the reference scripts.
        """
        symbols = tuple(sym for sym, _ in atoms)
        coords = np.array([xyz for _, xyz in atoms], dtype=np.float64)
        if unit.lower().startswith("ang"):
            coords = coords * ANGSTROM_TO_BOHR
        return Molecule(symbols=symbols, coords=coords, charge=charge, spin=spin,
                        basis=basis)

    @property
    def natm(self):
        return len(self.symbols)

    @property
    def numbers(self):
        return np.array([SYMBOL_TO_Z[s] for s in self.symbols], dtype=np.int64)

    @property
    def nelectron(self):
        return int(self.numbers.sum()) - self.charge

    @property
    def nelec(self):
        """(nalpha, nbeta), matching pyscf's mol.nelec."""
        nel = self.nelectron
        nalpha = (nel + self.spin) // 2
        nbeta = nel - nalpha
        assert nalpha - nbeta == self.spin, (
            f"electron number {nel} inconsistent with spin {self.spin}")
        return (nalpha, nbeta)

    def masses_au(self):
        """Atomic masses in atomic units (electron masses)."""
        return np.array(
            [ATOMIC_MASSES[int(z)] * AMU_TO_AU for z in self.numbers])

    def set_geom(self, coords, unit="Bohr"):
        """Return a copy with new coordinates (pyscf's mol.set_geom_)."""
        coords = np.asarray(coords, dtype=np.float64).reshape(self.natm, 3)
        if unit.lower().startswith("ang"):
            coords = coords * ANGSTROM_TO_BOHR
        return replace(self, coords=coords)

    def copy(self):
        return self

    def energy_nuc(self):
        """Nuclear repulsion at the stored geometry (host-side convenience;
        the device-side differentiable version lives in integrals.engine)."""
        z = self.numbers.astype(np.float64)
        r = self.coords
        diff = r[:, None, :] - r[None, :, :]
        dist = np.sqrt((diff ** 2).sum(-1) + np.eye(self.natm))
        off = 1.0 - np.eye(self.natm)
        return float(0.5 * (z[:, None] * z[None, :] * off / dist).sum())
