"""Configuration system.

The reference has no config system — every knob is a hard-coded script
constant or positional sys.argv (SURVEY.md §5: MD_utils.py:128-137,
converge_dmrg.py:10-22, scripts' argv). This module captures every knob
found there as typed dataclasses with JSON round-tripping, so workloads are
reproducible artifacts rather than edited scripts.
"""

import dataclasses
import json
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


@dataclass
class MoleculeConfig:
    atoms: List[Tuple[str, Tuple[float, float, float]]] = field(
        default_factory=list)
    basis: str = "sto-3g"
    charge: int = 0
    spin: int = 0
    unit: str = "Bohr"


@dataclass
class SolverConfig:
    """Training-state solver knobs (FCI_EVCont.py:15-48,
    CASCI_EVCont.py:94-127)."""
    backend: str = "fci"              # fci | casci | dmrg | ingest
    cibasis: str = "OAO"              # OAO | canonical | split
    nroots: int = 1
    roots_train: Optional[List[int]] = None
    spin_sector: Optional[str] = "singlet"
    ncas: Optional[int] = None        # casci
    nelecas: Optional[int] = None     # casci
    davidson_tol: float = 1e-10


@dataclass
class DMRGScheduleConfig:
    """Bond-dimension ladder for external DMRG jobs (converge_dmrg.py:15-22).
    Retained for pipeline parity: these parameters configure the solver jobs
    whose t-RDMs are ingested through the file interface."""
    bond_dim_base: float = 1.8
    bond_dim_min_exp: int = 6
    bond_dim_max_exp: int = 15
    noises: List[float] = field(
        default_factory=lambda: [1e-2, 1e-7, 0.0])
    noise_decay: float = 0.25
    max_sweeps_per_rung: int = 1000
    energy_tol: float = 1e-4
    # ladder cap for the in-framework host DMRG (the reference ladder runs
    # to 6,747 for block2 on a 100 GB cluster node, converge_dmrg.py:15;
    # uncapped rungs beyond this are for external-solver ingest jobs)
    max_bond_dim: int = 256

    def bond_dims(self):
        return [round(self.bond_dim_base ** k)
                for k in range(self.bond_dim_min_exp,
                               self.bond_dim_max_exp + 1)]


@dataclass
class MDConfig:
    """MD knobs (MD_utils.py:60-71, 04_Zundel_continuation_MD.py:67-68,
    164-177)."""
    steps: int = 100
    dt: float = 1.0
    ensemble: str = "nve"             # nve | nvt_berendsen
    temperature: float = 298.15
    taut: float = 250.0
    seed: int = 0
    init_velocities: str = "zero"     # zero | maxwell_boltzmann


@dataclass
class LearnConfig:
    """Active-learning knobs (MD_utils.py:128-137)."""
    convergence_thresh: float = 1.0e-3
    data_addition: str = "farthest_point_ham"
    prune_irrelevant_data: bool = False
    max_iterations: int = 100
    hermitian: bool = True


@dataclass
class RunConfig:
    molecule: MoleculeConfig = field(default_factory=MoleculeConfig)
    solver: SolverConfig = field(default_factory=SolverConfig)
    md: MDConfig = field(default_factory=MDConfig)
    learn: LearnConfig = field(default_factory=LearnConfig)
    dmrg: DMRGScheduleConfig = field(default_factory=DMRGScheduleConfig)
    workdir: str = "."

    def to_json(self, path=None):
        s = json.dumps(dataclasses.asdict(self), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s

    @classmethod
    def from_json(cls, path_or_str):
        try:
            data = json.loads(path_or_str)
        except (json.JSONDecodeError, ValueError):
            with open(path_or_str) as f:
                data = json.load(f)
        return cls(
            molecule=MoleculeConfig(**data.get("molecule", {})),
            solver=SolverConfig(**data.get("solver", {})),
            md=MDConfig(**data.get("md", {})),
            learn=LearnConfig(**data.get("learn", {})),
            dmrg=DMRGScheduleConfig(**data.get("dmrg", {})),
            workdir=data.get("workdir", "."),
        )

    def build_molecule(self):
        from .molecule import Molecule
        m = self.molecule
        return Molecule.build(
            [(s, tuple(x)) for s, x in m.atoms], basis=m.basis,
            charge=m.charge, spin=m.spin, unit=m.unit)

    def build_backend(self):
        s = self.solver
        if s.backend == "fci":
            from .backends.fci_backend import FCIBackend
            return FCIBackend(cibasis=s.cibasis, nroots=s.nroots,
                              roots_train=s.roots_train,
                              spin=s.spin_sector)
        if s.backend == "casci":
            from .backends.casci_backend import CASCIBackend
            return CASCIBackend(ncas=s.ncas, nelecas=s.nelecas)
        if s.backend == "dmrg":
            from .backends.dmrg_backend import DMRGBackend
            ladder = [d for d in self.dmrg.bond_dims()
                      if d <= self.dmrg.max_bond_dim] or [32]
            return DMRGBackend(bond_dims=tuple(ladder),
                               workdir=self.workdir,
                               tolerance=self.dmrg.energy_tol)
        if s.backend == "ingest":
            from .backends.trdm_ingest import TRDMIngestBackend
            return TRDMIngestBackend()
        raise ValueError(f"unknown backend {s.backend!r}")
