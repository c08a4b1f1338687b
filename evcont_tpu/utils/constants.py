"""Physical constants and unit conversions (CODATA 2018, matching common
quantum-chemistry conventions so artifacts are interoperable with the
reference pipeline's text/npy outputs).

Reference parity: pyscf.data.nist values used by BoothGroup/evcont
(e.g. AU2DEBYE in scripts/MD/Zundel_thermodynamics/continuation/
04_Zundel_continuation_MD.py:92).
"""

BOHR = 0.52917721092  # Angstrom per Bohr (pyscf's param.BOHR)
ANGSTROM_TO_BOHR = 1.0 / BOHR

AU2DEBYE = 2.541746  # electric dipole moment: a.u. -> Debye

# Boltzmann constant in Hartree / Kelvin
KB_HARTREE = 3.166811563e-6

# atomic mass unit in electron masses (a.u. of mass)
AMU_TO_AU = 1822.888486209

# a.u. of time in femtoseconds
AUT_TO_FS = 0.02418884326505

# Element symbols indexed by atomic number (1-based)
ELEMENTS = [
    "X", "H", "He", "Li", "Be", "B", "C", "N", "O", "F", "Ne",
    "Na", "Mg", "Al", "Si", "P", "S", "Cl", "Ar",
]

SYMBOL_TO_Z = {s: z for z, s in enumerate(ELEMENTS)}

# Isotope-averaged atomic masses in amu (matching pyscf.data.elements.MASSES
# for the elements exercised by the reference workloads: H chains, H2O, Zundel).
ATOMIC_MASSES = {
    1: 1.008,
    2: 4.002602,
    3: 6.94,
    4: 9.0121831,
    5: 10.81,
    6: 12.011,
    7: 14.007,
    8: 15.999,
    9: 18.998403163,
    10: 20.1797,
    11: 22.98976928,
    12: 24.305,
    13: 26.9815385,
    14: 28.085,
    15: 30.973761998,
    16: 32.06,
    17: 35.45,
    18: 39.948,
}
