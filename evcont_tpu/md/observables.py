"""Physics observables from the predicted one-body RDM.

Reference parity: the Zundel MD computes dipole moments (center-of-mass
gauge) and Mulliken charges from the continuation's predicted 1-RDM pushed
through the scanner side channel (MD_utils.py:31-52,
scripts/MD/Zundel_thermodynamics/continuation/04_Zundel_continuation_MD.py:
71-92, 140-159). Here they are pure jittable functions of (coords,
rdm1_oao) suitable for use inside the MD scan or vmapped over stored
trajectories."""

import jax.numpy as jnp
import numpy as np

from ..oao import loewdin_trafo
from ..utils.constants import AU2DEBYE


def ao_atom_map(engine):
    """Static map AO index -> atom index (in the engine's user-facing AO
    layout: spherical when d shells are present)."""
    m = np.zeros(engine.nao, dtype=np.int32)
    spherical = getattr(engine, "_sph_q", None) is not None
    for sh in engine.structure.shells:
        if spherical:
            m[sh.sph_start:sh.sph_start + sh.nsph] = sh.atom
        else:
            m[sh.ao_start:sh.ao_start + sh.ncart] = sh.atom
    return m


def center_of_mass(masses, coords):
    masses = jnp.asarray(masses)
    return jnp.sum(masses[:, None] * coords, axis=0) / jnp.sum(masses)


def rdm1_oao_to_ao(engine, coords, rdm1_oao):
    """Density matrix in the AO basis: D_AO = T rdm1_OAO T^T with
    T = S^(-1/2) (OAO orbital a = sum_i T[i,a] chi_i)."""
    trafo = loewdin_trafo(engine.overlap(coords))
    return trafo @ rdm1_oao @ trafo.T


def dipole_moment(engine, masses, coords, rdm1_oao, unit="Debye"):
    """Molecular dipole in the center-of-mass gauge from the predicted
    1-RDM (reference: dip_moment, 04_Zundel_continuation_MD.py:71-92)."""
    com = center_of_mass(masses, coords)
    dm_ao = rdm1_oao_to_ao(engine, coords, rdm1_oao)
    ao_dip = engine.dipole(coords, com)                 # (3, nao, nao)
    el_dip = jnp.einsum("xij,ji->x", ao_dip, dm_ao)
    Z = jnp.asarray(engine.charges)
    nucl_dip = jnp.einsum("i,ix->x", Z, coords - com)
    mol_dip = nucl_dip - el_dip
    if unit.upper() == "DEBYE":
        mol_dip = mol_dip * AU2DEBYE
    return mol_dip


def mulliken_charges(engine, coords, rdm1_oao):
    """Mulliken population charges q_A = Z_A - sum_{i in A} (D S)_ii
    (reference: mulliken part of the Zundel observable callback,
    04_Zundel_continuation_MD.py:140-159)."""
    dm_ao = rdm1_oao_to_ao(engine, coords, rdm1_oao)
    S = engine.overlap(coords)
    pop = jnp.diagonal(dm_ao @ S)
    amap = ao_atom_map(engine)
    per_atom = jnp.zeros(engine.natm).at[amap].add(pop)
    return jnp.asarray(engine.charges) - per_atom
