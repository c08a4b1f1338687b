"""Trajectory driver with reference-compatible artifacts.

Replaces get_trajectory (evcont/MD_utils.py:60-125): runs the jitted
on-device MD loop and writes the same text artifacts the reference produces
through pyscf's integrator callbacks — an .xyz trajectory file and an
energy file whose column 1 is the potential energy (the active-learning
loop parses it with np.genfromtxt(...)[:, 1], MD_utils.py:207-209)."""

import jax
import numpy as np

from ..utils.constants import BOHR
from .integrators import run_nve, run_nvt_berendsen


def write_xyz_frame(fh, symbols, coords_bohr, comment=""):
    fh.write(f"{len(symbols)}\n{comment}\n")
    for s, xyz in zip(symbols, np.asarray(coords_bohr) * BOHR):
        fh.write(f"{s:3s} {xyz[0]:20.12f} {xyz[1]:20.12f} {xyz[2]:20.12f}\n")


def write_energy_line(fh, time_au, epot, ekin):
    fh.write(f"{time_au:8.2f}  {epot:.12E}  {ekin:.12E}  {epot + ekin:.12E}\n")


def get_trajectory(model, init_coords=None, dt=10.0, steps=10,
                   init_veloc=None, ensemble="nve", T=298.15, taut=250.0,
                   trajectory_output=None, energy_output=None,
                   aux_fn=None, aux_out=None, chunk_steps=None):
    """Run an MD trajectory from a ContinuationModel.

    Mirrors the reference's get_trajectory signature (MD_utils.py:60-71) but
    executes the whole trajectory as one on-device scan. Returns the
    trajectory coordinates (steps, natm, 3) in Bohr.

    chunk_steps bounds the length of a single device dispatch: the scan
    runs in ceil(steps/chunk_steps) equal-length calls to ONE compiled
    program, stitching (coords, veloc) between calls (one redundant force
    evaluation per chunk). Use for very long production trajectories —
    bounded dispatches survive runtime hiccups that a single 10k-step
    dispatch may not, and give host-side progress.

    aux_fn(coords) — or aux_fn(coords, overlap, one_rdm, two_rdm) for
    observables that read the t-RDM store — computes per-step observables
    inside the scan (the on-device form of the reference's MD callbacks);
    results are returned through the aux_out dict under "aux".
    """
    import inspect

    mol = model.mol
    coords0 = np.asarray(mol.coords if init_coords is None else init_coords)
    masses = mol.masses_au()
    # the store enters jit as traced arguments (a multi-GB closure capture
    # would be embedded in the lowered program; see energy_fn_with_store)
    energy_fn, store = model.energy_fn_with_store()
    aux_takes_store = aux_fn is not None and \
        len(inspect.signature(aux_fn).parameters) == 4

    if chunk_steps is None or chunk_steps >= steps:
        n_chunks, chunk = 1, steps
    else:
        n_chunks = -(-steps // chunk_steps)
        chunk = chunk_steps

    def run_body(c, v, ov, r1, r2):
        efn = lambda cc: energy_fn(cc, ov, r1, r2)
        afn = None
        if aux_fn is not None:
            afn = (lambda cc: aux_fn(cc, ov, r1, r2)) if aux_takes_store \
                else aux_fn
        if ensemble == "nve":
            return run_nve(efn, masses, c, v, dt, chunk, aux_fn=afn)
        elif ensemble == "nvt_berendsen":
            return run_nvt_berendsen(efn, masses, c, v, dt, chunk, T,
                                     taut, aux_fn=afn)
        raise ValueError(f"unknown ensemble {ensemble!r}")

    run_jit = jax.jit(run_body)
    v0 = np.zeros_like(coords0) if init_veloc is None else np.asarray(init_veloc)
    c_cur, v_cur = coords0, v0
    chunks = []
    for _ in range(n_chunks):
        part = run_jit(c_cur, v_cur, *store)
        part = jax.tree_util.tree_map(np.array, part)
        chunks.append(part)
        c_cur, v_cur = part["coords"][-1], part["veloc"][-1]
    out = jax.tree_util.tree_map(
        lambda *xs: np.concatenate(xs)[:steps], *chunks) \
        if n_chunks > 1 else chunks[0]
    coords = np.array(out["coords"])
    epot = np.array(out["epot"])
    ekin = np.array(out["ekin"])
    if aux_fn is not None and aux_out is not None:
        aux_out["aux"] = jax.tree_util.tree_map(np.array, out["aux"])

    # failure detection (the reference's crash-and-restart model relies on
    # hard asserts in the solvers, SURVEY.md §5; here non-finite dynamics
    # are surfaced with the failing step index)
    bad = ~(np.isfinite(epot) & np.isfinite(coords).all(axis=(1, 2)))
    if bad.any():
        first = int(np.argmax(bad))
        raise FloatingPointError(
            f"MD produced non-finite state at step {first} "
            f"(epot={epot[first]}); check time step / training coverage")

    if trajectory_output is not None:
        for i in range(steps):
            write_xyz_frame(trajectory_output, mol.symbols, coords[i],
                            comment=f"MD Time {(i + 1) * dt:.2f}")
        trajectory_output.flush()
    if energy_output is not None:
        energy_output.write(
            "#   time          Epot                 Ekin                 "
            "Etot\n")
        for i in range(steps):
            write_energy_line(energy_output, (i + 1) * dt, epot[i], ekin[i])
        energy_output.flush()

    return coords, epot, ekin
