"""Molecular-dynamics integrators as jitted lax.scan loops.

Replaces pyscf's host-side integrators used by the reference:
  * md.NVE (velocity Verlet)         — MD_utils.py:109-120
  * md.integrators.NVTBerendson      — 04_Zundel_continuation_MD.py:164-177
  * MaxwellBoltzmannVelocity         — 04_Zundel_continuation_MD.py:137

TPU-first design: the reference evaluates forces through a Python scanner
object every step (host round-trip per step through libcint + scipy). Here
the *entire trajectory* is one lax.scan whose body evaluates the jitted
continuation energy gradient on device — zero host involvement for any
number of steps. Multiple trajectories batch with vmap (ensemble MD).

Units: coordinates Bohr, time atomic units, masses in electron masses,
temperatures Kelvin.
"""

import jax
import jax.numpy as jnp

from ..utils.constants import KB_HARTREE


def kinetic_energy(veloc, masses):
    return 0.5 * jnp.sum(masses[:, None] * veloc * veloc)


def temperature(veloc, masses):
    """Instantaneous temperature with 3N degrees of freedom (matching
    pyscf.md's convention used by the reference workloads)."""
    ekin = kinetic_energy(veloc, masses)
    dof = 3 * veloc.shape[0]
    return 2.0 * ekin / (dof * KB_HARTREE)


def maxwell_boltzmann(key, masses, T):
    """Velocities drawn from the Maxwell-Boltzmann distribution at T (K),
    per-component sigma = sqrt(kB T / m)."""
    sigma = jnp.sqrt(KB_HARTREE * T / masses)
    return sigma[:, None] * jax.random.normal(key, (masses.shape[0], 3))


def _vv_step(energy_fn, masses, dt, aux_fn=None):
    """One velocity-Verlet step. Returns ((coords, veloc, forces), aux).
    aux_fn(coords) may compute per-step observables (dipole, charges, ...)
    inside the scan — the on-device replacement for the reference's MD
    callback side channel (MD_utils.py:31-52)."""
    inv_m = 1.0 / masses[:, None]

    def step(carry, _):
        coords, veloc, forces = carry
        veloc_half = veloc + 0.5 * dt * forces * inv_m
        coords_new = coords + dt * veloc_half
        e_new, g_new = jax.value_and_grad(energy_fn)(coords_new)
        forces_new = -g_new
        veloc_new = veloc_half + 0.5 * dt * forces_new * inv_m
        out = (coords_new, veloc_new, e_new)
        if aux_fn is not None:
            out = out + (aux_fn(coords_new),)
        return (coords_new, veloc_new, forces_new), out
    return step


def run_nve(energy_fn, masses, coords0, veloc0, dt, steps, aux_fn=None):
    """NVE velocity-Verlet trajectory, fully on device.

    Returns dict with per-step arrays: coords (steps, natm, 3), veloc,
    epot (steps,), ekin (steps,), plus "aux" when aux_fn is given. Step i
    holds the state *after* i+1 updates, matching the frames list of
    pyscf's NVE integrator."""
    masses = jnp.asarray(masses)
    coords0 = jnp.asarray(coords0)
    veloc0 = jnp.zeros_like(coords0) if veloc0 is None else jnp.asarray(veloc0)
    _, g0 = jax.value_and_grad(energy_fn)(coords0)
    step = _vv_step(energy_fn, masses, dt, aux_fn)
    (_, _, _), outs = jax.lax.scan(
        step, (coords0, veloc0, -g0), None, length=steps)
    coords, veloc, epot = outs[:3]
    ekin = jax.vmap(lambda v: kinetic_energy(v, masses))(veloc)
    res = {"coords": coords, "veloc": veloc, "epot": epot, "ekin": ekin}
    if aux_fn is not None:
        res["aux"] = outs[3]
    return res


def run_nve_stateful(energy_state_fn, masses, coords0, veloc0, dt, steps,
                     state0):
    """NVE velocity-Verlet with an auxiliary solver state carried through
    the scan: energy_state_fn(coords, state) -> (E, state_new). Force =
    -dE/dcoords with the state input held fixed (the state update runs
    under stop_gradient inside energy_state_fn — e.g. the warm-started
    Krylov ground-state refinement of
    ContinuationModel.energy_fn_with_store_krylov, whose Rayleigh-
    quotient energy makes that force generalized Hellmann-Feynman)."""
    masses = jnp.asarray(masses)
    coords0 = jnp.asarray(coords0)
    veloc0 = jnp.zeros_like(coords0) if veloc0 is None \
        else jnp.asarray(veloc0)
    inv_m = 1.0 / masses[:, None]

    def eval_ef(c, s):
        (e, s_new), g = jax.value_and_grad(
            energy_state_fn, has_aux=True)(c, s)
        return e, s_new, -g

    _, s0, f0 = eval_ef(coords0, state0)

    def step(carry, _):
        coords, veloc, forces, s = carry
        veloc_half = veloc + 0.5 * dt * forces * inv_m
        coords_new = coords + dt * veloc_half
        e_new, s_new, forces_new = eval_ef(coords_new, s)
        veloc_new = veloc_half + 0.5 * dt * forces_new * inv_m
        return (coords_new, veloc_new, forces_new, s_new), \
            (coords_new, veloc_new, e_new)

    _, outs = jax.lax.scan(step, (coords0, veloc0, f0, s0), None,
                           length=steps)
    coords, veloc, epot = outs
    ekin = jax.vmap(lambda v: kinetic_energy(v, masses))(veloc)
    return {"coords": coords, "veloc": veloc, "epot": epot, "ekin": ekin}


def run_nve_ensemble(energy_fn, masses, coords0_batch, veloc0_batch, dt,
                     steps):
    """Batch of independent NVE trajectories via vmap — the TPU-native
    replacement for the reference's job-array ensemble MD (one process per
    seed, 04_Zundel_continuation_MD.py:32). All trajectories advance in
    lockstep on device; the batch axis shards over the mesh's "data" axis.
    """
    return jax.vmap(
        lambda c, v: run_nve(energy_fn, masses, c, v, dt, steps)
    )(jnp.asarray(coords0_batch), jnp.asarray(veloc0_batch))


def run_nvt_ensemble(energy_fn, masses, coords0_batch, veloc0_batch, dt,
                     steps, T, taut):
    """Batch of independent NVT-Berendsen trajectories via vmap."""
    return jax.vmap(
        lambda c, v: run_nvt_berendsen(energy_fn, masses, c, v, dt, steps,
                                       T, taut)
    )(jnp.asarray(coords0_batch), jnp.asarray(veloc0_batch))


def run_nvt_berendsen(energy_fn, masses, coords0, veloc0, dt, steps,
                      T, taut, aux_fn=None):
    """NVT trajectory with a Berendsen thermostat: after each velocity-Verlet
    update, velocities are rescaled by sqrt(1 + dt/taut (T0/T_now - 1))
    (pyscf md.integrators.NVTBerendson semantics; taut in a.u. of time)."""
    masses = jnp.asarray(masses)
    coords0 = jnp.asarray(coords0)
    veloc0 = jnp.zeros_like(coords0) if veloc0 is None else jnp.asarray(veloc0)
    inv_m = 1.0 / masses[:, None]
    _, g0 = jax.value_and_grad(energy_fn)(coords0)

    def step(carry, _):
        coords, veloc, forces = carry
        veloc_half = veloc + 0.5 * dt * forces * inv_m
        coords_new = coords + dt * veloc_half
        e_new, g_new = jax.value_and_grad(energy_fn)(coords_new)
        forces_new = -g_new
        veloc_new = veloc_half + 0.5 * dt * forces_new * inv_m
        T_now = temperature(veloc_new, masses)
        lam = jnp.sqrt(1.0 + (dt / taut) * (T / jnp.maximum(T_now, 1e-12)
                                            - 1.0))
        veloc_new = veloc_new * lam
        out = (coords_new, veloc_new, e_new)
        if aux_fn is not None:
            out = out + (aux_fn(coords_new),)
        return (coords_new, veloc_new, forces_new), out

    (_, _, _), outs = jax.lax.scan(
        step, (coords0, veloc0, -g0), None, length=steps)
    coords, veloc, epot = outs[:3]
    ekin = jax.vmap(lambda v: kinetic_energy(v, masses))(veloc)
    res = {"coords": coords, "veloc": veloc, "epot": epot, "ekin": ekin}
    if aux_fn is not None:
        res["aux"] = outs[3]
    return res
