"""Zundel reference-dynamics baselines (reference:
scripts/MD/Zundel_thermodynamics/reference_dynamics/
Zundel_{CCSD,DFT_PBE,DFT_CAMB3LYP}.py and
scripts/MD/H2O-H3O+/md_H2O-H3O+_{CCSD,HF,DFT}.py):
NVT-Berendsen MD of the Zundel cation at 298.15 K with Maxwell-Boltzmann
initial velocities, driven by a reference electronic-structure method
instead of the continuation.

Forces:
  * method="hf": ANALYTIC forces (fixed-OAO-density Hellmann-Feynman —
    exact by SCF stationarity, see workloads/h10_pes.hf_energy_and_force).
  * method in {"pbe", "b3lyp", "camb3lyp"}: ANALYTIC forces by autodiff
    of the full KS energy at fixed OAO density (solvers/dft_force.py —
    includes Pulay and quadrature-grid response; the reference leans on
    pyscf's hand-coded RKS gradients here, Zundel_DFT_PBE.py).
  * method="ccsd": ANALYTIC forces from the autodiff CCSD Lagrangian
    (solvers/ccsd_grad.py — amplitude adjoint + z-vector orbital
    response, one reverse pass through the differentiable integral
    engine; matches the reference's pyscf lambda-equation gradients,
    md_H2O-H3O+_CCSD.py:60-75, at ~1/(6*natm) of the round-2
    central-difference cost per MD step).
"""

import argparse
import os
import time

import numpy as np

from ..integrals.engine import IntegralEngine
from .common import zundel
from .h10_pes import hf_energy_and_force


def _energy_fn(method, engine, mol):
    if method in ("pbe", "b3lyp", "camb3lyp"):
        from ..solvers.dft import rks

        def f(coords):
            return rks(engine, coords=np.asarray(coords), xc=method,
                       n_rad=40, angular=26).e_tot
        return f
    if method == "ccsd":
        from ..solvers.scf import rhf_from_engine
        from ..solvers.ccsd import ccsd
        from ..oao import transform_integrals

        def f(coords):
            coords = np.asarray(coords)
            hf = rhf_from_engine(engine, coords=coords)
            b = engine.compute_jit(coords)
            h1m, erim = transform_integrals(np.array(b.hcore),
                                            np.array(b.eri), hf.mo_coeff)
            ec, _ = ccsd(np.array(h1m), np.array(erim), sum(mol.nelec))
            return hf.e_tot + ec
        return f
    raise ValueError(method)


def energy_and_force(method, engine, mol, coords, eps=2e-3):
    if method == "hf":
        return hf_energy_and_force(engine, coords)
    if method in ("pbe", "b3lyp", "camb3lyp"):
        from ..solvers.dft_force import rks_energy_and_force
        e, F, _ = rks_energy_and_force(engine, np.asarray(coords),
                                       xc=method, n_rad=40, angular=26)
        return e, F
    if method == "ccsd":
        from ..solvers.ccsd_grad import ccsd_energy_and_gradient
        e, g, _ = ccsd_energy_and_gradient(engine, np.asarray(coords),
                                           nelec=sum(mol.nelec))
        return e, -g
    f = _energy_fn(method, engine, mol)
    e0 = f(coords)
    force = np.zeros_like(np.asarray(coords))
    c = np.asarray(coords)
    for a in range(c.shape[0]):
        for x in range(3):
            cp, cm = c.copy(), c.copy()
            cp[a, x] += eps
            cm[a, x] -= eps
            force[a, x] = -(f(cp) - f(cm)) / (2 * eps)
    return e0, force


def _method_density_ao(method, engine, mol, coords):
    """The method's one-particle density in the AO basis at a geometry
    (HF/B3LYP: SCF density; CCSD: adjoint-VJP Lambda response density)."""
    coords = np.asarray(coords, dtype=float)
    if method == "hf":
        from ..solvers.scf import rhf_from_engine
        return rhf_from_engine(engine, coords=coords).dm
    if method in ("pbe", "b3lyp", "camb3lyp"):
        from ..solvers.dft import rks
        return rks(engine, coords=coords, xc=method, n_rad=40,
                   angular=26).dm
    if method == "ccsd":
        from ..oao import transform_integrals
        from ..solvers.ccsd import ccsd_rdm1
        from ..solvers.scf import rhf_from_engine
        hf = rhf_from_engine(engine, coords=coords)
        b = engine.compute_jit(coords)
        h1m, erim = transform_integrals(np.array(b.hcore),
                                        np.array(b.eri), hf.mo_coeff)
        D_mo, _ = ccsd_rdm1(np.array(h1m), np.array(erim),
                            sum(mol.nelec))
        return hf.mo_coeff @ D_mo @ hf.mo_coeff.T
    raise ValueError(method)


def main(method="hf", steps=20, dt=25.0, T=298.15, taut=250.0, seed=0,
         workdir=".", observables=False):
    """Host-driven velocity-Verlet + Berendsen NVT (the reference method
    evaluations are host solvers, so the MD loop runs on host; the
    continuation MDs use the on-device scan in md/driver.py).

    observables=True records per-step dipole moments and Mulliken charges
    from the method's own density (reference: md_H2O-H3O+_{HF,DFT,CCSD}.py
    write dipole_moment_*.txt / atom_charges_*.txt alongside the MD)."""
    import jax
    from ..md.integrators import maxwell_boltzmann

    os.makedirs(workdir, exist_ok=True)
    mol = zundel(basis="6-31g")
    engine = IntegralEngine(mol)
    masses = np.asarray(mol.masses_au())
    c = np.asarray(mol.coords, dtype=np.float64)
    v = np.array(maxwell_boltzmann(jax.random.PRNGKey(seed), masses, T),
                 dtype=np.float64)

    kB = 3.166811563e-6  # Ha/K
    ndof = 3 * mol.natm
    traj, ens, dips, chgs = [], [], [], []
    e, F = energy_and_force(method, engine, mol, c)
    t_start = time.time()
    for step in range(steps):
        a = F / masses[:, None]
        v_half = v + 0.5 * dt * a
        c = c + dt * v_half
        e, F = energy_and_force(method, engine, mol, c)
        v = v_half + 0.5 * dt * (F / masses[:, None])
        # Berendsen rescale
        ekin = 0.5 * np.sum(masses[:, None] * v * v)
        T_now = 2.0 * ekin / (ndof * kB)
        lam = np.sqrt(max(1.0 + dt / taut * (T / max(T_now, 1e-12) - 1.0),
                          0.0))
        v = v * lam
        traj.append(c.copy())
        ens.append(e)
        if observables:
            from ..md.observables import dipole_moment, mulliken_charges
            from .zundel_energetics import _oao_density
            d_oao = _oao_density(engine, c,
                                 np.asarray(_method_density_ao(
                                     method, engine, mol, c)))
            dips.append(np.array(dipole_moment(engine, masses, c, d_oao)))
            chgs.append(np.array(mulliken_charges(engine, c, d_oao)))
        if (step + 1) % 5 == 0:
            print(f"[{method}] step {step + 1}/{steps} E={e:.6f} "
                  f"T={T_now:.0f}K ({(time.time() - t_start) / (step + 1):.1f}"
                  " s/step)", flush=True)

    traj = np.stack(traj)
    np.save(os.path.join(workdir, f"traj_{method}_seed{seed}.npy"), traj)
    np.savetxt(os.path.join(workdir, f"ens_{method}_seed{seed}.txt"),
               np.array(ens))
    if observables:
        tag = method.upper() if method != "b3lyp" else "DFT"
        np.savetxt(os.path.join(workdir, f"dipole_moment_{tag}.txt"),
                   np.array(dips))
        np.savetxt(os.path.join(workdir, f"atom_charges_{tag}.txt"),
                   np.array(chgs))
    return traj, np.array(ens)


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--method", default="hf",
                    choices=["hf", "pbe", "b3lyp", "camb3lyp", "ccsd"])
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--workdir", default=".")
    ap.add_argument("--observables", action="store_true",
                    help="record per-step dipole + Mulliken charges from "
                         "the method density")
    args = ap.parse_args()
    main(method=args.method, steps=args.steps, seed=args.seed,
         workdir=args.workdir, observables=args.observables)
