"""Config-driven runner: `python -m evcont_tpu.run config.json`.

The reference has no entry point beyond editing scripts (SURVEY.md §5);
this runs the standard flow — build molecule, train/ingest a backend, run
active-learning MD or a plain trajectory — from a RunConfig JSON file.
"""

import argparse
import os

import numpy as np

from .config import RunConfig


def run(cfg: RunConfig):
    from .learn.active import converge_EVCont_MD
    from .model import ContinuationModel
    from .md.driver import get_trajectory
    from .md.integrators import maxwell_boltzmann

    os.makedirs(cfg.workdir, exist_ok=True)
    cfg.to_json(os.path.join(cfg.workdir, "run_config.json"))
    mol = cfg.build_molecule()
    backend = cfg.build_backend()

    if cfg.solver.backend == "ingest":
        backend.load_state_files(cfg.workdir)
        model = ContinuationModel(mol, backend.overlap, backend.one_rdm,
                                  backend.two_rdm,
                                  hermitian=cfg.learn.hermitian)
        init_veloc = None
        if cfg.md.init_velocities == "maxwell_boltzmann":
            import jax
            init_veloc = np.array(maxwell_boltzmann(
                jax.random.PRNGKey(cfg.md.seed), mol.masses_au(),
                cfg.md.temperature))
        with open(os.path.join(cfg.workdir, "traj.xyz"), "w") as tf, \
                open(os.path.join(cfg.workdir, "ens.xyz"), "w") as ef:
            coords, epot, ekin = get_trajectory(
                model, dt=cfg.md.dt, steps=cfg.md.steps,
                init_veloc=init_veloc, ensemble=cfg.md.ensemble,
                T=cfg.md.temperature, taut=cfg.md.taut,
                trajectory_output=tf, energy_output=ef)
        np.save(os.path.join(cfg.workdir, "traj.npy"), coords)
        return coords

    return converge_EVCont_MD(
        backend, mol, steps=cfg.md.steps, dt=cfg.md.dt,
        convergence_thresh=cfg.learn.convergence_thresh,
        prune_irrelevant_data=cfg.learn.prune_irrelevant_data,
        data_addition=cfg.learn.data_addition,
        max_iterations=cfg.learn.max_iterations,
        workdir=cfg.workdir, hermitian=cfg.learn.hermitian)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("config", help="RunConfig JSON file")
    ap.add_argument("--print-config", action="store_true",
                    help="print the resolved config and exit")
    args = ap.parse_args(argv)
    cfg = RunConfig.from_json(args.config)
    if args.print_config:
        print(cfg.to_json())
        return
    run(cfg)


if __name__ == "__main__":
    main()
