"""Checkpoint artifacts, schema-compatible with the reference.

The reference persists continuation state as overlap.npy / one_rdm.npy /
two_rdm.npy / trn_times.txt every iteration (MD_utils.py:178-184, 421-424)
and reconstructs backends from those files (md_H30_evcont_from_DMRG.py:
72-87). The same filenames and layouts are used here so artifacts
interoperate; a bundled .npz is offered as the native single-file format."""

import os

import numpy as np


def save_state(workdir, overlap, one_rdm, two_rdm, trn_times=None,
               suffix=""):
    sfx = f"_{suffix}" if suffix != "" else ""
    np.save(os.path.join(workdir, f"overlap{sfx}.npy"), overlap)
    np.save(os.path.join(workdir, f"one_rdm{sfx}.npy"), one_rdm)
    np.save(os.path.join(workdir, f"two_rdm{sfx}.npy"), two_rdm)
    if trn_times is not None:
        np.savetxt(os.path.join(workdir, f"trn_times{sfx}.txt"),
                   np.array(trn_times))


def load_state(workdir, suffix=""):
    sfx = f"_{suffix}" if suffix != "" else ""
    overlap = np.load(os.path.join(workdir, f"overlap{sfx}.npy"))
    one_rdm = np.load(os.path.join(workdir, f"one_rdm{sfx}.npy"))
    two_rdm = np.load(os.path.join(workdir, f"two_rdm{sfx}.npy"))
    tt_path = os.path.join(workdir, f"trn_times{sfx}.txt")
    trn_times = (np.loadtxt(tt_path).astype(int).reshape(-1).tolist()
                 if os.path.exists(tt_path) else None)
    return overlap, one_rdm, two_rdm, trn_times


def save_bundle(path, overlap, one_rdm, two_rdm, **extra):
    """Native single-file checkpoint."""
    np.savez_compressed(path, overlap=overlap, one_rdm=one_rdm,
                        two_rdm=two_rdm, **extra)


def load_bundle(path):
    data = np.load(path)
    return dict(data)
