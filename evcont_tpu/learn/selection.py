"""Data-selection criteria for active learning.

Reference parity: the three data_addition modes of converge_EVCont_MD
(evcont/MD_utils.py:339-405):
  * "energy"              — frame with the largest |E_new - E_old|
  * "farthest_point"      — farthest frame from the training geometries in
                            cartesian L2 distance
  * "farthest_point_ham"  — farthest frame in electron-integral space,
                            distance = sum|dh1|^2 + 1/2 sum|dh2|^2

The integral-space criterion is the expensive one (per-frame h1/h2); here it
is a jitted, vmapped device computation instead of the reference's per-frame
Python loop.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..continuation import oao_integrals


def select_energy(en_diff):
    return int(np.argmax(en_diff))


def select_farthest_point(trn_geometries, trajectory):
    """Cartesian farthest-point selection (MD_utils.py:341-362)."""
    trn = np.asarray(trn_geometries)          # (ntrn, natm, 3)
    traj = np.asarray(trajectory)             # (nframes, natm, 3)
    d = np.sum(
        np.abs(trn[:, None] - traj[None, :]) ** 2, axis=(-1, -2))
    return int(np.argmax(np.min(d, axis=0)))


def select_farthest_point_ham(engine, trn_geometries, trajectory,
                              chunk_size=16):
    """Integral-space farthest-point selection (MD_utils.py:363-405),
    batched on device."""
    trn = jnp.asarray(trn_geometries)
    traj = np.asarray(trajectory)

    @jax.jit
    def ints(coords):
        h1, h2, _ = oao_integrals(engine, coords)
        return h1, h2

    @jax.jit
    def ints_batch(coords_batch):
        return jax.vmap(ints)(coords_batch)

    h1_trn, h2_trn = ints_batch(trn)

    @jax.jit
    def min_dist_batch(coords_batch):
        h1, h2 = ints_batch(coords_batch)
        d1 = jnp.sum(
            jnp.abs(h1[:, None] - h1_trn[None]) ** 2, axis=(-1, -2))
        d2 = 0.5 * jnp.sum(
            jnp.abs(h2[:, None] - h2_trn[None]) ** 2, axis=(-1, -2, -3, -4))
        return jnp.min(d1 + d2, axis=1)

    mins = []
    for start in range(0, traj.shape[0], chunk_size):
        chunk = traj[start:start + chunk_size]
        pad = chunk_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        vals = np.array(min_dist_batch(jnp.asarray(chunk)))
        mins.append(vals[:chunk_size - pad] if pad else vals)
    return int(np.argmax(np.concatenate(mins)))
