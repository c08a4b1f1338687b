"""GAP/SOAP machine-learning baseline (dscribe + GP replacement).

The reference compares continuation PES/forces against a Gaussian
approximation potential built on SOAP descriptors with an average kernel
(scripts/PES_H_chain/H10_continuation_3D_replacements.py:47-118 uses
dscribe's SOAP + AverageKernel with analytic GP gradients;
scripts/MD/H30/md_H30_GAP.py trains a GAP on continuation data).

dscribe (C++) is unavailable here; this is a compact JAX implementation:
  * SOAP power spectrum: neighbor density expanded in a Gaussian radial
    basis x real solid harmonics (lmax <= 2), smooth cosine cutoff.
  * Average-kernel GP: K(A, B) = mean_ij (p_i . p_j)^zeta over normalized
    per-atom descriptors, ridge-regularized regression.
Everything is differentiable, so GP forces come from jax.grad of the
prediction — replacing the reference's hand-derived kernel gradients
(H10...:47-79).
"""

import jax
import jax.numpy as jnp
import numpy as np


def _real_solid_harmonics(x, y, z):
    """Real spherical harmonics up to l = 2 on unit vectors, shape (..., 9),
    with orthonormal within-l weights so the power spectrum
    sum_m c_n1lm c_n2lm is exactly rotation invariant."""
    s3, s15 = np.sqrt(3.0), np.sqrt(15.0)
    return jnp.stack([
        jnp.ones_like(x),
        s3 * x, s3 * y, s3 * z,
        s15 * x * y,
        s15 * y * z,
        np.sqrt(5.0 / 4.0) * (3.0 * z * z - 1.0),
        s15 * x * z,
        np.sqrt(15.0 / 4.0) * (x * x - y * y),
    ], axis=-1)


_L_OF = np.array([0, 1, 1, 1, 2, 2, 2, 2, 2])


def soap_descriptors(coords, rcut=6.0, nmax=4, lmax=2, sigma=0.5):
    """Per-atom SOAP power-spectrum descriptors (single species channel,
    matching the H-chain workloads; species-resolved channels are a
    straightforward extension).

    Args:
        coords: (natm, 3).

    Returns:
        (natm, nfeat) descriptors, l2-normalized per atom.
    """
    natm = coords.shape[0]
    diff = coords[None, :, :] - coords[:, None, :]       # [center, nbr, 3]
    r2 = jnp.sum(diff * diff, axis=-1)
    r = jnp.sqrt(r2 + 1e-12)
    mask = (1.0 - jnp.eye(natm)) * (r < rcut)
    # smooth cosine cutoff
    fcut = 0.5 * (1.0 + jnp.cos(jnp.pi * jnp.minimum(r / rcut, 1.0))) * mask

    # Gaussian radial basis on [0, rcut]
    centers = jnp.linspace(0.0, rcut, nmax)
    radial = jnp.exp(-((r[..., None] - centers) ** 2) / (2.0 * sigma ** 2))

    # angular part: solid harmonics of the unit vector
    unit = diff / r[..., None]
    ang = _real_solid_harmonics(unit[..., 0], unit[..., 1], unit[..., 2])

    # c[center, n, lm] = sum_nbr radial * fcut * ang
    c = jnp.einsum("ij,ijn,ijm->inm", fcut, radial, ang)

    # power spectrum p[n1, n2, l] = sum_m c[n1, lm] c[n2, lm]
    lmask = jnp.asarray(
        (np.arange(lmax + 1)[:, None] == _L_OF[None, :]).astype(np.float64))
    feats = []
    for l in range(lmax + 1):
        sel = c * lmask[l][None, None, :]
        feats.append(jnp.einsum("inm,iom->ino", sel, sel).reshape(natm, -1))
    p = jnp.concatenate(feats, axis=-1)
    norm = jnp.linalg.norm(p, axis=-1, keepdims=True)
    return p / jnp.maximum(norm, 1e-12)


def average_kernel(pA, pB, zeta=2.0):
    """K = mean_ij (p_i . q_j)^zeta (dscribe AverageKernel semantics)."""
    dots = jnp.clip(pA @ pB.T, 0.0, None)
    return jnp.mean(dots ** zeta)


class GAPModel:
    """Average-kernel SOAP GP for total energies (+ autodiff forces)."""

    def __init__(self, rcut=6.0, nmax=4, lmax=2, sigma=0.5, zeta=2.0,
                 jitter=1e-8):
        self.params = dict(rcut=rcut, nmax=nmax, lmax=lmax, sigma=sigma)
        self.zeta = zeta
        self.jitter = jitter
        self.train_coords = None
        self.alpha = None
        self.e_mean = 0.0

    def _desc(self, coords):
        return soap_descriptors(jnp.asarray(coords), **self.params)

    def fit(self, coords_list, energies):
        X = [self._desc(c) for c in coords_list]
        n = len(X)
        K = np.zeros((n, n))
        for i in range(n):
            for j in range(i, n):
                K[i, j] = K[j, i] = float(
                    average_kernel(X[i], X[j], self.zeta))
        e = np.asarray(energies, dtype=np.float64)
        self.e_mean = float(e.mean())
        self.alpha = np.linalg.solve(
            K + self.jitter * np.eye(n), e - self.e_mean)
        self.train_coords = [np.asarray(c) for c in coords_list]
        self._train_desc = [np.array(x) for x in X]
        return self

    def predict(self, coords):
        return float(self._predict_jax(jnp.asarray(coords)))

    def _predict_jax(self, coords):
        p = self._desc(coords)
        k = jnp.stack([
            average_kernel(p, jnp.asarray(x), self.zeta)
            for x in self._train_desc])
        return jnp.asarray(self.alpha) @ k + self.e_mean

    def predict_with_forces(self, coords):
        e, g = jax.value_and_grad(self._predict_jax)(jnp.asarray(coords))
        return float(e), -np.array(g)
