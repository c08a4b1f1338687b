"""Analytic Kohn-Sham nuclear forces by autodiff (fixed-OAO-density).

The reference's DFT baseline MDs lean on pyscf's hand-coded RKS gradient
routines (scripts/MD/H30/md_H30_DFT.py:30-40, Zundel_thermodynamics/
reference_dynamics/Zundel_DFT_PBE.py). Here the force is the exact
derivative of the *computed* energy instead: express the converged
density in the Löwdin-orthogonal basis, P_oao = S^{1/2} P S^{1/2}
(idempotency and trace are preserved under P(R) = T(R) P_oao T(R) for
any R, T = S^{-1/2}), hold P_oao fixed, and differentiate the full KS
energy expression with jax.grad. SCF stationarity makes the missing
density-response term vanish, so this equals the analytic gradient —
including the Pulay basis-set forces AND the quadrature-grid response
(grid points and Becke weights move with the atoms inside the autodiff),
which production codes usually neglect.

Everything — integrals (McMurchie-Davidson engine), Löwdin transform
(Daleckii-Krein JVP), grid generation, AO amplitudes, XC energy density
(shared formulas from solvers/dft.py via the xp module parameter) — is
jax-traced, so one jax.grad gives machine-accurate forces on the
accelerator. Validated against central finite differences of
solvers/dft.rks in tests/test_dft_force.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..oao import loewdin_trafo
from .dft import _HYBRIDS, _xc_energy_density, rks
from .dft_grid import lebedev26, lebedev50, product_angular, radial_gc
from .dft_grid import _BRAGG

_BOHR = 0.52917721092


def _angular_rule(angular):
    if angular == "product":
        return product_angular()
    if angular >= 50:
        return lebedev50()
    return lebedev26()


def _becke_weights_jax(coords, points, k=3):
    """Differentiable Becke fuzzy-cell weights (dft_grid.becke_weights
    twin): P (npts, natm), normalized over atoms."""
    natm = coords.shape[0]
    # epsilon inside the sqrt keeps the gradient finite if a grid point
    # ever lands numerically on a center
    d = jnp.sqrt(jnp.sum(
        (points[:, None, :] - coords[None, :, :]) ** 2, axis=-1) + 1e-300)
    # diagonal never used (own-cell factor is reset below); the eye keeps
    # the division benign
    R = jnp.sqrt(jnp.sum(
        (coords[:, None, :] - coords[None, :, :]) ** 2, axis=-1)
        + jnp.eye(natm))
    P = jnp.ones((points.shape[0], natm))
    for b in range(natm):
        mu = (d - d[:, b:b + 1]) / R[:, b][None, :]
        f = mu
        for _ in range(k):
            f = 1.5 * f - 0.5 * f ** 3
        cell = 0.5 * (1.0 - f)
        # column a == b contributes no factor
        cell = cell.at[:, b].set(1.0)
        P = P * cell
    return P / jnp.maximum(P.sum(axis=1, keepdims=True), 1e-300)


def molecular_grid_jax(numbers, coords, n_rad=75, angular=50):
    """Differentiable twin of dft_grid.molecular_grid: radial/angular
    node tables are constants; point positions and Becke weights are
    functions of the (traced) atom coordinates."""
    ang_pts, ang_wts = _angular_rule(angular)
    all_pts, all_wts, owner = [], [], []
    for ia, Z in enumerate(numbers):
        rm = _BRAGG.get(int(Z), 1.0) / _BOHR * 0.5 \
            if int(Z) != 1 else _BRAGG[1] / _BOHR
        r, wr = radial_gc(n_rad, rm)
        pts = jnp.asarray((r[:, None, None] * ang_pts[None, :, :])
                          ).reshape(-1, 3) + coords[ia]
        wts = np.asarray(
            (wr[:, None] * (4.0 * np.pi) * ang_wts[None, :])).reshape(-1)
        all_pts.append(pts)
        all_wts.append(jnp.asarray(wts))
        owner.append(np.full(len(wts), ia))
    points = jnp.concatenate(all_pts)
    weights = jnp.concatenate(all_wts)
    owner = np.concatenate(owner)
    becke = _becke_weights_jax(coords, points)
    return points, weights * becke[np.arange(points.shape[0]), owner]


def eval_aos_jax(engine, coords, points):
    """Differentiable AO amplitudes and point-gradients on grid points
    (dft_grid.eval_aos twin; gradients are w.r.t. the point position at
    fixed centers — the spatial density gradient for GGA sigma)."""
    from ..integrals.mcmurchie import cart_components

    structure = engine.structure
    N = points.shape[0]
    cols, dcols = [], []
    for sh in structure.shells:
        center = coords[sh.atom]
        dx = points - center[None, :]
        r2 = jnp.sum(dx * dx, axis=1)
        rad = jnp.zeros(N)
        drad = jnp.zeros(N)
        for a, c in zip(sh.exps, sh.coefs):
            e = c * jnp.exp(-a * r2)
            rad = rad + e
            drad = drad - a * e
        for (lx, ly, lz) in cart_components(sh.l):
            poly = dx[:, 0] ** lx * dx[:, 1] ** ly * dx[:, 2] ** lz
            cols.append(poly * rad)
            dcol = []
            for d, ld in enumerate((lx, ly, lz)):
                dpoly = jnp.zeros(N)
                if ld > 0:
                    ex = [lx, ly, lz]
                    ex[d] -= 1
                    dpoly = ld * (dx[:, 0] ** ex[0] * dx[:, 1] ** ex[1]
                                  * dx[:, 2] ** ex[2])
                dcol.append(dpoly * rad + poly * 2.0 * dx[:, d] * drad)
            dcols.append(jnp.stack(dcol, axis=0))
    phi = jnp.stack(cols, axis=1)                 # (N, nao_cart)
    # dcols entries are (3, N); stack to (3, N, nao) then put N first
    dphi = jnp.stack(dcols, axis=2).transpose(1, 0, 2)  # (N, 3, nao_cart)
    if engine._sph_q is not None:
        q = jnp.asarray(engine._sph_q)
        phi = phi @ q
        dphi = jnp.einsum("ndc,cs->nds", dphi, q)
    return phi, dphi


def _exc_grid(engine, coords, dm, xc, n_rad, angular, rho_cutoff=1e-10):
    points, wts = molecular_grid_jax(engine.mol.numbers, coords,
                                     n_rad=n_rad, angular=angular)
    phi, dphi = eval_aos_jax(engine, coords, points)
    rho = jnp.einsum("ni,ij,nj->n", phi, dm, phi)
    grad_rho = 2.0 * jnp.einsum("ndi,ij,nj->nd", dphi, dm, phi)
    sigma = jnp.sum(grad_rho * grad_rho, axis=1)
    live = rho > rho_cutoff
    # safe-where: evaluate the density functional at benign values on
    # screened points so reverse-mode autodiff stays NaN-free
    rho_s = jnp.where(live, rho, 1.0)
    sig_s = jnp.where(live, sigma, 0.0)
    f = rho_s * _xc_energy_density(rho_s, sig_s, xc, xp=jnp)
    return jnp.sum(jnp.where(live, wts * f, 0.0))


def rks_energy_fixed_density(engine, coords, p_oao, xc="pbe", n_rad=75,
                             angular=50):
    """Total KS energy at (traced) coords with the density held fixed in
    the Löwdin-orthogonal parameterization — the function whose exact
    gradient is the nuclear force at SCF stationarity."""
    hyb = _HYBRIDS.get(xc, dict(c_hf=0.0, c_lr=0.0, omega=0.0))
    S = engine.overlap(coords)
    T = loewdin_trafo(S)
    dm = T @ p_oao @ T
    h = engine.hcore(coords)
    g = engine.eri(coords)
    e = jnp.sum(dm * h)
    e = e + 0.5 * jnp.einsum("ij,ijkl,kl", dm, g, dm)
    if hyb["c_hf"]:
        e = e - 0.25 * hyb["c_hf"] * jnp.einsum("ij,ikjl,kl", dm, g, dm)
    if hyb["c_lr"]:
        g_lr = engine.eri(coords, omega=hyb["omega"])
        e = e - 0.25 * hyb["c_lr"] * jnp.einsum("ij,ikjl,kl", dm, g_lr,
                                                dm)
    if xc != "hf":
        e = e + _exc_grid(engine, coords, dm, xc, n_rad, angular)
    return e + engine.energy_nuc(coords)


@partial(jax.jit, static_argnums=(0, 3, 4, 5))
def _energy_and_grad(engine, coords, p_oao, xc, n_rad, angular):
    return jax.value_and_grad(
        lambda c: rks_energy_fixed_density(engine, c, p_oao, xc=xc,
                                           n_rad=n_rad, angular=angular)
    )(coords)


def rks_energy_and_force(engine, coords=None, xc="pbe", n_rad=75,
                         angular=50, scf_result=None, **scf_kwargs):
    """Converge RKS on the host (solvers/dft.rks with the SAME grid
    settings, so the differentiated energy expression is the one the SCF
    made stationary), then return (e_tot, force) with the force from one
    jitted value_and_grad on the device.

    Pass scf_result to reuse an existing rks() solution (it must have
    been produced with matching n_rad/angular)."""
    coords = np.asarray(engine.mol.coords if coords is None else coords)
    res = scf_result or rks(engine, coords, xc=xc, n_rad=n_rad,
                            angular=angular, **scf_kwargs)
    S = np.array(engine.compute_jit(coords).ovlp, dtype=np.float64)
    w, V = np.linalg.eigh(S)
    S_half = (V * np.sqrt(np.maximum(w, 0.0))) @ V.T
    p_oao = S_half @ res.dm @ S_half
    e, grad = _energy_and_grad(engine, coords, p_oao, xc, n_rad, angular)
    return float(e), -np.asarray(grad), res
