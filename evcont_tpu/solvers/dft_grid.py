"""Molecular integration grid: Becke partitioning, Gauss-Chebyshev radial
points, Lebedev-26 angular rule, plus AO-amplitude evaluation.

Supports the RKS-DFT baseline solver (the pyscf.dft replacement for the
reference's DFT reference MDs, e.g. scripts/MD/H30/md_H30_DFT.py,
scripts/MD/Zundel_thermodynamics/reference_dynamics/Zundel_DFT_PBE.py).
"""

import numpy as np

# Bragg-Slater radii (Angstrom -> Bohr at use site) for Becke's mapping
_BRAGG = {1: 0.35, 2: 0.93, 3: 1.45, 4: 1.05, 5: 0.85, 6: 0.70,
          7: 0.65, 8: 0.60, 9: 0.50, 10: 0.38}


def lebedev26():
    """26-point Lebedev rule (exact through l = 7): octahedron vertices,
    edge midpoints, and cube corners."""
    pts, wts = [], []
    for i in range(3):
        for s in (1.0, -1.0):
            v = np.zeros(3)
            v[i] = s
            pts.append(v)
            wts.append(1.0 / 21.0)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for i in range(3):
        j = (i + 1) % 3
        for si in (1.0, -1.0):
            for sj in (1.0, -1.0):
                v = np.zeros(3)
                v[i], v[j] = si * inv_sqrt2, sj * inv_sqrt2
                pts.append(v)
                wts.append(4.0 / 105.0)
    inv_sqrt3 = 1.0 / np.sqrt(3.0)
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                pts.append(np.array([sx, sy, sz]) * inv_sqrt3)
                wts.append(9.0 / 280.0)
    return np.array(pts), np.array(wts)


def lebedev50():
    """50-point Lebedev rule (exact through l = 11): vertices, edge
    midpoints, cube corners, and the 24-point (u, u, v) orbit. Weights are
    the exact rationals 4/315, 64/2835, 27/1280, 14641/725760 (they sum to
    1 over the sphere)."""
    pts, wts = [], []
    for i in range(3):
        for s in (1.0, -1.0):
            v = np.zeros(3)
            v[i] = s
            pts.append(v)
            wts.append(4.0 / 315.0)
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for i in range(3):
        j = (i + 1) % 3
        for si in (1.0, -1.0):
            for sj in (1.0, -1.0):
                v = np.zeros(3)
                v[i], v[j] = si * inv_sqrt2, sj * inv_sqrt2
                pts.append(v)
                wts.append(64.0 / 2835.0)
    inv_sqrt3 = 1.0 / np.sqrt(3.0)
    for sx in (1.0, -1.0):
        for sy in (1.0, -1.0):
            for sz in (1.0, -1.0):
                pts.append(np.array([sx, sy, sz]) * inv_sqrt3)
                wts.append(27.0 / 1280.0)
    u = np.sqrt(1.0 / 11.0)
    v_ = 3.0 / np.sqrt(11.0)
    w4 = 14641.0 / 725760.0
    for (i, j, k) in [(0, 1, 2), (0, 2, 1), (1, 2, 0)]:
        for su in (1.0, -1.0):
            for su2 in (1.0, -1.0):
                for sv in (1.0, -1.0):
                    p = np.zeros(3)
                    p[i], p[j], p[k] = su * u, su2 * u, sv * v_
                    pts.append(p)
                    wts.append(w4)
    return np.array(pts), np.array(wts)


def product_angular(n_theta=20):
    """Gauss-Legendre (cos theta) x uniform (phi) product rule on the
    sphere: exact through l = 2 n_theta - 1 with 2 n_theta^2 points.
    Heavier than Lebedev but arbitrarily accurate without tabulated
    coefficients; weights sum to 1."""
    x, wx = np.polynomial.legendre.leggauss(n_theta)
    nphi = 2 * n_theta
    phi = 2.0 * np.pi * np.arange(nphi) / nphi
    st = np.sqrt(1.0 - x ** 2)
    pts = np.stack([
        (st[:, None] * np.cos(phi)[None, :]).ravel(),
        (st[:, None] * np.sin(phi)[None, :]).ravel(),
        np.broadcast_to(x[:, None], (n_theta, nphi)).ravel(),
    ], axis=1)
    wts = np.broadcast_to((wx / 2.0)[:, None] / nphi,
                          (n_theta, nphi)).ravel()
    return pts, wts


def radial_gc(n, rm):
    """Gauss-Chebyshev (2nd kind) radial grid with the Becke mapping
    r = rm (1+x)/(1-x); returns (r, w) with w including r^2 dr."""
    i = np.arange(1, n + 1)
    x = np.cos(i * np.pi / (n + 1))
    wch = np.pi / (n + 1) * np.sin(i * np.pi / (n + 1)) ** 2
    r = rm * (1 + x) / (1 - x)
    drdx = 2.0 * rm / (1 - x) ** 2
    # Chebyshev weight function sqrt(1-x^2) must be divided out
    w = wch / np.sqrt(1 - x ** 2) * drdx * r ** 2
    return r, w


def becke_weights(coords, points, k=3):
    """Becke fuzzy-cell partition weights, one weight per (point, atom
    assignment is the owning atom of the shell the point came from)."""
    natm = coords.shape[0]
    npts = points.shape[0]
    # distances from every grid point to every atom
    d = np.linalg.norm(points[:, None, :] - coords[None, :, :], axis=-1)
    R = np.linalg.norm(coords[:, None, :] - coords[None, :, :], axis=-1)
    P = np.ones((npts, natm))
    for a in range(natm):
        for b in range(natm):
            if a == b:
                continue
            mu = (d[:, a] - d[:, b]) / R[a, b]
            f = mu
            for _ in range(k):
                f = 1.5 * f - 0.5 * f ** 3
            P[:, a] *= 0.5 * (1.0 - f)
    return P / np.maximum(P.sum(axis=1, keepdims=True), 1e-300)


def molecular_grid(mol, n_rad=75, angular=50):
    """Atom-centered product grid with Becke partitioning.

    Returns (points (N, 3), weights (N,)) in Bohr / Bohr^3."""
    if angular == "product":
        ang_pts, ang_wts = product_angular()
    elif angular >= 50:
        ang_pts, ang_wts = lebedev50()
    else:
        ang_pts, ang_wts = lebedev26()
    all_pts, all_wts, owner = [], [], []
    for ia, Z in enumerate(mol.numbers):
        rm = _BRAGG.get(int(Z), 1.0) / 0.52917721092 * 0.5 \
            if int(Z) != 1 else _BRAGG[1] / 0.52917721092
        r, wr = radial_gc(n_rad, rm)
        pts = (r[:, None, None] * ang_pts[None, :, :]).reshape(-1, 3) \
            + mol.coords[ia]
        wts = (wr[:, None] * (4.0 * np.pi) * ang_wts[None, :]).reshape(-1)
        all_pts.append(pts)
        all_wts.append(wts)
        owner.append(np.full(len(wts), ia))
    points = np.concatenate(all_pts)
    weights = np.concatenate(all_wts)
    owner = np.concatenate(owner)
    becke = becke_weights(np.asarray(mol.coords), points)
    weights = weights * becke[np.arange(len(points)), owner]
    return points, weights


def eval_aos(engine, points, deriv=False, coords=None):
    """AO amplitudes (and gradients) on grid points, in the engine's
    user-facing AO layout (spherical when d shells present).

    Returns phi (N, nao) or (phi, dphi (N, 3, nao)).

    coords: AO center positions; REQUIRED whenever evaluating at a
    geometry other than the engine's build geometry (callers that forget
    this got amplitudes for the original centers — the bug fixed in the
    rks/uks displaced-geometry paths)."""
    structure = engine.structure
    coords = np.asarray(engine.mol.coords if coords is None else coords)
    N = points.shape[0]
    nao_cart = structure.nao
    phi = np.zeros((N, nao_cart))
    dphi = np.zeros((N, 3, nao_cart)) if deriv else None
    from ..integrals.mcmurchie import cart_components
    for sh in structure.shells:
        center = coords[sh.atom]
        dx = points - center[None, :]
        r2 = np.sum(dx * dx, axis=1)
        rad = np.zeros(N)
        drad = np.zeros(N)  # d(radial)/d(r^2)
        for a, c in zip(sh.exps, sh.coefs):
            e = c * np.exp(-a * r2)
            rad += e
            drad += -a * e
        for ci, (lx, ly, lz) in enumerate(cart_components(sh.l)):
            poly = dx[:, 0] ** lx * dx[:, 1] ** ly * dx[:, 2] ** lz
            col = sh.ao_start + ci
            phi[:, col] = poly * rad
            if deriv:
                for d, ld in enumerate((lx, ly, lz)):
                    dpoly = np.zeros(N)
                    if ld > 0:
                        ex = [lx, ly, lz]
                        ex[d] -= 1
                        dpoly = ld * (dx[:, 0] ** ex[0] * dx[:, 1] ** ex[1]
                                      * dx[:, 2] ** ex[2])
                    dphi[:, d, col] = (dpoly * rad
                                       + poly * 2.0 * dx[:, d] * drad)
    if engine._sph_q is not None:
        phi = phi @ engine._sph_q
        if deriv:
            dphi = np.einsum("ndc,cs->nds", dphi, engine._sph_q)
    return (phi, dphi) if deriv else phi
