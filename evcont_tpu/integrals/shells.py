"""Static shell/primitive structure derived from a Molecule.

The split matters for TPU: everything here is geometry-independent (shell
composition, contraction coefficients, AO index maps) and is precomputed on
the host with numpy. The jitted integral kernels receive only the nuclear
coordinates as traced inputs, so one XLA compilation covers all geometries
of a molecule — the key to batched PES evaluation and on-device MD.

AO ordering: atom-major, shells in basis-table order, cartesian components
x-major (px, py, pz). This replaces pyscf's AO ordering; all quantities the
framework stores (t-RDMs, overlap) are in the OAO basis derived from this
ordering, which is internally consistent across the whole pipeline.
"""

from dataclasses import dataclass

import numpy as np

from ..basis_data import get_element_basis
from .mcmurchie import cart_components


def _double_factorial(n):
    out = 1
    while n > 1:
        out *= n
        n -= 2
    return out


def cart_overlap_metric(l):
    """Angular self/cross-overlap metric of the cartesian components of a
    shell in the engine's normalization convention (each component carries
    the (l,0,0)-based primitive norm). Exponent-independent; used to build
    exactly normalized cartesian->spherical transforms."""
    from .mcmurchie import cart_components

    comps = cart_components(l)
    n = len(comps)
    M = np.zeros((n, n))
    norm_l00 = _double_factorial(2 * l - 1)
    for a, ca in enumerate(comps):
        for b, cb in enumerate(comps):
            val = 1.0
            for d in range(3):
                s = ca[d] + cb[d]
                if s % 2 == 1:
                    val = 0.0
                    break
                val *= _double_factorial(s - 1)
            M[a, b] = val / norm_l00
    return M


# raw real-solid-harmonic polynomials in cartesian components (rows: m =
# -l..l, columns: cart_components(l) order). Normalization is fixed
# numerically against cart_overlap_metric, so only ratios matter here.
_SPH_POLY = {
    0: np.array([[1.0]]),
    1: np.array([  # pyscf spherical p order: (x, y, z) == cartesian
        [1.0, 0.0, 0.0],
        [0.0, 1.0, 0.0],
        [0.0, 0.0, 1.0],
    ]),
    2: np.array([  # cart order: xx, xy, xz, yy, yz, zz
        [0.0, 1.0, 0.0, 0.0, 0.0, 0.0],     # m=-2: xy
        [0.0, 0.0, 0.0, 0.0, 1.0, 0.0],     # m=-1: yz
        [-1.0, 0.0, 0.0, -1.0, 0.0, 2.0],   # m= 0: 2z^2 - x^2 - y^2
        [0.0, 0.0, 1.0, 0.0, 0.0, 0.0],     # m=+1: xz
        [1.0, 0.0, 0.0, -1.0, 0.0, 0.0],    # m=+2: x^2 - y^2
    ]),
}


def _harmonic_kernel_poly(l):
    """Numerically construct a basis of the (2l+1)-dimensional harmonic
    subspace of degree-l cartesian monomials as the null space of the
    Laplacian. Valid for any l (conventional tables only reach l = 2 here);
    the specific within-l basis choice is a unitary convention — physics is
    invariant, and the subspace is exactly rotation-closed."""
    from .mcmurchie import cart_components

    comps = cart_components(l)
    comps_m2 = cart_components(l - 2) if l >= 2 else []
    idx_m2 = {c: i for i, c in enumerate(comps_m2)}
    L = np.zeros((len(comps_m2), len(comps)))
    for j, (a, b, c) in enumerate(comps):
        for d, e in enumerate((a, b, c)):
            if e >= 2:
                tgt = [a, b, c]
                tgt[d] -= 2
                L[idx_m2[tuple(tgt)], j] += e * (e - 1)
    # null space
    _, s, Vt = np.linalg.svd(L)
    rank = int(np.sum(s > 1e-10)) if len(s) else 0
    K = Vt[rank:].T if L.shape[0] else np.eye(len(comps))
    assert K.shape[1] == 2 * l + 1, (l, K.shape)
    return K.T    # (2l+1, ncart) raw rows


def cart2sph_matrix(l):
    """(nsph, ncart) transform from the engine's normalized cartesian
    components to unit-normalized real spherical components. Tabulated
    conventional harmonics for l <= 2; numerical harmonic-kernel basis
    (Löwdin-orthonormalized in the cartesian overlap metric) for l >= 3."""
    if l <= 1:
        return np.eye((l + 1) * (l + 2) // 2)
    M = cart_overlap_metric(l)
    if l in _SPH_POLY:
        P = _SPH_POLY[l]
        norms = np.sqrt(np.einsum("mc,cd,md->m", P, M, P))
        return P / norms[:, None]
    P = _harmonic_kernel_poly(l)
    G = P @ M @ P.T
    w, V = np.linalg.eigh(G)
    G_inv_sqrt = (V / np.sqrt(w)) @ V.T
    return G_inv_sqrt @ P


def _primitive_norm(a, l):
    """Normalization of a cartesian primitive x^l exp(-a r^2) (component
    (l,0,0); all components share this norm for l <= 1)."""
    return (
        (2.0 * a / np.pi) ** 0.75
        * np.sqrt((4.0 * a) ** l / _double_factorial(2 * l - 1))
    )


@dataclass(frozen=True)
class Shell:
    atom: int
    l: int
    exps: np.ndarray
    coefs: np.ndarray  # include primitive norms and contracted renorm
    ao_start: int      # offset into the cartesian AO ordering
    sph_start: int     # offset into the spherical AO ordering

    @property
    def ncart(self):
        return (self.l + 1) * (self.l + 2) // 2

    @property
    def nsph(self):
        return 2 * self.l + 1


@dataclass(frozen=True)
class ShellStructure:
    shells: tuple
    nao: int        # cartesian AO count (internal/scatter layout)
    nao_sph: int    # spherical AO count (user-facing for max_l >= 2)
    natm: int

    @property
    def max_l(self):
        return max(s.l for s in self.shells)


def build_shell_structure(mol):
    """Expand a Molecule into normalized contracted shells with AO offsets."""
    shells = []
    ao = 0
    sph = 0
    for atom_idx, symbol in enumerate(mol.symbols):
        for (l, exps, coefs) in get_element_basis(mol.basis, symbol):
            exps = np.asarray(exps, dtype=np.float64)
            coefs = np.asarray(coefs, dtype=np.float64)
            # coefficients multiply normalized primitives
            cn = coefs * np.array([_primitive_norm(a, l) for a in exps])
            # renormalize the contracted function to unit self-overlap
            # (pyscf does the same in Mole.build)
            p = exps[:, None] + exps[None, :]
            ovlp = (
                (np.pi / p) ** 1.5
                * _double_factorial(2 * l - 1)
                / (2.0 * p) ** l
            )
            self_ovlp = np.einsum("i,j,ij->", cn, cn, ovlp)
            cn = cn / np.sqrt(self_ovlp)
            shells.append(Shell(atom=atom_idx, l=l, exps=exps, coefs=cn,
                                ao_start=ao, sph_start=sph))
            ao += (l + 1) * (l + 2) // 2
            sph += 2 * l + 1
    return ShellStructure(shells=tuple(shells), nao=ao, nao_sph=sph,
                          natm=mol.natm)


def cart2sph_ao_matrix(structure):
    """Block-diagonal (nao_cart, nao_sph) transform: AO matrices in the
    engine's cartesian layout map to the spherical-harmonic AO basis as
    Q^T M Q. Identity blocks for s/p shells."""
    Q = np.zeros((structure.nao, structure.nao_sph))
    for sh in structure.shells:
        T = cart2sph_matrix(sh.l)          # (nsph, ncart)
        Q[sh.ao_start:sh.ao_start + sh.ncart,
          sh.sph_start:sh.sph_start + sh.nsph] = T.T
    return Q


@dataclass(frozen=True)
class PrimClass:
    """A batch of primitive shells sharing angular momentum l.

    Arrays are parallel over primitives; each contracted shell contributes
    one entry per primitive exponent, all mapping to the same AO block.
    """
    l: int
    atom: np.ndarray       # (n,) atom index of the center
    exp: np.ndarray        # (n,)
    coef: np.ndarray       # (n,) normalized contraction coefficient
    ao_start: np.ndarray   # (n,) AO offset of the parent shell


def primitive_classes(structure):
    """Group all primitives by angular momentum."""
    by_l = {}
    for sh in structure.shells:
        d = by_l.setdefault(sh.l, {"atom": [], "exp": [], "coef": [], "ao": []})
        for a, c in zip(sh.exps, sh.coefs):
            d["atom"].append(sh.atom)
            d["exp"].append(a)
            d["coef"].append(c)
            d["ao"].append(sh.ao_start)
    return {
        l: PrimClass(
            l=l,
            atom=np.array(d["atom"], dtype=np.int32),
            exp=np.array(d["exp"], dtype=np.float64),
            coef=np.array(d["coef"], dtype=np.float64),
            ao_start=np.array(d["ao"], dtype=np.int32),
        )
        for l, d in by_l.items()
    }


def pair_scatter_indices(ca, cb, ao_a, ao_b, nao):
    """Flattened scatter indices into an (nao, nao) matrix for a batch of
    primitive pairs with ncart counts ca, cb. Shape (n, ca, cb), int32."""
    comp_a = np.arange(ca, dtype=np.int32)
    comp_b = np.arange(cb, dtype=np.int32)
    rows = ao_a[:, None, None] + comp_a[None, :, None]
    cols = ao_b[:, None, None] + comp_b[None, None, :]
    return rows * np.int32(nao) + cols


def cartesian_pairs(na, nb):
    """Index grids for the cross product of two primitive lists."""
    ia, ib = np.meshgrid(np.arange(na), np.arange(nb), indexing="ij")
    return ia.ravel(), ib.ravel()


__all__ = [
    "Shell", "ShellStructure", "PrimClass",
    "build_shell_structure", "primitive_classes",
    "pair_scatter_indices", "cartesian_pairs", "cart_components",
]
