"""Differentiable Gaussian-integral engine (McMurchie-Davidson, JAX).

Replaces the pyscf/libcint integral layer the reference depends on:
  * mol.intor("int1e_ovlp")      -> IntegralEngine.overlap
  * scf.hf.get_hcore(mol)        -> IntegralEngine.hcore
  * mol.intor("int2e") + ao2mo   -> IntegralEngine.eri
  * mol.intor("int1e_r")         -> IntegralEngine.dipole
  * mol.energy_nuc()             -> IntegralEngine.energy_nuc
  * int1e_ipovlp / int2e_ip1 / hcore_generator (derivative integrals used in
    evcont/ab_initio_gradients_loewdin.py:25,147,284) -> jax.grad/jacrev of
    the functions above: the whole engine is differentiable w.r.t. nuclear
    coordinates, so analytic forces come from autodiff instead of
    hand-assembled Hellmann-Feynman contractions.

Design notes (TPU-first):
  * Geometry-independent structure (shell classes, contraction coefficients,
    AO scatter indices, Hermite gather tables) is precomputed with numpy at
    construction. Every public method is a pure function of coords (natm, 3)
    and is jit/vmap/grad-compatible.
  * Primitive shells are grouped into classes by angular momentum; within a
    class everything is a dense batched tensor. Hermite E/R recursions are
    materialized into stacked arrays once, and all angular assembly happens
    through static gathers + einsums (batched matmuls on the MXU) — keeping
    the XLA graph small (compile time) and the arithmetic dense.
"""

import itertools
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

from ..molecule import Molecule
from .mcmurchie import hermite_E_dense, hermite_R_dense, cart_components
from .shells import (
    build_shell_structure,
    cart2sph_ao_matrix,
    primitive_classes,
    pair_scatter_indices,
    cartesian_pairs,
)


class IntegralBundle(NamedTuple):
    """All geometry-dependent AO-basis quantities needed downstream."""
    ovlp: jnp.ndarray    # (nao, nao)
    hcore: jnp.ndarray   # (nao, nao)
    eri: jnp.ndarray     # (nao, nao, nao, nao), chemist (ij|kl)
    enuc: jnp.ndarray    # scalar


def _comp_tables(l):
    carts = cart_components(l)
    return tuple(np.array([c[d] for c in carts], dtype=np.int32)
                 for d in range(3))


def _nofold(x):
    """Wrap a geometry-independent class array so XLA cannot constant-fold
    it into large derived grids. Without this, the ERI quartet stage's
    outer-product quantities over primitive-pair instances (alpha =
    p*q/(p+q), the coefficient-product prefactor, ...) are compile-time
    constants of shape (n1, n2) and get folded into the executable — for
    an H30/STO-6G chain that meant multi-GB constants, a >2 GB
    non-serializable executable, and ~7 min of constant-folding passes.
    The barrier keeps only the small per-instance vectors embedded and
    computes the grids at runtime (trivial elementwise work that fuses
    into the consumers). optimization_barrier is differentiation-
    transparent (identity JVP), so autodiff forces are unaffected."""
    return jax.lax.optimization_barrier(jnp.asarray(x))


@dataclass(frozen=True)
class _PairClass:
    la: int
    lb: int
    atom_a: np.ndarray
    atom_b: np.ndarray
    a: np.ndarray
    b: np.ndarray
    cc: np.ndarray           # coefficient product (ERI upair classes fold
                             # 0.5 stabilizer weights into this)
    scatter: np.ndarray      # (n, ca, cb) int32 into flat (nao*nao)


def _conv_table(nb, nk, L):
    """Static gather table mapping the flat (L+1)^3 R tensor to the
    "convolution" matrix M[TB, TK] with TB = nb^3 bra Hermite indices and
    TK = nk^3 ket indices: M[tuv, xyz] = R[t+x, u+y, v+z]."""
    table = np.zeros((nb ** 3, nk ** 3), dtype=np.int32)
    for bi, (t, u, v) in enumerate(itertools.product(range(nb), repeat=3)):
        for ki, (x, y, z) in enumerate(
                itertools.product(range(nk), repeat=3)):
            table[bi, ki] = ((t + x) * (L + 1) + (u + y)) * (L + 1) + (v + z)
    return table.reshape(-1)


def _conv_onehot(nb, nk, L):
    """The _conv_table gather as a 0/1 matrix ((L+1)^3, nb^3*nk^3): on TPU
    a last-axis gather lowers to element-serial loads, while the identical
    linear map as a GEMM rides the MXU (measured 2-5x per quartet class,
    tpu_micro_contract.py)."""
    tab = _conv_table(nb, nk, L)
    onehot = np.zeros(((L + 1) ** 3, nb ** 3 * nk ** 3), dtype=np.float64)
    onehot[tab, np.arange(tab.size)] = 1.0
    return onehot


def _quartet_contract(Rd_flat, E3b, E3k, onehot, nb3, nk3, ein=jnp.einsum):
    """Angular contraction block[a,b,i,j] = sum_{t,u} E3b[a,i,t] E3k[b,j,u]
    M[a,b,t,u] with M = Rd_flat @ onehot (the Hermite t+u convolution).

    The formulation is chosen statically per quartet-class shape from TPU
    measurements (tpu_micro_contract.py; the naive gather+triple-einsum
    costs 2-5x more on every class with angular momentum):
      * nb3 == nk3 == 1 (ss|ss): plain elementwise product.
      * nb3 == 1 (ss|ket):       one-hot GEMM + single einsum ("B").
      * small grids or balanced: fold the one-hot into the bra tensor,
        contract the raw Rd directly ("G") — also skips materializing
        the (a,b,nb3,nk3) M tensor (nb3 -> i shrinks it).
      * tall ket (nk3 > nb3):    two-step ket-first contraction ("C").
    """
    n1, n2 = Rd_flat.shape[0], Rd_flat.shape[1]
    s = Rd_flat.shape[2]
    if nb3 == 1 and nk3 == 1:
        return (Rd_flat.reshape(n1, n2, 1, 1)
                * E3b[:, None, :, 0, None] * E3k[None, :, None, :, 0])
    W1 = jnp.asarray(onehot, dtype=Rd_flat.dtype)
    if nb3 == 1:
        M = ein("abs,so->abo", Rd_flat, W1)
        M = M.reshape(n1, n2, nb3, nk3)
        if ein is jnp.einsum:   # keep the measured-optimal fused form
            return jnp.einsum("ait,abtu,bju->abij", E3b, M, E3k)
        T1 = ein("abtu,bju->abtj", M, E3k)
        return ein("ait,abtj->abij", E3b, T1)
    if n1 * n2 <= 4096 or nk3 <= nb3:
        W = ein("ait,sto->aiso", E3b, W1.reshape(s, nb3, nk3))
        T1 = ein("aiso,abs->abio", W, Rd_flat)
        return ein("abio,bjo->abij", T1, E3k)
    M = ein("abs,so->abo", Rd_flat, W1).reshape(n1, n2, nb3, nk3)
    T1 = ein("abtu,bju->abtj", M, E3k)
    return ein("ait,abtj->abij", E3b, T1)


class IntegralEngine:
    # class-level default so engines restored from older pickles keep the
    # emulated-f64 behavior they were built with
    f64_contract = "emulated"

    def __init__(self, mol: Molecule, f64_contract="emulated",
                 ozaki_depth=(6, 5), ozaki_min_elems=1_000_000):
        # f64_contract picks the kernel for the heavy contractions when
        # the pipeline runs at f64 (the precise mode): "emulated" keeps
        # XLA's software-f64 dots (off-MXU); "ozaki" routes them through
        # exact bf16-digit MXU passes (subspace/ozaki.py) at f64-class
        # accuracy — the precise-throughput path. f32 runs are unaffected.
        # "ozaki-selective" routes ONLY contractions whose largest static
        # operand has >= ozaki_min_elems elements (small einsums keep
        # XLA's emulated-f64 dots): the full-ozaki program's ~15-21 MXU
        # passes per einsum times dozens of quartet-class call sites
        # exceeds the axon remote compile helper's memory (SIGKILL at
        # every useful depth, RESULTS r4), while the dominant FLOPs live
        # in a handful of large contractions — selective routing bounds
        # program growth to exactly those.
        # ozaki_depth = (forward, vjp) digit depths: error ~2^(-8*depth)
        # relative to per-row operand maxima; depth 6 is f64-class, 5 is
        # ~1e-12-relative (still far inside the 1e-8 Ha north star) at
        # 15 vs 21 MXU passes per contraction and a smaller XLA program.
        assert f64_contract in ("emulated", "ozaki", "ozaki-selective"), \
            f64_contract
        self.f64_contract = f64_contract
        self.ozaki_depth = tuple(ozaki_depth)
        self.ozaki_min_elems = int(ozaki_min_elems)
        self.mol = mol
        self.structure = build_shell_structure(mol)
        # internal (cartesian) AO layout used by the scatter kernels
        self._nao_cart = self.structure.nao
        self.natm = mol.natm
        self.charges = mol.numbers.astype(np.float64)
        self._prim = primitive_classes(self.structure)
        self._pairs = self._build_pair_classes()
        self._upairs = self._build_upair_classes()
        # shells with l >= 2 are exposed in the spherical-harmonic basis
        # (pyscf's default); s/p-only molecules skip the transform
        if self.structure.max_l >= 2:
            self._sph_q = cart2sph_ao_matrix(self.structure)
            self.nao = self.structure.nao_sph
        else:
            self._sph_q = None
            self.nao = self._nao_cart

    def _f64_ein(self, dtype):
        """The two-operand contraction kernel for this dtype: plain
        jnp.einsum, or the exact bf16-digit MXU path for f64 inputs when
        f64_contract == "ozaki" (operands are cast up — the static 0/1
        aggregation tables are stored f32)."""
        if self.f64_contract in ("ozaki", "ozaki-selective") \
                and dtype == jnp.float64:
            from ..subspace.ozaki import ozaki_einsum
            depth, grad_depth = self.ozaki_depth
            # static operand-size threshold (shapes are concrete at trace
            # time): 0 for full ozaki, ozaki_min_elems for selective
            thresh = (self.ozaki_min_elems
                      if self.f64_contract == "ozaki-selective" else 0)

            def ein(spec, a, b):
                if max(a.size, b.size) < thresh:
                    return jnp.einsum(spec, a, b)
                return ozaki_einsum(spec, a.astype(jnp.float64),
                                    b.astype(jnp.float64), depth,
                                    grad_depth)
            return ein
        return jnp.einsum

    def _to_sph2(self, M):
        if self._sph_q is None:
            return M
        Q = jnp.asarray(self._sph_q)
        return Q.T @ M @ Q

    def _to_sph4(self, G):
        if self._sph_q is None:
            return G
        Q = jnp.asarray(self._sph_q)
        ein = self._f64_ein(G.dtype)
        for _ in range(4):
            if ein is jnp.einsum:
                G = jnp.tensordot(G, Q, axes=[[0], [0]])
            else:
                G = ein("abcd,ax->bcdx", G, Q)
        return G

    # ------------------------------------------------------------------
    # static structure
    # ------------------------------------------------------------------
    def _build_pair_classes(self):
        classes = []
        nao = self._nao_cart
        for la, lb in itertools.product(sorted(self._prim), repeat=2):
            pa, pb = self._prim[la], self._prim[lb]
            ia, ib = cartesian_pairs(len(pa.exp), len(pb.exp))
            ca = (la + 1) * (la + 2) // 2
            cb = (lb + 1) * (lb + 2) // 2
            classes.append(_PairClass(
                la=la, lb=lb,
                atom_a=pa.atom[ia], atom_b=pb.atom[ib],
                a=pa.exp[ia], b=pb.exp[ib],
                cc=pa.coef[ia] * pb.coef[ib],
                scatter=pair_scatter_indices(
                    ca, cb, pa.ao_start[ia], pb.ao_start[ib], nao),
            ))
        return classes

    # bound on primitive-pair instances per ERI class: the quartet stage
    # forms dense (n1, n2) pair-product grids, so an unchunked class of N
    # instances costs O(N^2) memory per class combo — 16,290 ss instances
    # on an H30/STO-6G chain meant 265M-entry grids and a >4 GB
    # executable. Chunks keep every grid <= (4096)^2; the (1+T)
    # symmetrization handles cross-chunk combos exactly like distinct
    # classes (full weight, transpose pass restores the other order).
    _ERI_CLASS_CHUNK = 4096

    def _build_upair_classes(self):
        """Unordered shell-pair classes for the ERI path: one entry per
        unordered primitive pair, realizing the (ab| = (ba| permutation
        symmetry. Self-paired entries carry weight 0.5 (folded into the
        coefficient product) because the final (1 + T1)(1 + T2)(1 + T3)
        symmetrization pass maps them onto themselves. Large classes are
        split into chunks of at most _ERI_CLASS_CHUNK instances."""
        classes = []
        nao = self._nao_cart
        ls = sorted(self._prim)
        for ka, la in enumerate(ls):
            for lb in ls[ka:]:
                pa, pb = self._prim[la], self._prim[lb]
                na, nb_ = len(pa.exp), len(pb.exp)
                if la == lb:
                    iu, ju = np.triu_indices(na)
                    ia, ib = iu.astype(np.int64), ju.astype(np.int64)
                    weight = np.where(ia == ib, 0.5, 1.0)
                else:
                    ia, ib = cartesian_pairs(na, nb_)
                    weight = np.ones(len(ia))
                ca = (la + 1) * (la + 2) // 2
                cb = (lb + 1) * (lb + 2) // 2
                n_inst = len(ia)
                chunk = self._ERI_CLASS_CHUNK
                for lo in range(0, n_inst, chunk):
                    sl = slice(lo, min(lo + chunk, n_inst))
                    classes.append(_PairClass(
                        la=la, lb=lb,
                        atom_a=pa.atom[ia[sl]], atom_b=pb.atom[ib[sl]],
                        a=pa.exp[ia[sl]], b=pb.exp[ib[sl]],
                        cc=pa.coef[ia[sl]] * pb.coef[ib[sl]] * weight[sl],
                        scatter=pair_scatter_indices(
                            ca, cb, pa.ao_start[ia[sl]],
                            pb.ao_start[ib[sl]], nao),
                    ))
        return classes

    # ------------------------------------------------------------------
    # geometry-dependent helpers
    # ------------------------------------------------------------------
    @staticmethod
    def _pair_E(A, B, a, b, la, lb, extra=0):
        """Gaussian-product center and dense per-dimension E tensors.

        Returns p (n,), P (n,3), E list of 3 arrays
        (n, la+1, lb+extra+1, la+lb+extra+1).
        """
        a, b = _nofold(a), _nofold(b)
        p = a + b
        P = (a[:, None] * A + b[:, None] * B) / p[:, None]
        mu = a * b / p
        inv_2p = 0.5 / p
        E = []
        for d in range(3):
            AB = A[:, d] - B[:, d]
            E.append(hermite_E_dense(la, lb + extra, P[:, d] - A[:, d],
                                     P[:, d] - B[:, d], inv_2p,
                                     mu * AB * AB))
        return p, P, E

    @staticmethod
    def _gather_comp(E, ta, tb, t):
        """E[(n, i, j, t)] -> (n, ca, cb) for static component tables."""
        return E[:, ta[:, None], tb[None, :], t]

    def _scatter_pairs(self, per_class_vals):
        nao = self._nao_cart
        out = jnp.zeros(nao * nao, dtype=per_class_vals[0][1].dtype)
        for cls, vals in per_class_vals:
            out = out.at[cls.scatter.reshape(-1)].add(vals.reshape(-1))
        return out.reshape(nao, nao)

    # ------------------------------------------------------------------
    # public integrals (pure functions of coords)
    # ------------------------------------------------------------------
    def overlap(self, coords):
        vals = []
        for cls in self._pairs:
            p, _, E = self._pair_E(coords[cls.atom_a], coords[cls.atom_b],
                                   cls.a, cls.b, cls.la, cls.lb)
            pref = (jnp.pi / p) ** 1.5 * cls.cc
            (ax, ay, az), (bx, by, bz) = _comp_tables(cls.la), _comp_tables(cls.lb)
            block = (self._gather_comp(E[0], ax, bx, 0)
                     * self._gather_comp(E[1], ay, by, 0)
                     * self._gather_comp(E[2], az, bz, 0))
            vals.append((cls, block * pref[:, None, None]))
        return self._to_sph2(self._scatter_pairs(vals))

    def kinetic(self, coords):
        vals = []
        for cls in self._pairs:
            p, _, E = self._pair_E(coords[cls.atom_a], coords[cls.atom_b],
                                   cls.a, cls.b, cls.la, cls.lb, extra=2)
            b = cls.b[:, None, None]
            pref = (jnp.pi / p) ** 1.5 * cls.cc
            (ax, ay, az), (bx, by, bz) = _comp_tables(cls.la), _comp_tables(cls.lb)

            def s_and_k(Ed, ta, tb):
                s0 = self._gather_comp(Ed, ta, tb, 0)
                # j+2 entry always exists (extra=2)
                sp2 = Ed[:, ta[:, None], (tb + 2)[None, :], 0]
                jj = jnp.asarray(tb, dtype=s0.dtype)[None, None, :]
                k = -2.0 * b * b * sp2 + b * (2.0 * jj + 1.0) * s0
                if tb.max() >= 2:
                    # j-2 entry, masked where j < 2
                    tbm2 = np.maximum(tb - 2, 0)
                    sm2 = Ed[:, ta[:, None], tbm2[None, :], 0]
                    mask = (tb >= 2).astype(np.float64)[None, None, :]
                    k = k - 0.5 * jj * (jj - 1.0) * sm2 * mask
                return s0, k

            sx, kx = s_and_k(E[0], ax, bx)
            sy, ky = s_and_k(E[1], ay, by)
            sz, kz = s_and_k(E[2], az, bz)
            block = kx * sy * sz + sx * ky * sz + sx * sy * kz
            vals.append((cls, block * pref[:, None, None]))
        return self._to_sph2(self._scatter_pairs(vals))

    def _E3(self, E, la, lb):
        """Dense bra/ket angular tensor (n, ca, cb, nt, nt, nt) flattened to
        (n, ca*cb, nt^3), nt = la + lb + 1."""
        (ax, ay, az), (bx, by, bz) = _comp_tables(la), _comp_tables(lb)
        Ex = E[0][:, ax[:, None], bx[None, :], :]   # (n, ca, cb, nt)
        Ey = E[1][:, ay[:, None], by[None, :], :]
        Ez = E[2][:, az[:, None], bz[None, :], :]
        E3 = (Ex[..., :, None, None] * Ey[..., None, :, None]
              * Ez[..., None, None, :])
        n, ca, cb = E3.shape[0], E3.shape[1], E3.shape[2]
        return E3.reshape(n, ca * cb, -1)

    def nuclear(self, coords):
        """Nuclear-attraction matrix."""
        Z = jnp.asarray(self.charges)
        vals = []
        for cls in self._pairs:
            p, P, E = self._pair_E(coords[cls.atom_a], coords[cls.atom_b],
                                   cls.a, cls.b, cls.la, cls.lb)
            L = cls.la + cls.lb
            PC = P[:, None, :] - coords[None, :, :]   # (n, natm, 3)
            Rd = hermite_R_dense(L, p[:, None], PC)   # (n, natm, L+1,L+1,L+1)
            ZR = jnp.einsum("c,nctuv->ntuv", Z, Rd).reshape(Rd.shape[0], -1)
            E3 = self._E3(E, cls.la, cls.lb)          # (n, cab, (L+1)^3)
            pref = (2.0 * jnp.pi / p) * cls.cc
            block = jnp.einsum("nbt,nt->nb", E3, ZR)
            ca = (cls.la + 1) * (cls.la + 2) // 2
            cb = (cls.lb + 1) * (cls.lb + 2) // 2
            block = block.reshape(-1, ca, cb)
            vals.append((cls, -block * pref[:, None, None]))
        return self._to_sph2(self._scatter_pairs(vals))

    def hcore(self, coords):
        return self.kinetic(coords) + self.nuclear(coords)

    def dipole(self, coords, origin):
        """Dipole (position) integrals <a| r - origin |b>, shape (3, nao, nao).

        Reference parity: mol.intor_symmetric("int1e_r") with common origin
        (scripts/MD/Zundel_thermodynamics/continuation/
        04_Zundel_continuation_MD.py:81-84).
        """
        origin = jnp.asarray(origin)
        comps = []
        for d_out in range(3):
            vals = []
            for cls in self._pairs:
                p, P, E = self._pair_E(coords[cls.atom_a], coords[cls.atom_b],
                                       cls.a, cls.b, cls.la, cls.lb)
                pref = (jnp.pi / p) ** 1.5 * cls.cc
                XPC = (P[:, d_out] - origin[d_out])[:, None, None]
                (ax, ay, az) = _comp_tables(cls.la)
                (bx, by, bz) = _comp_tables(cls.lb)
                tabs = [(ax, bx), (ay, by), (az, bz)]
                factors = []
                for d in range(3):
                    ta, tb = tabs[d]
                    s0 = self._gather_comp(E[d], ta, tb, 0)
                    if d == d_out:
                        if cls.la + cls.lb >= 1:
                            s1 = self._gather_comp(E[d], ta, tb, 1)
                        else:
                            s1 = jnp.zeros_like(s0)
                        factors.append(s1 + XPC * s0)
                    else:
                        factors.append(s0)
                block = factors[0] * factors[1] * factors[2]
                vals.append((cls, block * pref[:, None, None]))
            comps.append(self._to_sph2(self._scatter_pairs(vals)))
        return jnp.stack(comps)

    def _eri_pair_data(self, coords):
        """Per shell-pair-class data shared between the bra and ket sides of
        every quartet class: Gaussian-product quantities, the combined
        angular tensor E3, and AO-pair scatter offsets. Computed once per
        geometry; quartet classes are formed as (bra pair) x (ket pair)
        products on device (no per-quartet host tables — keeps the XLA
        program free of multi-MB constants and reuses pair work 2 x #classes
        times)."""
        data = []
        for cls in self._upairs:
            p, P, E = self._pair_E(coords[cls.atom_a], coords[cls.atom_b],
                                   cls.a, cls.b, cls.la, cls.lb)
            E3 = self._E3(E, cls.la, cls.lb)           # (n, cab, (L+1)^3)
            # static primitive -> contracted-pair aggregation: instances of
            # one contracted shell pair share the AO-pair offsets, so the
            # contraction over primitives is a small static 0/1 GEMM done
            # BEFORE the nao^4 scatter (measured on TPU: the per-primitive
            # scatter dominated eri() at ~73% of its runtime; aggregating
            # first shrinks the scattered element count by the primitive
            # multiplicity, ~36x for 6-31G s-pairs)
            ao_pair_inst = cls.scatter.reshape(len(cls.a), -1)
            key = ao_pair_inst[:, 0]
            groups, first_idx, ginv = np.unique(
                key, return_index=True, return_inverse=True)
            n1 = len(cls.a)
            agg = np.zeros((len(groups), n1), dtype=np.float32)
            agg[ginv, np.arange(n1)] = 1.0
            data.append({
                "cls": cls, "p": p, "P": P, "E3": E3,
                "cc": jnp.asarray(cls.cc),
                "L": cls.la + cls.lb,
                # flat AO-pair index of each (contracted pair, comp_a,
                # comp_b), plus the primitive-aggregation matrix
                "ao_pair": ao_pair_inst[np.sort(first_idx)],
                "agg": _nofold(agg[np.argsort(first_idx)]),
            })
        return data

    def eri(self, coords, omega=None):
        """Two-electron repulsion integrals (ij|kl), chemist notation,
        full (nao, nao, nao, nao) tensor. With omega, the long-range
        erf-attenuated integrals (ij|erf(omega r12)/r12|kl) used by
        range-separated hybrids (CAM-B3LYP): the Coulomb kernel change
        amounts to F_n(T) -> s^{n+1/2} F_n(sT) with s = w^2/(rho + w^2),
        i.e. the same Hermite-R tensor at a scaled exponent parameter
        times sqrt(s).

        8-fold permutation symmetry: quartets are enumerated over unordered
        bra/ket shell pairs and unordered (bra, ket) class combinations
        (~8x fewer Boys/Hermite evaluations); only the canonical image is
        scattered, and the full tensor is restored by the group sum
        (1 + T1)(1 + T2)(1 + T3) — three transpose-adds — with stabilizer
        weights (0.5 per self-paired factor) pre-folded into the
        coefficients."""
        nao = self._nao_cart
        pairs = self._eri_pair_data(coords)
        ein = self._f64_ein(coords.dtype)
        out = None
        for bi, bra in enumerate(pairs):
            for ket in pairs[bi:]:
                same_class = ket is bra
                p, q = bra["p"], ket["p"]
                alpha = p[:, None] * q[None, :] / (p[:, None] + q[None, :])
                if omega is not None:
                    s_att = omega * omega / (alpha + omega * omega)
                    alpha = alpha * s_att
                L = bra["L"] + ket["L"]
                PQ = bra["P"][:, None, :] - ket["P"][None, :, :]
                Rd = hermite_R_dense(L, alpha, PQ)     # (n1, n2, L+1,L+1,L+1)
                n1, n2 = Rd.shape[0], Rd.shape[1]
                nb3, nk3 = (bra["L"] + 1) ** 3, (ket["L"] + 1) ** 3

                # fold the (-1)^(tau+nu+phi) parity into the ket tensor
                par = np.array([
                    (-1.0) ** (t + u + v)
                    for t, u, v in itertools.product(range(ket["L"] + 1),
                                                     repeat=3)
                ])
                E3k = ket["E3"] * par[None, None, :]

                pref = (2.0 * jnp.pi ** 2.5
                        / (p[:, None] * q[None, :]
                           * jnp.sqrt(p[:, None] + q[None, :])))
                pref = pref * bra["cc"][:, None] * ket["cc"][None, :]
                if omega is not None:
                    pref = pref * jnp.sqrt(s_att)
                if same_class:
                    # the full n1 x n1 grid contains both (P1, P2) orders,
                    # which the (1 + T3) pass would double-count
                    pref = pref * 0.5
                block = _quartet_contract(
                    Rd.reshape(n1, n2, -1), bra["E3"], E3k,
                    _conv_onehot(bra["L"] + 1, ket["L"] + 1, L), nb3, nk3,
                    ein=ein)
                block = block * pref[:, :, None, None]
                # contract primitives -> contracted shell pairs (two small
                # static GEMMs) so the scatter below touches only the
                # contracted elements, not every primitive instance
                if ein is jnp.einsum:
                    block = jnp.einsum("Aa,abij,Bb->ABij",
                                       bra["agg"], block, ket["agg"])
                else:
                    block = ein("Aa,abij->Abij", bra["agg"], block)
                    block = ein("Abij,Bb->ABij", block, ket["agg"])

                # flat nao^4 index from the two small AO-pair offset tables,
                # broadcast on device (host-side broadcasting would embed a
                # multi-MB constant into the XLA program)
                itype = np.int32 if nao ** 4 < 2 ** 31 else np.int64
                bra_idx = jnp.asarray(bra["ao_pair"].astype(itype))
                ket_idx = jnp.asarray(ket["ao_pair"].astype(itype))
                idx = (bra_idx[:, None, :, None] * itype(nao * nao)
                       + ket_idx[None, :, None, :])
                if out is None:
                    out = jnp.zeros(nao ** 4, dtype=block.dtype)
                out = out.at[idx.reshape(-1)].add(block.reshape(-1))
        G = out.reshape(nao, nao, nao, nao)
        G = G + jnp.transpose(G, (2, 3, 0, 1))   # 1 + T3 (bra <-> ket)
        G = G + jnp.transpose(G, (0, 1, 3, 2))   # 1 + T2 (c <-> d)
        G = G + jnp.transpose(G, (1, 0, 2, 3))   # 1 + T1 (a <-> b)
        return self._to_sph4(G)

    def energy_nuc(self, coords):
        Z = jnp.asarray(self.charges)
        diff = coords[:, None, :] - coords[None, :, :]
        dist2 = jnp.sum(diff * diff, axis=-1) + jnp.eye(self.natm)
        inv = (1.0 - jnp.eye(self.natm)) / jnp.sqrt(dist2)
        return 0.5 * jnp.sum(Z[:, None] * Z[None, :] * inv)

    def compute(self, coords):
        """All integrals in one call, as a pytree for downstream jit."""
        return IntegralBundle(
            ovlp=self.overlap(coords),
            hcore=self.hcore(coords),
            eri=self.eri(coords),
            enuc=self.energy_nuc(coords),
        )

    @partial(jax.jit, static_argnums=0)
    def compute_jit(self, coords):
        """Jitted variant of compute (the unrolled recursions make eager
        dispatch prohibitively slow; always prefer this or embed compute()
        in a larger jitted function)."""
        return self.compute(coords)

    def __hash__(self):
        # static structure is fully determined by the molecule identity;
        # the f64-contraction config must participate (engines are jit
        # static args — a hash collision would reuse the wrong kernel)
        return hash((self.mol.symbols, self.mol.basis, self.mol.charge,
                     self.mol.spin, self.f64_contract,
                     getattr(self, "ozaki_depth", (6, 5)),
                     getattr(self, "ozaki_min_elems", 1_000_000)))

    def __eq__(self, other):
        return (isinstance(other, IntegralEngine)
                and self.f64_contract == other.f64_contract
                and getattr(self, "ozaki_depth", (6, 5))
                == getattr(other, "ozaki_depth", (6, 5))
                and getattr(self, "ozaki_min_elems", 1_000_000)
                == getattr(other, "ozaki_min_elems", 1_000_000)
                and self.mol.symbols == other.mol.symbols
                and self.mol.basis == other.mol.basis
                and self.mol.charge == other.mol.charge
                and self.mol.spin == other.mol.spin)
