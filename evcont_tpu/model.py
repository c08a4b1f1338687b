"""ContinuationModel: the device-resident inference engine.

This is the TPU-native replacement for the reference's per-call chain
  get_energy_with_grad / approximate_ground_state_OAO
  (evcont/ab_initio_gradients_loewdin.py:308-379,
   evcont/ab_initio_eigenvector_continuation.py:178-211),
which round-trips Python -> libcint -> NumPy -> scipy for every geometry.

Here the full pipeline — integrals, Löwdin transform, subspace H assembly,
generalized eigensolve, nuclear gradient — is one jitted JAX function of the
nuclear coordinates:

    E(R)        = model.potential(R)
    E, F        = model.potential_and_forces(R)      # F = -dE/dR, autodiff
    E_batch     = model.potential_batch(R_batch)     # vmap over geometries
    E_k(R)      = model.multistate(R, nroots)

Forces come from jax.grad through the whole pipeline; the custom JVPs on
loewdin_trafo (Daleckii-Krein) and lowest_states (Hellmann-Feynman)
reproduce the reference's hand-assembled analytic gradients exactly
(validated against finite differences in tests/test_model_h6.py).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .continuation import (
    approximate_ground_state,
    approximate_multistate,
    oao_integrals,
    predicted_rdms,
    whitening_matrix,
)
from .integrals.engine import IntegralEngine
from .molecule import Molecule


def _npacked(nao):
    return nao * nao * (nao * nao + 1) // 2


class ContinuationModel:
    """Bundles a molecule's integral engine with a t-RDM training set.

    The t-RDM arrays are traced arguments (not compile-time constants), so
    growing the training set only recompiles when the *shapes* change, and
    sharded arrays pass straight through (see parallel/).
    """

    def __init__(self, mol: Molecule, overlap, one_rdm, two_rdm,
                 hermitian=True, assembly_backend="xla",
                 packed_layout="auto", f64_contract="emulated",
                 ozaki_depth=(6, 5), ozaki_min_elems=1_000_000,
                 compress_s8=False):
        self.mol = mol
        # f64_contract="ozaki" routes the f64 contractions of the precise
        # paths (ERI quartet assembly, AO->OAO transform) through exact
        # bf16-digit MXU passes (subspace/ozaki.py) instead of XLA's
        # off-MXU emulated-f64 dots — the precise-throughput engine;
        # "ozaki-selective" routes only contractions with a static
        # operand above ozaki_min_elems (bounds XLA program growth, see
        # IntegralEngine). The f32 paths are unaffected either way.
        self.engine = IntegralEngine(mol, f64_contract=f64_contract,
                                     ozaki_depth=ozaki_depth,
                                     ozaki_min_elems=ozaki_min_elems)
        # packed two-body contraction kernel for 2-d stores:
        # "xla" | "pallas" (subspace/pallas_assembly.py)
        self.assembly_backend = assembly_backend
        self.overlap = jnp.asarray(overlap)
        self.one_rdm = jnp.asarray(one_rdm)
        # exchange-compressed stores are re-sorted once into the RFP slot
        # order so the per-eval packing of h2 is a dense fold instead of an
        # element-serial tril gather (+ scatter in the force VJP) — ~20% of
        # the flagship batched eval (oao.rfp_fold, tpu_stage_profile.py).
        # self.two_rdm is then in RFP order; use two_rdm_tril() for the
        # reference-schema view. "rfp-native" declares the input already in
        # RFP slot order (no conversion — e.g. a store built on device,
        # where the extra copy would double HBM).
        if not hasattr(two_rdm, "ndim"):
            two_rdm = np.asarray(two_rdm)
        npacked_ok = two_rdm.ndim in (2, 3) and \
            two_rdm.shape[-1] == _npacked(self.engine.nao)
        if packed_layout == "auto":
            packed_layout = "rfp" if npacked_ok else "tril"
        if packed_layout in ("rfp", "rfp-native") and not npacked_ok:
            raise ValueError("packed_layout='rfp' requires an "
                             "exchange-compressed two_rdm store")
        if packed_layout == "rfp":
            from .oao import rfp_permutation
            perm = rfp_permutation(self.engine.nao)
            if isinstance(two_rdm, np.ndarray):
                # host-side re-sort: no transient second device copy
                two_rdm = np.take(two_rdm, perm, axis=-1)
            else:
                two_rdm = jnp.take(jnp.asarray(two_rdm),
                                   jnp.asarray(perm), axis=-1)
        elif packed_layout == "rfp-native":
            packed_layout = "rfp"
        if compress_s8:
            # project the exchange-compressed store onto the full 8-fold
            # ERI-symmetry layout (oao.py s8 block): 3.72x fewer bytes per
            # store stream, EXACTLY the same energies/forces (the dropped
            # components are orthogonal to every real-orbital h2). One-time
            # at construction; host path for numpy stores, device row-
            # gather path for device-resident ones.
            from .oao import compress_exchange, store_to_s8
            if not npacked_ok:
                if two_rdm.ndim not in (5, 6):
                    raise ValueError(
                        "compress_s8 requires a two-body t-RDM store "
                        f"(got rank {two_rdm.ndim})")
                # full uncompressed store (backend output): exchange-
                # compress to the tril schema first, then project
                two_rdm = np.asarray(compress_exchange(jnp.asarray(
                    np.asarray(two_rdm, dtype=np.float64))))
                packed_layout = "tril"
            two_rdm = store_to_s8(
                two_rdm if isinstance(two_rdm, np.ndarray)
                else jnp.asarray(two_rdm), self.engine.nao,
                order=packed_layout)
            packed_layout = "s8"
        self.two_rdm = jnp.asarray(two_rdm)
        self.packed_layout = packed_layout
        # convenience for direct users of lowest_states_whitened; the jitted
        # paths below whiten the overlap they are actually *passed* (which
        # may differ from the init-time store, e.g. a pruned subset), so the
        # cached value is never load-bearing
        self.whitening = whitening_matrix(self.overlap)
        # hermitian=False routes the generalized eigensolve through a host
        # scipy.eig callback with the reference's imaginary-eigenvalue
        # filter (ab_initio_eigenvector_continuation.py:78-88); energies
        # and Hellmann-Feynman forces work, on host-callback latency
        self.hermitian = bool(hermitian)

    @classmethod
    def from_backend(cls, mol, backend, **kw):
        return cls(mol, backend.overlap, backend.one_rdm, backend.two_rdm,
                   **kw)

    @classmethod
    def orthonormalized(cls, mol, overlap, one_rdm, two_rdm, **kw):
        """Construct with the training basis S-orthonormalized once in
        f64 (continuation.orthonormalize_store) — the production
        conditioning step: the per-geometry GEP becomes an
        identity-overlap eigensolve, which keeps the f32 throughput path
        accurate on near-singular production training overlaps
        (kappa(S) ~ 2e6 at Zundel-84 collapses the raw f32 solve)."""
        from .continuation import orthonormalize_store
        ov, r1, r2 = orthonormalize_store(overlap, one_rdm, two_rdm)
        return cls(mol, ov, r1, r2, **kw)

    # -- core jitted computations (static self via engine hashing) ----------
    @partial(jax.jit, static_argnums=0)
    def _energy(self, coords, overlap, one_rdm, two_rdm):
        return self._energy_raw(coords, overlap, one_rdm, two_rdm)

    @partial(jax.jit, static_argnums=0)
    def _energy_and_grad(self, coords, overlap, one_rdm, two_rdm):
        def f(c):
            return self._energy_raw(c, overlap, one_rdm, two_rdm)
        return jax.value_and_grad(f)(coords)

    def _energy_raw(self, coords, overlap, one_rdm, two_rdm):
        h1, h2, enuc = oao_integrals(self.engine, coords)
        en, _ = approximate_ground_state(
            h1, h2, one_rdm, two_rdm, overlap, hermitian=self.hermitian,
            two_body_backend=self.assembly_backend,
            packed_layout=self.packed_layout)
        return en + enuc

    @partial(jax.jit, static_argnums=0)
    def _energy_batch(self, coords_batch, overlap, one_rdm, two_rdm):
        return jax.vmap(
            lambda c: self._energy_raw(c, overlap, one_rdm, two_rdm)
        )(coords_batch)

    @partial(jax.jit, static_argnums=(0, 5))
    def _energy_and_grad_batch(self, coords_batch, overlap, one_rdm,
                               two_rdm, chunk=None):
        def f(c):
            return self._energy_raw(c, overlap, one_rdm, two_rdm)
        body = jax.vmap(jax.value_and_grad(f))
        B = coords_batch.shape[0]
        if chunk is None or chunk >= B:
            return body(coords_batch)
        # chunked dispatch (lax.map over chunk-sized vmapped bodies): the
        # peak HBM footprint stays at the chunk's size while one dispatch
        # still amortizes launch overhead over the whole batch — this is
        # what lets the probe ladder reach batch 128 at the Zundel-84
        # flagship store (a fused 128-wide vmap of the eri+assembly
        # graph OOMs the chip)
        assert B % chunk == 0, (B, chunk)
        cb = coords_batch.reshape((B // chunk, chunk)
                                  + coords_batch.shape[1:])
        e, g = jax.lax.map(body, cb)
        return e.reshape(B), g.reshape((B,) + coords_batch.shape[1:])

    @partial(jax.jit, static_argnums=(0, 2))
    def _multistate(self, coords, nroots, overlap, one_rdm, two_rdm):
        h1, h2, enuc = oao_integrals(self.engine, coords)
        en, vecs = approximate_multistate(h1, h2, one_rdm, two_rdm, overlap,
                                          nroots=nroots,
                                          hermitian=self.hermitian,
                                          packed_layout=self.packed_layout)
        return en + enuc, vecs

    @partial(jax.jit, static_argnums=(0, 2))
    def _multistate_and_grad(self, coords, nroots, overlap, one_rdm,
                             two_rdm):
        def energies(c):
            h1, h2, enuc = oao_integrals(self.engine, c)
            en, _ = approximate_multistate(h1, h2, one_rdm, two_rdm,
                                           overlap, nroots=nroots,
                                           hermitian=self.hermitian,
                                           packed_layout=self.packed_layout)
            return en + enuc
        en = energies(coords)
        grads = jax.jacrev(energies)(coords)   # (nroots, natm, 3)
        return en, grads

    @partial(jax.jit, static_argnums=0)
    def _state(self, coords, overlap, one_rdm, two_rdm):
        """Energy, subspace eigenvector, and predicted RDMs (for
        observables; reference: return_density_matrices=True in
        get_energy_with_grad, ab_initio_gradients_loewdin.py:308-373)."""
        h1, h2, enuc = oao_integrals(self.engine, coords)
        en, vec = approximate_ground_state(h1, h2, one_rdm, two_rdm, overlap,
                                           hermitian=self.hermitian,
                                           packed_layout=self.packed_layout)
        rdm1, rdm2 = predicted_rdms(vec, one_rdm, two_rdm, self.engine.nao,
                                    packed_layout=self.packed_layout)
        return en + enuc, vec, rdm1, rdm2

    # -- public API ----------------------------------------------------------
    def potential(self, coords):
        """Total energy at a geometry (Bohr)."""
        return self._energy(jnp.asarray(coords), self.overlap,
                            self.one_rdm, self.two_rdm)

    def potential_and_forces(self, coords):
        """(E, F) with F = -dE/dR, fully on device."""
        e, g = self._energy_and_grad(jnp.asarray(coords), self.overlap,
                                     self.one_rdm, self.two_rdm)
        return e, -g

    def potential_batch(self, coords_batch):
        """Energies for a batch of geometries (vmapped; the TPU throughput
        path for PES scans and trajectory re-prediction)."""
        return self._energy_batch(jnp.asarray(coords_batch), self.overlap,
                                  self.one_rdm, self.two_rdm)

    def potential_and_forces_batch(self, coords_batch, chunk=None):
        """chunk: process the batch in lax.map sub-batches of this size
        inside one dispatch — HBM stays at the chunk's footprint, so
        batches beyond the fused-vmap OOM point (128 at the Zundel-84
        store) still run. B must be a chunk multiple."""
        e, g = self._energy_and_grad_batch(
            jnp.asarray(coords_batch), self.overlap, self.one_rdm,
            self.two_rdm, chunk)
        return e, -g

    def multistate(self, coords, nroots=1):
        """Lowest nroots total energies and subspace eigenvectors."""
        return self._multistate(jnp.asarray(coords), nroots, self.overlap,
                                self.one_rdm, self.two_rdm)

    def multistate_and_forces(self, coords, nroots=1):
        """Per-root (E_k, F_k) with F_k = -dE_k/dR — excited-state forces
        via the per-root Hellmann-Feynman derivative."""
        en, g = self._multistate_and_grad(jnp.asarray(coords), nroots,
                                          self.overlap, self.one_rdm,
                                          self.two_rdm)
        return en, -g

    def state(self, coords):
        """(E, subspace vector, predicted 1-RDM, predicted 2-RDM in OAO)."""
        return self._state(jnp.asarray(coords), self.overlap, self.one_rdm,
                           self.two_rdm)

    # -- compensated-precision path (f32 TPU hardware, see
    #    subspace/compensated.py for the error model) -----------------------
    def enable_compensated(self, store_f64_one_rdm=None,
                           store_f64_two_rdm=None):
        """Prepare double-f32 split stores for potential_compensated().

        Pass the original f64 arrays when available (full or
        pair-compressed layouts). Without them, the model's own store is
        used: if it is already f32 AND pair-compressed, its values are
        taken as exact (lo = None — no host fetch, no extra HBM), so the
        compensation fixes accumulation error only."""
        from .continuation import to_pair_layout
        from .subspace.compensated import split_two_float

        if store_f64_one_rdm is None and store_f64_two_rdm is None \
                and self.one_rdm.dtype == jnp.float32 \
                and self.one_rdm.ndim == 3:
            self._comp_r1 = (self.one_rdm, None)
            self._comp_r2 = (self.two_rdm, None)
            return self
        r1 = np.asarray(store_f64_one_rdm if store_f64_one_rdm is not None
                        else self.one_rdm, dtype=np.float64)
        r2 = np.asarray(store_f64_two_rdm if store_f64_two_rdm is not None
                        else self.two_rdm, dtype=np.float64)
        if r1.ndim == 4:
            r1, r2 = to_pair_layout(r1, r2)
        if store_f64_two_rdm is not None:
            # externally provided stores use the reference tril slot order;
            # re-sort/project to match the model's internal layout
            if self.packed_layout == "rfp":
                from .oao import rfp_permutation
                r2 = np.take(r2, rfp_permutation(self.engine.nao), axis=-1)
            elif self.packed_layout == "s8":
                from .oao import store_to_s8
                r2 = store_to_s8(r2, self.engine.nao, order="tril")
        self._comp_r1 = tuple(jnp.asarray(a) for a in split_two_float(r1))
        self._comp_r2 = tuple(jnp.asarray(a) for a in split_two_float(r2))
        return self

    @partial(jax.jit, static_argnums=0)
    def _energy_compensated(self, coords, r1_hi, r1_lo, r2_hi, r2_lo,
                            overlap):
        from .continuation import _unpack_pairs, packed_fold
        from .subspace.compensated import (compensated_pair_assembly,
                                           rayleigh_refined_ground_state)

        pack = packed_fold(self.packed_layout)
        h1, h2, enuc = oao_integrals(self.engine, coords)
        h2c = pack(h2, diag_multiplier=0.5)
        H_hi, H_lo = compensated_pair_assembly(
            r1_hi, r1_lo, r2_hi, r2_lo, h1, h2c, mode="exact")
        ntrain = overlap.shape[0]
        Hfull_hi = _unpack_pairs(H_hi, ntrain, H_hi.dtype)
        Hfull_lo = _unpack_pairs(H_lo, ntrain, H_lo.dtype)
        X = whitening_matrix(overlap)
        A = X.T @ Hfull_hi @ X
        w, Y = jnp.linalg.eigh(0.5 * (A + A.T))
        vec = (X @ Y)[:, 0]
        en = rayleigh_refined_ground_state(Hfull_hi, Hfull_lo, overlap, vec)
        return en + enuc

    def potential_compensated(self, coords):
        """Ground-state energy through the compensated f32 assembly +
        Rayleigh-refined GEP (call enable_compensated() first)."""
        if not hasattr(self, "_comp_r1"):
            self.enable_compensated()
        return self._energy_compensated(
            jnp.asarray(coords), *self._comp_r1, *self._comp_r2,
            self.overlap)

    # -- full-precision path: emulated-f64 integrals + error-free f32
    #    assembly (requires jax_enable_x64) --------------------------------
    def _precise_total_energy_fn(self, r1_hi, r1_lo, r2_hi, r2_lo,
                                 overlap64, mode="exact", kblock=8192):
        """The shared emulated-f64 energy body for the precise paths.

        mode selects the error-free store contraction kernel
        (subspace/compensated.py): "exact" (TwoProd + exact summation,
        VPU-bound — f64-class, the single-geometry accuracy mode) or
        "compensated" (MXU matmuls with chunked two-float combine,
        ~5e-9 relative — the batched throughput mode, where vmap turns
        the per-geometry contractions into one GEMM streaming the store
        once per batch)."""
        from .continuation import (_unpack_pairs, ground_state_polished,
                                   pair_compression_maps, packed_fold)
        from .subspace.compensated import (compensated_pair_assembly,
                                           split_two_float_device)
        sg = jax.lax.stop_gradient
        f64 = jnp.float64
        pack = packed_fold(self.packed_layout)

        def total_energy(c):
            # f64 integral pipeline (XLA-emulated f64 on TPU is genuinely
            # double precision for every primitive except eigh, which the
            # Newton-Schulz-refined Loewdin transform repairs)
            h1, h2, enuc = oao_integrals(self.engine, c,
                                         refine_loewdin=True)
            h2c = pack(h2, diag_multiplier=0.5)

            # hybrid assembly: the multi-GB t-RDM store stays f32 and is
            # contracted with error-free TwoProd/TwoSum arithmetic (keeping
            # HBM and bandwidth at f32 cost); the tiny (ntrain, ntrain)
            # result is then exact at f64 level
            h1s = split_two_float_device(sg(h1))
            h2s = split_two_float_device(sg(h2c))
            H_hi, H_lo = compensated_pair_assembly(
                r1_hi, r1_lo, r2_hi, r2_lo, h1s, h2s, mode=mode,
                kblock=kblock)
            ntrain = overlap64.shape[0]
            H = _unpack_pairs(H_hi.astype(f64), ntrain, f64) \
                + _unpack_pairs(H_lo.astype(f64), ntrain, f64)

            # GEP vector via the polished solve (repairs the TPU f64
            # eigh's vector error, which the near-singular training
            # overlap otherwise amplifies); energy from the Rayleigh
            # quotient with the exact H — second order in any remaining
            # vector error. Everything here is constant w.r.t. coords.
            vec = sg(ground_state_polished(sg(H), overlap64))
            e_val = (vec @ H @ vec) / (vec @ overlap64 @ vec)

            # gradient path: generalized Hellmann-Feynman — E is linear in
            # (h1, h2c) at fixed predicted RDMs, so the force flows through
            # the f64 integral pipeline only (never backward through the
            # 4-GiB store contraction)
            w = 2.0 * jnp.outer(vec, vec)
            w = w - 0.5 * jnp.diag(jnp.diag(w))
            rows, cols = pair_compression_maps(ntrain)
            wp = sg(w[rows, cols]).astype(jnp.float32)
            g1 = jnp.tensordot(wp, r1_hi, axes=1).astype(f64)
            g2 = (wp @ r2_hi).astype(f64)
            if r1_lo is not None:
                g1 = g1 + jnp.tensordot(wp, r1_lo, axes=1).astype(f64)
            if r2_lo is not None:
                g2 = g2 + (wp @ r2_lo).astype(f64)
            norm = vec @ overlap64 @ vec
            e_lin = (jnp.vdot(sg(g1), h1) + jnp.vdot(sg(g2), h2c)) / norm
            # value = exact Rayleigh quotient; gradient = d(e_lin)/dR
            return e_val + enuc + (e_lin - sg(e_lin))

        return total_energy

    @partial(jax.jit, static_argnums=0)
    def _ef_precise(self, coords, r1_hi, r1_lo, r2_hi, r2_lo, overlap64):
        total_energy = self._precise_total_energy_fn(
            r1_hi, r1_lo, r2_hi, r2_lo, overlap64, mode="exact")
        return jax.value_and_grad(total_energy)(coords)

    @partial(jax.jit, static_argnums=(0, 7, 8))
    def _ef_precise_batch(self, coords_batch, r1_hi, r1_lo, r2_hi, r2_lo,
                          overlap64, mode, chunk=None):
        total_energy = self._precise_total_energy_fn(
            r1_hi, r1_lo, r2_hi, r2_lo, overlap64, mode=mode,
            kblock=1024 if mode == "exact" else 8192)
        body = jax.vmap(jax.value_and_grad(total_energy))
        B = coords_batch.shape[0]
        if chunk is None or chunk >= B:
            return body(coords_batch)
        # chunked dispatch: lax.map keeps the compiled program at the
        # chunk's footprint regardless of B — the emulated-f64 pipeline's
        # program is large enough that big fused batches can exhaust the
        # (remote) compiler, while chunk-sized bodies are known-good
        assert B % chunk == 0, (B, chunk)
        cb = coords_batch.reshape((B // chunk, chunk)
                                  + coords_batch.shape[1:])
        e, g = jax.lax.map(body, cb)
        return e.reshape(B), g.reshape((B,) + coords_batch.shape[1:])

    def potential_and_forces_precise(self, coords):
        """(E, F) at full f64 accuracy on f32 hardware: emulated-f64
        integrals/Loewdin/transform (small per-geometry tensors), exact
        two-float contraction over the f32-resident t-RDM store (no f64
        HBM cost for the multi-GB store), f64 GEP with Rayleigh-refined
        energy, and Hellmann-Feynman forces through the f64 pipeline.

        Requires jax_enable_x64 (raises otherwise). This is the accuracy
        mode matching the reference's CPU-f64 numerics (BASELINE.json
        north star: 1e-8 Ha / 1e-6 Ha/Bohr); the plain f32 path remains
        the throughput mode."""
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "potential_and_forces_precise requires jax_enable_x64 "
                "(set jax.config.update('jax_enable_x64', True) at startup)")
        if not hasattr(self, "_comp_r1"):
            self.enable_compensated()
        overlap64 = jnp.asarray(np.asarray(self.overlap, dtype=np.float64))
        e, g = self._ef_precise(
            jnp.asarray(coords, dtype=jnp.float64), *self._comp_r1,
            *self._comp_r2, overlap64)
        return e, -g

    def potential_and_forces_precise_batch(self, coords_batch,
                                           mode="compensated", chunk=None):
        """Batched (E, F) at near-f64 accuracy on f32 hardware — the
        precise-mode throughput path closing the round-2 split between
        "accurate" and "fast" (VERDICT r2). vmap turns every per-geometry
        store contraction into a single GEMM streaming the multi-GB t-RDM
        store once per batch, and batching amortizes the emulated-f64
        integral pipeline across the MXU.

        mode: "compensated" (MXU, chunked two-float accumulation — the
        default throughput rung) or "exact" (TwoProd/TwoSum, VPU-bound,
        strictly f64-class; slower and memory-heavier under vmap).
        chunk: when set, the batch is processed in lax.map sub-batches of
        this size inside ONE dispatch — the compiled program stays at the
        chunk's footprint, so arbitrarily large batches amortize dispatch
        overhead without growing the (remote) compile.
        Requires jax_enable_x64."""
        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "potential_and_forces_precise_batch requires jax_enable_x64")
        if not hasattr(self, "_comp_r1"):
            self.enable_compensated()
        overlap64 = jnp.asarray(np.asarray(self.overlap, dtype=np.float64))
        cb = np.asarray(coords_batch, dtype=np.float64)
        B = cb.shape[0]
        if chunk is not None and B % chunk != 0:
            pad = (-B) % chunk
            cb = np.concatenate([cb, np.repeat(cb[-1:], pad, axis=0)])
        e, g = self._ef_precise_batch(
            jnp.asarray(cb), *self._comp_r1,
            *self._comp_r2, overlap64, mode, chunk)
        return e[:B], -g[:B]

    def potential_and_forces_precise_sharded(self, coords_batch, mesh,
                                             mode="exact"):
        """Data-parallel precise batch over a device mesh: geometries
        sharded over the mesh's "data" axis, the two-float store and the
        training overlap replicated per device (the Zundel-84 split store
        is ~8 GiB f32 hi+lo — within one v5e chip's HBM). Batched PES is
        embarrassingly parallel over geometries, so throughput scales
        linearly with the data axis and the north-star hardware (a v5e-8
        slice, BASELINE.json) delivers 8x the single-chip precise rate at
        unchanged accuracy. Per-device batch = B / mesh.shape["data"];
        keep it at the known-good single-chip size (4-8)."""
        from .parallel.mesh import batch_sharding, replicated

        if not jax.config.jax_enable_x64:
            raise RuntimeError(
                "potential_and_forces_precise_sharded requires "
                "jax_enable_x64")
        if not hasattr(self, "_comp_r1"):
            self.enable_compensated()
        n_data = mesh.shape["data"]
        cb = np.asarray(coords_batch, dtype=np.float64)
        B = cb.shape[0]
        if B % n_data != 0:
            pad = (-B) % n_data
            cb = np.concatenate([cb, np.repeat(cb[-1:], pad, axis=0)])
        rep = replicated(mesh)

        def put(x):
            return None if x is None else jax.device_put(x, rep)

        overlap64 = jax.device_put(
            np.asarray(self.overlap, dtype=np.float64), rep)
        cb = jax.device_put(cb, batch_sharding(mesh))
        e, g = self._ef_precise_batch(
            cb, *(put(x) for x in self._comp_r1),
            *(put(x) for x in self._comp_r2), overlap64, mode, None)
        return e[:B], -g[:B]

    def two_rdm_tril(self, strict=False):
        """The two-body store in the reference's tril slot order
        (electron_integral_utils.py:38-66 schema) regardless of the
        internal layout — use for file export/interop.

        With the s8 layout, the export carries the 8-fold-SYMMETRIZED
        values: energies against any real-orbital h2 are identical, but
        the export is NOT bitwise-identical to the unsymmetrized store
        the model was constructed from. Pass strict=True to refuse that
        lossy export (raises ValueError) when a consumer expects a
        bitwise round-trip."""
        if self.packed_layout == "s8":
            if strict:
                raise ValueError(
                    "two_rdm_tril(strict=True): the s8 layout stores only "
                    "the 8-fold-symmetrized 2-RDM projection; a bitwise "
                    "round-trip of the original store is not possible. "
                    "Construct the model with compress_s8=False for "
                    "bitwise export parity.")
            # the s8 store is the 8-fold-symmetric projection; export the
            # symmetrized values in the reference slot order (identical
            # energies against any real-orbital h2)
            from .oao import s8_to_tril_maps
            idx, w = s8_to_tril_maps(self.engine.nao)
            return jnp.take(self.two_rdm, jnp.asarray(idx), axis=-1) \
                * jnp.asarray(w, dtype=self.two_rdm.dtype)
        if self.packed_layout != "rfp":
            return self.two_rdm
        from .oao import rfp_permutation
        inv = np.argsort(rfp_permutation(self.engine.nao))
        return jnp.take(self.two_rdm, jnp.asarray(inv), axis=-1)

    # convenience for the MD / active-learning drivers
    def energy_fn(self):
        ov, r1, r2 = self.overlap, self.one_rdm, self.two_rdm
        engine = self.engine
        hermitian = self.hermitian
        layout = self.packed_layout

        def f(coords):
            h1, h2, enuc = oao_integrals(engine, coords)
            en, _ = approximate_ground_state(h1, h2, r1, r2, ov,
                                             hermitian=hermitian,
                                             packed_layout=layout)
            return en + enuc
        return f

    def energy_fn_with_store_krylov(self, k=8, init_coords=None,
                                    small="eigh", sweeps=3):
        """(f, store, y0) for warm-started serial MD scans:
        f(coords, y, one_rdm, two_rdm) -> (E, y_new) where y is the
        whitened subspace ground-state vector carried through the scan.
        Per step the eigensolve is replaced by a k-dimensional Krylov /
        Rayleigh-Ritz refinement at the previous step's vector
        (continuation.krylov_ground_state_refine) and the energy is the
        Rayleigh quotient at the stop-gradient refined vector — forces
        are generalized Hellmann-Feynman, so jax.grad through f's energy
        output needs no eigenvector tangents. Measured round 5: the
        eigh(ntrain) + eigenvector-JVP machinery is ~half the 9 ms
        serial step at Zundel-84.

        y0 is the exact whitened ground-state vector at init_coords
        (default: the molecule's equilibrium coords), computed once with
        the standard eigensolve."""
        from .continuation import krylov_ground_state_refine

        engine = self.engine
        layout = self.packed_layout
        X = self.whitening          # geometry-independent: computed once

        def f(coords, y, one_rdm, two_rdm):
            h1, h2, enuc = oao_integrals(engine, coords)
            from .continuation import assemble_hamiltonian
            H = assemble_hamiltonian(h1, h2, one_rdm, two_rdm,
                                     packed_layout=layout,
                                     ntrain=X.shape[0])
            A = X.T @ H @ X
            y_new = krylov_ground_state_refine(0.5 * (A + A.T), y, k,
                                               small=small, sweeps=sweeps)
            y_sg = jax.lax.stop_gradient(y_new)
            return (y_sg @ A @ y_sg) + enuc, y_new

        c0 = np.asarray(self.mol.coords if init_coords is None
                        else init_coords)

        # jitted init (store as TRACED args, never captured constants —
        # see energy_fn_with_store): eager dispatch of the integral
        # pipeline through the axon tunnel costs ~12 min vs ~90 s for
        # one jit compile (measured, tpu_krylov_ab_slim.py round 5)
        def _init(c0j, ov, r1, r2):
            h1, h2, _ = oao_integrals(engine, c0j)
            _, vec = approximate_ground_state(
                h1, h2, r1, r2, ov, hermitian=True, packed_layout=layout)
            # whitened coordinates of the S-normalized eigenvector:
            # v = X y
            y0, *_ = jnp.linalg.lstsq(X, vec)
            return y0 / jnp.linalg.norm(y0)

        y0 = jax.jit(_init)(
            jnp.asarray(c0, dtype=self.one_rdm.dtype), self.overlap,
            self.one_rdm, self.two_rdm)
        return f, (self.one_rdm, self.two_rdm), y0

    def energy_fn_with_store(self):
        """(f(coords, overlap, one_rdm, two_rdm), store) — the parametric
        form for jitted drivers. The multi-GB t-RDM store must enter jit
        as a TRACED ARGUMENT, never as a closure constant: captured
        constants are embedded in the lowered program, which multiplies
        host memory and breaks the remote-compile transport on axon
        (measured: a 4.4 GiB captured store kills the compile RPC)."""
        engine = self.engine
        hermitian = self.hermitian
        layout = self.packed_layout

        def f(coords, overlap, one_rdm, two_rdm):
            h1, h2, enuc = oao_integrals(engine, coords)
            en, _ = approximate_ground_state(h1, h2, one_rdm, two_rdm,
                                             overlap, hermitian=hermitian,
                                             packed_layout=layout)
            return en + enuc
        return f, (self.overlap, self.one_rdm, self.two_rdm)
