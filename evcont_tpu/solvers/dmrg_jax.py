"""Device-resident two-site DMRG sweeps (jitted JAX).

The numpy MPS solver in solvers/dmrg.py plays block2's training-oracle
role (reference: evcont/converge_dmrg.py, evcont/DMRG_EVCont.py) on the
host. This module ports the sweep inner loop — the effective-Hamiltonian
Lanczos solve, the two-site SVD truncation, and the environment updates,
i.e. all of the solver's FLOPs — to jitted JAX so DMRG training runs on
the accelerator:

  * every MPS/MPO/environment tensor is padded to static shapes
    (bond dim m for the MPS, D for the MPO). Zero padding is exact: the
    padded rows/columns only ever multiply zeros, and the SVD truncation
    keeps the top-m singular directions of the physical block.
  * one full left->right + right->left sweep is two lax.scans whose
    carry is the (n_sites, m, 2, m) MPS stack plus the (n_sites+1,
    m, D, m) left/right environment stacks — no host round-trips inside
    a sweep.
  * the local eigensolve is a fixed-k Lanczos with full
    reorthogonalization (static iteration count; the tridiagonal eigh is
    a (k, k) host-free jnp.linalg.eigh).
  * dtype follows jax_enable_x64: f64 on CPU test meshes, f32 (with
    highest matmul precision) on TPU.

The rung ladder / noise schedule / logging stay in the host driver
(solvers/dmrg.converge_dmrg semantics); this module is the device kernel
for one sweep. Correctness is pinned against the numpy solver and exact
FCI in tests/test_dmrg_jax.py.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .dmrg import (_hf_product_mps, build_hamiltonian_mpo_fast,
                   mpo_add, mpo_compress, mpo_expectation,
                   number_penalty_mpo)


def pad_mpo(W, D=None):
    """Stack a ragged-bond MPO into one (n, D, D, 2, 2) array (zero
    padding; boundary bonds sit in the leading slot)."""
    D = D or max(max(w.shape[0], w.shape[1]) for w in W)
    n = len(W)
    out = np.zeros((n, D, D, 2, 2))
    for i, w in enumerate(W):
        out[i, :w.shape[0], :w.shape[1]] = w
    return out


def pad_mps(mps, m):
    """Stack a ragged-bond MPS into one (n, m, 2, m) array."""
    n = len(mps)
    out = np.zeros((n, m, 2, m))
    for i, t in enumerate(mps):
        if t.shape[0] > m or t.shape[2] > m:
            raise ValueError("MPS bond exceeds the padded dimension")
        out[i, :t.shape[0], :, :t.shape[2]] = t
    return out


def _matvec(L, W1, W2, R, th):
    """Effective two-site Hamiltonian action.
    L (a,b,c)  th (c,y,z,f)  W1 (b,g,x,y)  W2 (g,h,u,z)  R (d,h,f)
    -> (a,x,u,d)."""
    T = jnp.einsum("abc,cyzf->abyzf", L, th)
    T = jnp.einsum("abyzf,bgxy->agxzf", T, W1)
    T = jnp.einsum("agxzf,ghuz->ahxuf", T, W2)
    return jnp.einsum("ahxuf,dhf->axud", T, R)


def _lanczos_ground(L, W1, W2, R, th0, k):
    """Ground state of the effective Hamiltonian by k-step Lanczos with
    full reorthogonalization. th0 must be (approximately) normalized and
    inside the physical (non-padded) subspace, which the Krylov iteration
    then never leaves."""
    shape = th0.shape
    v0 = th0 / jnp.maximum(jnp.linalg.norm(th0), 1e-30)
    V = jnp.zeros((k,) + shape, dtype=th0.dtype).at[0].set(v0)
    alpha = jnp.zeros((k,), dtype=th0.dtype)
    beta = jnp.zeros((k,), dtype=th0.dtype)

    def body(j, carry):
        V, alpha, beta = carry
        v = V[j]
        w = _matvec(L, W1, W2, R, v)
        a = jnp.vdot(v, w)
        alpha = alpha.at[j].set(a.real)
        # full reorthogonalization against every stored vector
        proj = jnp.einsum("kabcd,abcd->k", V, w)
        w = w - jnp.einsum("k,kabcd->abcd", proj, V)
        proj = jnp.einsum("kabcd,abcd->k", V, w)
        w = w - jnp.einsum("k,kabcd->abcd", proj, V)
        b = jnp.linalg.norm(w)
        beta = beta.at[j].set(b)
        v_next = w / jnp.maximum(b, 1e-30)
        V = jax.lax.cond(
            j + 1 < k, lambda V: V.at[j + 1].set(v_next), lambda V: V, V)
        return V, alpha, beta

    V, alpha, beta = jax.lax.fori_loop(0, k, body, (V, alpha, beta))
    T = (jnp.diag(alpha) + jnp.diag(beta[:-1], 1) + jnp.diag(beta[:-1], -1))
    evals, evecs = jnp.linalg.eigh(T)
    u = evecs[:, 0]
    th = jnp.einsum("k,kabcd->abcd", u, V)
    th = th / jnp.maximum(jnp.linalg.norm(th), 1e-30)
    return evals[0], th


def _split_truncate(th, m, noise, key):
    """SVD-truncate a two-site block th (m,2,2,m) back to bond dim m.
    Returns (U (m,2,m), SV (m,2,m), discarded weight)."""
    if noise is not None:
        # confine the noise to the live bond slots: padded rows/cols must
        # stay exactly zero for the static-shape contraction to be exact
        row = (jnp.sum(th * th, axis=(1, 2, 3)) > 0).astype(th.dtype)
        col = (jnp.sum(th * th, axis=(0, 1, 2)) > 0).astype(th.dtype)
        mask = row[:, None, None, None] * col[None, None, None, :]
        # float(): a np.float64 scalar is strongly typed and would
        # silently promote the f32 sweep to f64 on x64-enabled hosts
        th = th + noise * mask * jax.random.normal(key, th.shape, th.dtype) \
            * jnp.linalg.norm(th) / float(np.sqrt(th.size))
    mm = th.shape[0]
    mat = th.reshape(mm * 2, 2 * mm)
    U, s, Vt = jnp.linalg.svd(mat, full_matrices=False)
    tot = jnp.maximum(jnp.sum(s * s), 1e-300)
    dw = jnp.sum(s[m:] * s[m:]) / tot
    U, s, Vt = U[:, :m], s[:m], Vt[:m]
    s = s / jnp.maximum(jnp.linalg.norm(s), 1e-30)
    return U.reshape(mm, 2, m), s, Vt.reshape(m, 2, mm), dw


def _advance_left(Lenv, A, W):
    """L (a,b,c) with ket A (c,y,f), mpo W (b,e,x,y), bra conj(A) (a,x,d)
    -> (d,e,f)."""
    T = jnp.einsum("abc,cyf->abyf", Lenv, A)
    T = jnp.einsum("abyf,bexy->aexf", T, W)
    return jnp.einsum("aexf,axd->def", T, jnp.conj(A))


def _advance_right(Renv, A, W):
    """R (d,e,f) closing sites right of A -> (a,b,c) including A's site."""
    T = jnp.einsum("cyf,def->cyde", A, Renv)
    T = jnp.einsum("bexy,cyde->bxcd", W, T)
    return jnp.einsum("axd,bxcd->abc", jnp.conj(A), T)


@partial(jax.jit, static_argnames=("m", "k", "n_sites"))
def _sweep_jit(A, Lenv, Renv, Wmpo, noise, key, m, k, n_sites):
    """One full L->R + R->L two-site sweep; returns the updated stacks and
    the last local energy / max discarded weight."""

    def step_lr(carry, i):
        A, Lenv, Renv, key = carry
        th0 = jnp.einsum("axb,byc->axyc", A[i], A[i + 1])
        e0, th = _lanczos_ground(Lenv[i], Wmpo[i], Wmpo[i + 1],
                                 Renv[i + 2], th0, k)
        key, sub = jax.random.split(key)
        U, s, Vt, dw = _split_truncate(th, m, noise, sub)
        A = A.at[i].set(U)
        A = A.at[i + 1].set(jnp.einsum("a,ayc->ayc", s, Vt))
        Lenv = Lenv.at[i + 1].set(_advance_left(Lenv[i], A[i], Wmpo[i]))
        return (A, Lenv, Renv, key), (e0, dw)

    def step_rl(carry, i):
        A, Lenv, Renv, key = carry
        th0 = jnp.einsum("axb,byc->axyc", A[i], A[i + 1])
        e0, th = _lanczos_ground(Lenv[i], Wmpo[i], Wmpo[i + 1],
                                 Renv[i + 2], th0, k)
        key, sub = jax.random.split(key)
        U, s, Vt, dw = _split_truncate(th, m, noise, sub)
        A = A.at[i].set(jnp.einsum("axb,b->axb", U, s))
        A = A.at[i + 1].set(Vt)
        Renv = Renv.at[i + 1].set(
            _advance_right(Renv[i + 2], A[i + 1], Wmpo[i + 1]))
        return (A, Lenv, Renv, key), (e0, dw)

    carry = (A, Lenv, Renv, key)
    carry, (e_l, dw_l) = jax.lax.scan(step_lr, carry,
                                      jnp.arange(n_sites - 1))
    carry, (e_r, dw_r) = jax.lax.scan(step_rl, carry,
                                      jnp.arange(n_sites - 2, -1, -1))
    A, Lenv, Renv, key = carry
    dw_max = jnp.maximum(jnp.max(dw_l), jnp.max(dw_r))
    return A, Lenv, Renv, e_r[-1], dw_max


@partial(jax.jit, static_argnames=("n_sites",))
def _expectation_jit(A, Wmpo, n_sites):
    D = Wmpo.shape[1]
    m = A.shape[1]
    E = jnp.zeros((m, D, m)).at[0, 0, 0].set(1.0)

    def body(E, i):
        return _advance_left(E, A[i], Wmpo[i]), None

    E, _ = jax.lax.scan(body, E, jnp.arange(n_sites))
    return E[0, 0, 0]


@partial(jax.jit, static_argnames=("n_sites",))
def _norm_jit(A, n_sites):
    m = A.shape[1]
    E = jnp.zeros((m, m)).at[0, 0].set(1.0)

    def body(E, i):
        T = jnp.einsum("ac,cyf->ayf", E, A[i])
        return jnp.einsum("ayf,ayd->df", T, jnp.conj(A[i])), None

    E, _ = jax.lax.scan(body, E, jnp.arange(n_sites))
    return E[0, 0]


class DeviceDMRG:
    """Device-resident DMRG state: padded MPS + environments, jitted
    sweeps. Mirrors the numpy solver's two-site algorithm at a fixed
    padded bond dimension (rung ladders re-pad between rungs)."""

    def __init__(self, W, n_sites, m, n_elec=None, sz=0.0, mps0=None,
                 dtype=None):
        self.n_sites = n_sites
        self.m = m
        if dtype is None:
            dtype = jnp.float64 if jax.config.jax_enable_x64 \
                else jnp.float32
        self.dtype = dtype
        if mps0 is None:
            mps0 = _hf_product_mps(n_sites, n_elec, sz)
        self.W_list = W
        self.Wmpo = jnp.asarray(pad_mpo(W), dtype=dtype)
        A = pad_mps(mps0, m)
        D = self.Wmpo.shape[1]
        Lenv = np.zeros((n_sites + 1, m, D, m))
        Lenv[0, 0, 0, 0] = 1.0
        self.A = jnp.asarray(A, dtype=dtype)
        self.Lenv = jnp.asarray(Lenv, dtype=dtype)
        self.Renv = None          # built on device below
        self._rebuild_right_envs()

    def _rebuild_right_envs(self):
        """Recompute every right environment from the current MPS (one
        device pass); left envs are rebuilt incrementally by the sweep."""
        n, m = self.n_sites, self.m
        D = self.Wmpo.shape[1]

        @partial(jax.jit, static_argnames=())
        def build(A, Wmpo):
            R0 = jnp.zeros((m, D, m), self.dtype).at[0, 0, 0].set(1.0)

            def body(R, i):
                Rn = _advance_right(R, A[i], Wmpo[i])
                return Rn, Rn

            _, stack = jax.lax.scan(body, R0, jnp.arange(n - 1, -1, -1))
            return stack

        stack = build(self.A, self.Wmpo)      # envs for sites n-1 .. 0
        Renv = jnp.zeros((n + 1, m, D, m), self.dtype)
        Renv = Renv.at[n, 0, 0, 0].set(1.0)
        Renv = Renv.at[jnp.arange(n - 1, -1, -1) + 0].set(stack)
        self.Renv = Renv

    def sweep(self, noise=0.0, k=20, seed=0):
        key = jax.random.PRNGKey(seed)
        noise_val = jnp.asarray(noise, self.dtype)
        A, Lenv, Renv, e, dw = _sweep_jit(
            self.A, self.Lenv, self.Renv, self.Wmpo, noise_val, key,
            self.m, k, self.n_sites)
        self.A, self.Lenv, self.Renv = A, Lenv, Renv
        return float(e), float(dw)

    def expectation(self, W_list):
        """<psi| W |psi> / <psi|psi> for an arbitrary (numpy) MPO.
        The padded device copy is cached per MPO object (the schedule
        driver evaluates the same W_ham after every sweep)."""
        cache = getattr(self, "_exp_cache", None)
        if cache is None or cache[0] is not W_list:
            Wp = jnp.asarray(pad_mpo(W_list), dtype=self.dtype)
            self._exp_cache = cache = (W_list, Wp)
        Wp = cache[1]
        num = _expectation_jit(self.A, Wp, self.n_sites)
        den = _norm_jit(self.A, self.n_sites)
        return float(num / den)

    def mps(self):
        """Back to the ragged numpy format (bond dims trimmed to the
        numerically live rows/cols)."""
        A = np.asarray(jax.device_get(self.A), dtype=np.float64)
        out = []
        left = 1
        for i in range(self.n_sites):
            right = min(self.m, 2 * left, 2 ** (self.n_sites - i - 1))
            out.append(A[i, :left, :, :right].copy())
            left = right
        # normalize
        nrm = np.sqrt(abs(_np_mps_norm(out)))
        if nrm > 0:
            out[0] = out[0] / nrm
        return out


def _np_mps_norm(mps):
    E = np.ones((1, 1))
    for A in mps:
        T = np.einsum("ac,cyf->ayf", E, A, optimize=True)
        E = np.einsum("ayf,ayd->df", T, np.conj(A), optimize=True)
    return float(E[0, 0])


def host_polish_f64(mps, W, m, sweeps=1, seed=0):
    """Final-mile f64 polish of a device-converged MPS: a few *host*
    numpy two-site sweeps (solvers/dmrg._run_sweep) warm-started at the
    exported state, noise off.

    Rationale (measured, RESULTS round 5 / tpu_dmrg_frontier.py): the
    f32 device Lanczos floors the resolvable energy at ~1e-5 relative —
    at H30/m=256 the energy fluctuates at +5e-5 Ha and stops converging
    per-sweep. The state itself is variationally fine (energy error is
    second order in state error), so one or two f64 sweeps from the warm
    state recover f64-class accuracy at a cost that is tiny next to the
    device ladder (the expensive part — the m-ladder from a cold start —
    stays on the accelerator). This is the TPU-native division of labor;
    an emulated-f64 device sweep (x64 SVD/eigh on TPU) would be slower
    than the host at these sizes and brutal to compile.

    W is the PENALIZED sweep MPO (the same one the device sweeps used).
    Modifies mps in place and returns it."""
    from .dmrg import _make_envs, _run_sweep

    rng = np.random.default_rng(seed)
    LE, RE = _make_envs(mps, W)
    for _ in range(sweeps):
        _run_sweep(mps, W, LE, RE, m, rng, 0.0)
    return mps


def dmrg_ground_state_device(h1, eri, nelec, bond_dims=(16, 32),
                             sweeps_per_dim=2, penalty=8.0, noise=1e-4,
                             k=20, seed=0, mpo_cutoff=None,
                             final_f64_sweeps=0, dtype=None):
    """Device-path analog of dmrg.dmrg_ground_state: compile the MPO on
    host, run every sweep on the accelerator, return (physical energy,
    numpy MPS). final_f64_sweeps > 0 appends that many host f64 polish
    sweeps at the last bond dimension (host_polish_f64) — breaks through
    the f32 device-Lanczos energy floor."""
    norb = h1.shape[0]
    n_sites = 2 * norb
    if isinstance(nelec, (tuple, list)):
        na, nb = nelec
    else:
        nb = int(nelec) // 2
        na = int(nelec) - nb
    if mpo_cutoff is None:
        mpo_cutoff = 1e-12 if norb <= 10 else 1e-9
    W_ham = build_hamiltonian_mpo_fast(h1, eri, cutoff=mpo_cutoff)
    W_pen = number_penalty_mpo(n_sites, na + nb, 0.5 * (na - nb),
                               lam=penalty)
    W = mpo_compress(mpo_add(W_ham, W_pen))

    solver = None
    for m in bond_dims:
        if solver is None:
            solver = DeviceDMRG(W, n_sites, m, n_elec=na + nb,
                                sz=0.5 * (na - nb), dtype=dtype)
        else:
            mps_prev = solver.mps()
            solver = DeviceDMRG(W, n_sites, m, mps0=mps_prev, dtype=dtype)
        for s in range(sweeps_per_dim):
            solver.sweep(noise=noise, k=k, seed=seed + 7 * s)
        noise *= 0.1
    mps = solver.mps()
    if final_f64_sweeps:
        host_polish_f64(mps, W, bond_dims[-1], sweeps=final_f64_sweeps,
                        seed=seed)
    e_phys = mpo_expectation(mps, W_ham)
    return e_phys, mps
