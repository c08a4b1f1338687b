"""McMurchie-Davidson recurrences: Hermite expansion coefficients E and the
Hermite Coulomb tensor R.

All recursions are unrolled at trace time over *static* angular momenta, so
under jit/vmap each class of shell pairs/quartets compiles to straight-line
batched arithmetic — the idiomatic TPU formulation (no data-dependent control
flow, fixed shapes).

Conventions follow Helgaker/Jorgensen/Olsen ch. 9. This module replaces the
libcint primitives the reference obtains through pyscf
(`mol.intor("int1e_ovlp"/"int2e"/...)`, see
evcont/ab_initio_gradients_loewdin.py:283-284).
"""

import jax.numpy as jnp

from .boys import boys


def hermite_E(la, lb, PA, PB, inv_2p, mu_AB2):
    """Hermite expansion coefficients E_t^{ij} for one cartesian dimension.

    Args:
        la, lb: static ints, max angular momenta to build (inclusive).
        PA, PB: batched arrays P-A, P-B for this dimension.
        inv_2p: 1 / (2 (a+b)).
        mu_AB2: mu * (A-B)^2 for this dimension, mu = a b / (a+b).

    Returns:
        dict mapping (i, j, t) -> batched array. Entries exist for
        0 <= i <= la, 0 <= j <= lb, 0 <= t <= i + j.
    """
    E = {(0, 0, 0): jnp.exp(-mu_AB2)}

    def get(i, j, t):
        if t < 0 or t > i + j:
            return 0.0
        return E[(i, j, t)]

    for i in range(la):
        for t in range(i + 2):
            E[(i + 1, 0, t)] = (
                inv_2p * get(i, 0, t - 1)
                + PA * get(i, 0, t)
                + (t + 1) * get(i, 0, t + 1)
            )
    for j in range(lb):
        for i in range(la + 1):
            for t in range(i + j + 2):
                E[(i, j + 1, t)] = (
                    inv_2p * get(i, j, t - 1)
                    + PB * get(i, j, t)
                    + (t + 1) * get(i, j, t + 1)
                )
    return E


def hermite_R(tmax, umax, vmax, alpha, PC, total_max=None):
    """Hermite Coulomb integrals R^0_{tuv}(alpha, PC).

    Args:
        tmax, umax, vmax: static ints, highest orders needed per dimension.
        alpha: batched exponent parameter.
        PC: batched array (..., 3), P - C.
        total_max: static int; entries with t+u+v > total_max are never
            accessed by the caller and are skipped (t+u+v <= l_a+l_b+l_c+l_d
            for real integral classes even though per-dimension bounds can
            each reach that sum).

    Returns:
        dict mapping (t, u, v) -> batched array R^0_{tuv}.
    """
    if total_max is None:
        total_max = tmax + umax + vmax
    nmax = total_max
    T = alpha * jnp.sum(PC * PC, axis=-1)
    F = boys(nmax, T)  # (..., nmax+1)

    minus_2a = -2.0 * alpha
    # R^n_{000} = (-2 alpha)^n F_n
    Rn = {}
    pow_term = jnp.ones_like(alpha)
    for n in range(nmax + 1):
        Rn[(n, 0, 0, 0)] = pow_term * F[..., n]
        pow_term = pow_term * minus_2a

    X, Y, Z = PC[..., 0], PC[..., 1], PC[..., 2]

    def get(n, t, u, v):
        if t < 0 or u < 0 or v < 0:
            return 0.0
        return Rn[(n, t, u, v)]

    # Build up v, then u, then t; each step consumes one order of n.
    for v in range(min(vmax, total_max)):
        for n in range(nmax - v):
            Rn[(n, 0, 0, v + 1)] = v * get(n + 1, 0, 0, v - 1) + Z * get(n + 1, 0, 0, v)
    for u in range(umax):
        for v in range(vmax + 1):
            if u + 1 + v > total_max:
                continue
            for n in range(nmax - u - v):
                Rn[(n, 0, u + 1, v)] = (
                    u * get(n + 1, 0, u - 1, v) + Y * get(n + 1, 0, u, v)
                )
    for t in range(tmax):
        for u in range(umax + 1):
            for v in range(vmax + 1):
                if t + 1 + u + v > total_max:
                    continue
                for n in range(nmax - t - u - v):
                    Rn[(n, t + 1, u, v)] = (
                        t * get(n + 1, t - 1, u, v) + X * get(n + 1, t, u, v)
                    )

    return {
        (t, u, v): Rn[(0, t, u, v)]
        for t in range(tmax + 1)
        for u in range(umax + 1)
        for v in range(vmax + 1)
        if t + u + v <= total_max
    }


def hermite_E_dense(la, lb, PA, PB, inv_2p, mu_AB2):
    """Dense stacked Hermite E coefficients, shape (..., la+1, lb+1, la+lb+1).

    Same recursion as hermite_E but materialized once into a single array so
    downstream contractions are gathers + einsums (tiny XLA graphs, MXU-
    friendly) rather than thousands of scalar-batched ops.
    """
    E = hermite_E(la, lb, PA, PB, inv_2p, mu_AB2)
    zero = jnp.zeros_like(E[(0, 0, 0)])
    rows = []
    for i in range(la + 1):
        cols = []
        for j in range(lb + 1):
            ts = [E.get((i, j, t), zero) if t <= i + j else zero
                  for t in range(la + lb + 1)]
            cols.append(jnp.stack(ts, axis=-1))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)


def hermite_R_dense(L, alpha, PC):
    """Dense Hermite Coulomb tensor, shape (..., L+1, L+1, L+1), zeros where
    t+u+v > L."""
    R = hermite_R(L, L, L, alpha, PC, total_max=L)
    zero = jnp.zeros_like(R[(0, 0, 0)])
    out = []
    for t in range(L + 1):
        us = []
        for u in range(L + 1):
            vs = [R.get((t, u, v), zero) for v in range(L + 1)]
            us.append(jnp.stack(vs, axis=-1))
        out.append(jnp.stack(us, axis=-2))
    return jnp.stack(out, axis=-3)


def cart_components(l):
    """Cartesian angular-momentum component list for shell type l.

    Order (x-major) matches the AO ordering documented in
    integrals/shells.py: l=1 -> [(1,0,0), (0,1,0), (0,0,1)].
    """
    return [
        (l - i, i - j, j)
        for i in range(l + 1)
        for j in range(i + 1)
    ]
