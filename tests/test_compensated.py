"""Compensated-precision assembly: double-f32 operands, chunked two-float
accumulation, Rayleigh-refined GEP (subspace/compensated.py)."""

import numpy as np
import pytest

from evcont_tpu.subspace.compensated import (
    split_two_float, two_sum, compensated_matvec,
    compensated_pair_assembly, rayleigh_refined_ground_state)


def test_split_two_float_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(1000) * np.logspace(-3, 3, 1000)
    hi, lo = split_two_float(x)
    assert hi.dtype == np.float32 and lo.dtype == np.float32
    np.testing.assert_allclose(hi.astype(np.float64)
                               + lo.astype(np.float64), x, rtol=4e-15)


def test_two_sum_error_free():
    import jax.numpy as jnp
    a = jnp.float32(1.0)
    b = jnp.float32(1e-7)
    s, e = two_sum(a, b)
    # s + e recovers the exact sum of the two f32 values, which f32
    # alone cannot represent
    assert float(s) + float(e) == float(np.float32(1.0)) \
        + float(np.float32(1e-7))


@pytest.mark.slow
def test_compensated_matvec_beats_plain_f32():
    rng = np.random.default_rng(1)
    M, K = 64, 120000
    A = rng.standard_normal((M, K)) * 0.1
    x = rng.standard_normal(K) * 0.1
    exact = A @ x

    plain = (A.astype(np.float32) @ x.astype(np.float32)).astype(np.float64)
    Ah, Al = split_two_float(A)
    xh, xl = split_two_float(x)
    import jax.numpy as jnp
    s_hi, s_lo = compensated_matvec(jnp.asarray(Ah), jnp.asarray(Al),
                                    jnp.asarray(xh), jnp.asarray(xl))
    comp = np.asarray(s_hi, dtype=np.float64) \
        + np.asarray(s_lo, dtype=np.float64)

    scale = np.abs(exact).max()
    err_plain = np.abs(plain - exact).max() / scale
    err_comp = np.abs(comp - exact).max() / scale
    # MXU-speed mode: floor is the in-chunk hardware f32 accumulation
    # (~3e-7 relative); the "exact" mode below goes to f64-class
    assert err_comp < 5e-7, err_comp
    assert err_comp <= err_plain, (err_comp, err_plain)


def test_rayleigh_refinement_squares_vector_error():
    rng = np.random.default_rng(2)
    n = 12
    H = rng.standard_normal((n, n))
    H = 0.5 * (H + H.T) - 5 * np.eye(n)
    A = rng.standard_normal((n, n))
    S = A @ A.T + n * np.eye(n)
    from scipy.linalg import eigh
    w, v = eigh(H, S)
    E_exact, c = w[0], v[:, 0]
    # perturb the vector at the f32-eigh error scale
    delta = 1e-5 * rng.standard_normal(n)
    c_bad = c + delta
    import jax.numpy as jnp
    Hh, Hl = split_two_float(H)
    E_ref = float(rayleigh_refined_ground_state(
        jnp.asarray(Hh, dtype=np.float64), jnp.asarray(Hl, dtype=np.float64),
        jnp.asarray(S), jnp.asarray(c_bad)))
    # second-order: 1e-5 vector error -> |delta|^2 * ||H - E S||-scale
    # energy error (~1e-8), far below the 1e-5 first-order scale
    assert abs(E_ref - E_exact) < 1e-7


def test_compensated_pair_assembly_matches_f64():
    """End-to-end pair assembly: compensated f32 vs exact f64 on a
    realistic continuation-sized store."""
    import jax.numpy as jnp
    from evcont_tpu.oao import compress_exchange, pair_compression_maps

    rng = np.random.default_rng(3)
    ntrain, n = 6, 12
    npair = ntrain * (ntrain + 1) // 2
    npacked = n * n * (n * n + 1) // 2
    r1 = 0.2 * rng.standard_normal((npair, n, n))
    r2 = 0.05 * rng.standard_normal((npair, npacked))
    h1 = rng.standard_normal((n, n))
    h1 = 0.5 * (h1 + h1.T)
    h2 = rng.standard_normal((n, n, n, n))
    h2 = h2 + h2.transpose(1, 0, 2, 3)
    h2 = h2 + h2.transpose(0, 1, 3, 2)
    h2 = h2 + h2.transpose(2, 3, 0, 1)
    h2c = np.asarray(compress_exchange(jnp.asarray(h2),
                                       diag_multiplier=0.5))

    exact = np.einsum("pij,ij->p", r1, h1) + r2 @ h2c

    r1h, r1l = split_two_float(r1)
    r2h, r2l = split_two_float(r2)
    plain = (r1.astype(np.float32).reshape(npair, -1)
             @ h1.astype(np.float32).ravel()
             + r2.astype(np.float32) @ h2c.astype(np.float32))
    scale = np.abs(exact).max()
    h1h, h1l = split_two_float(h1)
    h2ch, h2cl = split_two_float(h2c)
    args = (jnp.asarray(r1h), jnp.asarray(r1l), jnp.asarray(r2h),
            jnp.asarray(r2l),
            (jnp.asarray(h1h), jnp.asarray(h1l)),
            (jnp.asarray(h2ch), jnp.asarray(h2cl)))
    for mode, tol in [("compensated", 5e-7), ("exact", 1e-11)]:
        H_hi, H_lo = compensated_pair_assembly(*args, mode=mode)
        val = np.asarray(H_hi, dtype=np.float64) \
            + np.asarray(H_lo, dtype=np.float64)
        err = np.abs(val - exact).max() / scale
        assert err < tol, (mode, err)
        assert np.abs(val - exact).max() <= \
            np.abs(plain - exact).max(), mode


def test_two_prod_error_free():
    import jax.numpy as jnp
    from evcont_tpu.subspace.compensated import two_prod
    rng = np.random.default_rng(4)
    a = rng.standard_normal(1000).astype(np.float32)
    b = rng.standard_normal(1000).astype(np.float32)
    p, e = two_prod(jnp.asarray(a), jnp.asarray(b))
    exact = a.astype(np.float64) * b.astype(np.float64)
    np.testing.assert_allclose(np.asarray(p, np.float64)
                               + np.asarray(e, np.float64), exact,
                               rtol=1e-15, atol=1e-18)


def test_exact_matvec_f64_class():
    """TwoProd + exact two-float summation reaches f64-class accuracy on
    a 1e5-term reduction (the 'exact' rung of the precision ladder)."""
    import jax.numpy as jnp
    from evcont_tpu.subspace.compensated import exact_matvec
    rng = np.random.default_rng(5)
    M, K = 16, 120000
    A = rng.standard_normal((M, K)) * 0.1
    x = rng.standard_normal(K) * 0.1
    exact = A @ x
    Ah, Al = split_two_float(A)
    xh, xl = split_two_float(x)
    s_hi, s_lo = exact_matvec(jnp.asarray(Ah), jnp.asarray(Al),
                              jnp.asarray(xh), jnp.asarray(xl))
    val = np.asarray(s_hi, np.float64) + np.asarray(s_lo, np.float64)
    rel = np.abs(val - exact).max() / np.abs(exact).max()
    assert rel < 1e-11, rel
