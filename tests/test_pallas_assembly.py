"""Pallas assembly-kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from evcont_tpu.subspace.pallas_assembly import (
    pallas_assembly_matvec, assemble_two_body)


def test_pallas_matvec_matches_einsum():
    rng = np.random.default_rng(0)
    # deliberately non-multiple-of-block shapes
    P, K = 21, 3000
    A = rng.standard_normal((P, K)).astype(np.float32)
    x = rng.standard_normal(K).astype(np.float32)
    ref = A @ x
    out = np.array(pallas_assembly_matvec(jnp.asarray(A), jnp.asarray(x),
                                          interpret=True))
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-4)


def test_backend_dispatch():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((10, 300))
    x = rng.standard_normal(300)
    a = np.array(assemble_two_body(jnp.asarray(A), jnp.asarray(x)))
    b = np.array(assemble_two_body(jnp.asarray(A), jnp.asarray(x),
                                   backend="pallas", interpret=True))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-8)


def test_pallas_matmat_matches_matmul():
    from evcont_tpu.subspace.pallas_assembly import pallas_assembly_matmat
    rng = np.random.default_rng(2)
    A = rng.standard_normal((37, 2100)).astype(np.float32)
    X = rng.standard_normal((2100, 5)).astype(np.float32)
    out = np.array(pallas_assembly_matmat(jnp.asarray(A), jnp.asarray(X),
                                          interpret=True))
    np.testing.assert_allclose(out, A @ X, rtol=2e-5, atol=2e-4)


def test_assemble_two_body_pallas_vjp():
    """The pallas path's custom VJP (gradient w.r.t. the integrals only)
    matches the XLA path's gradient."""
    import jax
    rng = np.random.default_rng(3)
    A = rng.standard_normal((24, 1500)).astype(np.float32)
    x = rng.standard_normal(1500).astype(np.float32)
    w = rng.standard_normal(24).astype(np.float32)

    def loss(backend):
        def f(xx):
            y = assemble_two_body(jnp.asarray(A), xx, backend=backend,
                                  interpret=True)
            return jnp.dot(jnp.asarray(w), y)
        return f

    g_xla = np.array(jax.grad(loss("xla"))(jnp.asarray(x)))
    g_pal = np.array(jax.grad(loss("pallas"))(jnp.asarray(x)))
    np.testing.assert_allclose(g_pal, g_xla, rtol=2e-5, atol=2e-4)
