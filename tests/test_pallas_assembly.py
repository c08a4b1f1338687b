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
