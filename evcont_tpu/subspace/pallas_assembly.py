"""Pallas TPU kernel for the subspace-Hamiltonian assembly contraction.

The hot op of the inference path is the two-body assembly
    H_two[pair] = sum_k Gamma_packed[pair, k] * h2c[k]
over the compressed t-RDM store — a tall-skinny matvec whose cost is
streaming the (Npair, Npacked) store out of HBM (Zundel at 84 training
states: 3570 x 307720 ~ 4.4 GB f32 per evaluation). This kernel tiles the
store into VMEM blocks on a (pair-block, k-block) grid and accumulates
partial dot products in the output block; Pallas' pipelined BlockSpec
machinery overlaps the HBM->VMEM streaming of the next tile with the MXU
work on the current one (the double-buffering pattern).

Opt-in: `assemble_two_body(..., backend="pallas")` or
`ContinuationModel(assembly_backend="pallas")`; the XLA path remains the
default. Real-chip A/B at the Zundel flagship store (3,570 x 307,720 f32,
4.1 GiB; v5e, 2026-08-16, tpu_ab_pallas.py): XLA matvec/matmat 34 ms vs
this kernel 147 ms at the original (8, 1024) blocks and 51 ms at the
(256, 4096) blocks below — XLA's GEMM wins; the kernel is kept as the
baseline for future fused-assembly work (e.g. folding the pair-unpack or
exchange-compression into the stream) and is validated against the einsum
path in interpret mode on CPU and end to end through the model.
"""

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

BLOCK_P = 256      # pair-block
BLOCK_K = 4096     # packed-orbital block (lane multiples)


def _kernel(two_rdm_ref, h2c_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(two_rdm_ref[:], h2c_ref[:],
                          preferred_element_type=out_ref.dtype)


def pallas_assembly_matvec(two_rdm_packed, h2c, interpret=False):
    """H_two = two_rdm_packed @ h2c via the blocked Pallas kernel.

    Args:
        two_rdm_packed: (Npair, K) compressed two-body store.
        h2c: (K,) exchange-compressed integrals.

    Returns:
        (Npair,) assembled two-body contributions.
    """
    P, K = two_rdm_packed.shape
    Pp = -(-P // BLOCK_P) * BLOCK_P
    Kp = -(-K // BLOCK_K) * BLOCK_K
    A = jnp.pad(two_rdm_packed, ((0, Pp - P), (0, Kp - K)))
    x = jnp.pad(h2c, (0, Kp - K)).reshape(Kp, 1)

    out = pl.pallas_call(
        _kernel,
        grid=(Pp // BLOCK_P, Kp // BLOCK_K),
        in_specs=[
            pl.BlockSpec((BLOCK_P, BLOCK_K), lambda i, k: (i, k)),
            pl.BlockSpec((BLOCK_K, 1), lambda i, k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_P, 1), lambda i, k: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, 1), two_rdm_packed.dtype),
        interpret=interpret,
    )(A, x)
    return out[:P, 0]


def pallas_assembly_matmat(two_rdm_packed, h2c_batch, interpret=False):
    """H_two = two_rdm_packed @ h2c_batch for a batch of geometries'
    integrals: (Npair, K) @ (K, B) -> (Npair, B), same blocked streaming
    kernel with the batch riding along the output lanes."""
    P, K = two_rdm_packed.shape
    B = h2c_batch.shape[1]
    Pp = -(-P // BLOCK_P) * BLOCK_P
    Kp = -(-K // BLOCK_K) * BLOCK_K
    Bp = -(-B // 8) * 8
    A = jnp.pad(two_rdm_packed, ((0, Pp - P), (0, Kp - K)))
    x = jnp.pad(h2c_batch, ((0, Kp - K), (0, Bp - B)))

    out = pl.pallas_call(
        _kernel,
        grid=(Pp // BLOCK_P, Kp // BLOCK_K),
        in_specs=[
            pl.BlockSpec((BLOCK_P, BLOCK_K), lambda i, k: (i, k)),
            pl.BlockSpec((BLOCK_K, Bp), lambda i, k: (k, 0)),
        ],
        out_specs=pl.BlockSpec((BLOCK_P, Bp), lambda i, k: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Pp, Bp), two_rdm_packed.dtype),
        interpret=interpret,
    )(A, x)
    return out[:P, :B]


def assemble_two_body(two_rdm_packed, h2c, backend="xla", interpret=False):
    """Packed two-body assembly with selectable backend. Differentiable
    w.r.t. h2c on the pallas path (custom VJP; the store is training data
    and carries no gradient)."""
    if backend == "pallas":
        A = jax.lax.stop_gradient(two_rdm_packed)

        @jax.custom_vjp
        def mv(x):
            return pallas_assembly_matvec(A, x, interpret=interpret)

        def fwd(x):
            return mv(x), None

        def bwd(_, ybar):
            return (A.T @ ybar,)

        mv.defvjp(fwd, bwd)
        return mv(h2c)
    return two_rdm_packed @ h2c
