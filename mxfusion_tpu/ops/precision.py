"""Precision-pinned contractions for GP/linalg math.

On TPU, XLA's default matmul precision computes float32 contractions
with bfloat16 MXU passes. That is fine for neural-network layers but
catastrophic for kernel matrices: a ~1e-2 relative error on K makes
``K + 1e-5·I`` indefinite and the Cholesky NaNs (observed on v5e: the
un-pinned SVGP bound diverges while the Pallas path — which pins
``preferred_element_type=float32`` — trains fine). Every contraction in
the GP/MVN stack therefore goes through :func:`einsum`, which requests
HIGHEST precision (f32 accumulation; on TPU this lowers to the 3-pass
bf16 scheme).
"""
import jax
import jax.numpy as jnp


def einsum(equation, *operands):
    return jnp.einsum(equation, *operands,
                      precision=jax.lax.Precision.HIGHEST)
