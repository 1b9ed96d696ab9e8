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


# --------------------------------------------------------------------------
# Data-side precision: contractions whose outputs feed ONLY the bound's
# quadratic/reduction terms (cross-covariance Kuf assembly, the M x B
# solves/products of the SVGP ELBO) never enter a Cholesky, so their
# rounding acts like extra likelihood noise rather than a stability
# hazard. They dominate the FLOPs at production shapes, and the TPU runs
# DEFAULT (bf16-pass) matmuls ~4x faster than HIGHEST. Default remains
# HIGHEST (bit-identical to the always-pinned behavior); opt in with
# set_data_precision("default") — measured ~1.9x on the SVGP step at
# B=65536/M=512 with a matching ELBO trajectory (benchmarks/NOTES.md).
# Kuu-side grams and everything feeding a Cholesky ALWAYS stay HIGHEST.
#
# The flag is read at trace time: set it before executors are built /
# jitted (a compiled function keeps whatever precision it traced with).
# --------------------------------------------------------------------------

_DATA_PRECISION = jax.lax.Precision.HIGHEST


def set_data_precision(precision):
    """Set the precision for data-side (non-Cholesky-feeding) GP
    contractions: "highest" (default), "high", or "default"."""
    global _DATA_PRECISION
    if isinstance(precision, str):
        precision = getattr(jax.lax.Precision, precision.upper())
    _DATA_PRECISION = precision


def get_data_precision():
    return _DATA_PRECISION


def data_einsum(equation, *operands):
    """einsum at the configured data-side precision (see above)."""
    return jnp.einsum(equation, *operands, precision=_DATA_PRECISION)
