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
# quadratic/reduction terms (the M x B solves/products of the SVGP
# ELBO) never enter a Cholesky, so their rounding degrades gradient
# quality gracefully rather than destabilizing a factorization. They
# dominate the FLOPs at production shapes. Modes, all measured on the
# v5e (benchmarks/NOTES.md):
#   "high"    3-pass bf16 — 1.55x on the B=65536/M=512 SVGP step
#             (9.19 -> 5.92 ms, BENCH_r03); 20-epoch 10^6-point
#             convergence equivalent to HIGHEST. THE DEFAULT since r4:
#             every data-side site was audited (only products feeding
#             the bound's reductions use data_einsum; Cholesky-feeding
#             chains pin themselves via data_precision_scope), and the
#             measured convergence is indistinguishable.
#   "highest" f32 accumulation everywhere — the bit-conservative
#             opt-out; use it when validating against f64 oracles.
#   "default" 1-pass bf16 — 2.06x, but measured late-stage convergence
#             degradation on tight-noise GP regression (the bound's
#             near-cancelling terms amplify the 2^-8 rounding); only
#             for early epochs / noise-dominated objectives.
# Kuu-side grams, the R2 cross term (cancellation-sensitive), and
# everything feeding a Cholesky ALWAYS stay HIGHEST regardless of this
# flag. On CPU (the test platform) every mode is full f32/f64, so the
# flag cannot change test results.
#
# The flag is read at trace time: set it before executors are built /
# jitted (a compiled function keeps whatever precision it traced with).
# --------------------------------------------------------------------------

DEFAULT_DATA_PRECISION = jax.lax.Precision.HIGH
_DATA_PRECISION = DEFAULT_DATA_PRECISION


def set_data_precision(precision):
    """Set the precision for data-side (non-Cholesky-feeding) GP
    contractions: "high" (default), "highest", or "default".

    TRACE-TIME flag: it is read when an executor is traced/jitted, so
    call it BEFORE building executors. Flipping it after a function has
    been compiled has no effect on that function (the compiled program
    keeps the precision it traced with) — rebuild the executor to apply
    a new setting.
    """
    global _DATA_PRECISION
    if isinstance(precision, str):
        precision = getattr(jax.lax.Precision, precision.upper())
    _DATA_PRECISION = precision


def get_data_precision():
    return _DATA_PRECISION


def data_einsum(equation, *operands):
    """einsum at the configured data-side precision (see above)."""
    return jnp.einsum(equation, *operands, precision=_DATA_PRECISION)


from contextlib import contextmanager  # noqa: E402


@contextmanager
def data_precision_scope(precision):
    """Temporarily force the data-side precision (trace-time scope).

    Used by code whose "data-side" products actually feed a Cholesky —
    e.g. the Titsias bound's A = I + LinvKuf LinvKufT / noise, where a
    relaxed Kuf could push A indefinite at extreme N/noise ratios — to
    pin HIGHEST locally regardless of the global opt-in.
    """
    global _DATA_PRECISION
    old = _DATA_PRECISION
    set_data_precision(precision)
    try:
        yield
    finally:
        _DATA_PRECISION = old
