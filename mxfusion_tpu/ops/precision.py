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
#   "default" 1-pass bf16 for the tolerant bulk. THE DEFAULT since r5:
#             the r4 blocker (late-stage convergence degradation on
#             tight-noise regression) was root-caused to cancellation
#             AMPLIFICATION, not to the bulk products themselves, and
#             eliminated by (a) the residual-form SVGP data fit
#             (svgp_regression.py) and (b) HIGH-precision floors at
#             every cancellation-amplified site (guarded_data_einsum /
#             guarded_forward_matmul below), which cost ~nothing.
#             Measured: 9.20 -> 4.65 ms on the B=65536/M=512 step
#             (1.98x over HIGHEST, 1.26x over "high") with the
#             20-epoch 10^6-point tight-noise trajectory equivalent
#             to HIGHEST (benchmarks/precision_convergence.py).
#   "high"    3-pass bf16 everywhere data-side — the r4 default;
#             5.88 ms at the same shape. Use if a NEW custom bound
#             (not yet audited for cancellation) misbehaves at
#             "default".
#   "highest" f32 accumulation everywhere — the bit-conservative
#             opt-out; use it when validating against f64 oracles.
# Kuu-side grams, the R2 cross term (cancellation-sensitive), and
# everything feeding a Cholesky ALWAYS stay HIGHEST regardless of this
# flag. On CPU (the test platform) every mode is full f32/f64, so the
# flag cannot change test results.
#
# The flag is read at trace time: set it before executors are built /
# jitted (a compiled function keeps whatever precision it traced with).
# --------------------------------------------------------------------------

DEFAULT_DATA_PRECISION = jax.lax.Precision.DEFAULT
_DATA_PRECISION = DEFAULT_DATA_PRECISION


def set_data_precision(precision):
    """Set the precision for data-side (non-Cholesky-feeding) GP
    contractions: "default" (the library default), "high", or
    "highest".

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


def _guard(prec):
    if prec == jax.lax.Precision.DEFAULT:
        return jax.lax.Precision.HIGH
    return prec


def guarded_data_einsum(equation, *operands):
    """Data-side einsum that never drops below HIGH (3-pass bf16).

    For the few data-side products whose rounding is AMPLIFIED
    downstream — the residual path's Kufᵀw (its error enters the bound
    multiplied by |R|/σ², and |R| → σ at convergence) — a 1-pass
    product injects a 2⁻⁸-relative gradient bias that stalls
    optimization (measured: benchmarks/precision_convergence.py, r5).
    These sites are O(M·N·D) next to the O(M²·N) bulk, so guarding
    them costs ~nothing while the bulk rides the configured tier.
    """
    return jnp.einsum(equation, *operands,
                      precision=_guard(_DATA_PRECISION))


def guarded_forward_matmul(A, B):
    """``A @ B`` with the FORWARD product floored at HIGH and the
    BACKWARD cotangent products at the configured data precision.

    The asymmetry is measured, not aesthetic
    (benchmarks/precision_convergence.py, r5, 10^6-point tight-noise
    SVGP): a 1-pass-bf16 forward L⁻¹Kuf poisons the bound through its
    cancellation-amplified consumers (the Kff−Qff trace pair, the
    residual mean) and training stalls, while 1-pass COTANGENTS only
    add ~2⁻⁸ relative noise to gradients that nothing downstream
    differences — trajectory equivalent to all-HIGH, at ~2/3 of the
    backward matmul passes. At "high"/"highest" both directions run at
    the configured precision (identical to a plain einsum there).

    NOTE: precision is read at TRACE time (like every flag here). The
    custom_jvp wraps plain einsums, so it lowers to ordinary HLO dots —
    no fusion barrier (unlike a Pallas custom call). A custom_jvp (not
    custom_vjp) so forward-mode AD works too: jax.hessian-based
    consumers (LaplaceApproximation over GP-module models) need jvp
    through the bound, and reverse mode falls out of transposing the
    tangent rule — dot_general transposition preserves the precision
    attribute, so cotangents ride the configured tier exactly as the
    old vjp did.
    """
    return _guarded_forward_matmul(A, B)


@jax.custom_jvp
def _guarded_forward_matmul(A, B):
    return jnp.einsum("...ij,...jk->...ik", A, B,
                      precision=_guard(_DATA_PRECISION))


@_guarded_forward_matmul.defjvp
def _gfm_jvp(primals, tangents):
    A, B = primals
    dA, dB = tangents
    out = _guarded_forward_matmul(A, B)
    # tangent products at the CONFIGURED tier (not the guarded floor):
    # these transpose to the cotangent einsums of the r4 vjp, and DCE
    # drops whichever side is not being differentiated
    dout = (jnp.einsum("...ij,...jk->...ik", dA, B,
                       precision=_DATA_PRECISION) +
            jnp.einsum("...ij,...jk->...ik", A, dB,
                       precision=_DATA_PRECISION))
    return out, dout.astype(out.dtype)


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
