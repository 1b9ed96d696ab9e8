"""Fused RBF-gram -> triangular-solve product for the SVGP data path.

This kernel computes G = Linv @ (var * exp(P - zn - xn)) directly,
tile by tile over the data axis, with the gram built in VMEM and
consumed immediately by the MXU — Kuf NEVER exists in HBM. The
custom-VJP backward recomputes each gram tile (FLOPs are free here)
and fuses the entire cotangent chain (dLinv, dZs, dXs, dvar) into one
pass over dG, eliminating the dKuf / dd2 materializations too.

Measured envelope (benchmarks/NOTES.md r5 fused-gram entry, paired
in-process A/B through the full library step at M=512, D=32): the
HBM-traffic saving (~3 Kuf-size panel transits) is hidden under the
3-pass MXU G-product until the panels get large — the fused path TIES
at B=65536 (0.995x), wins 1.034x at B=131072 and 1.072x at B=262144.
``supported()`` therefore gates it to N >= 131072; below that XLA's
materialized pipeline is equally good and numerically identical-tier.
(The earlier "step is ~88% HBM-bound" roofline estimate overstated
XLA's real traffic: the per-stage decomposition in
benchmarks/step_decomposition.py shows the gram block's cost is split
between exp VPU work, panel transits, and the 3-pass product, and
only the transit share — not the whole block — is recoverable.)

Precision: the G-product runs at HIGH (3-pass bf16) — it feeds the
bound's Kff - Qff cancellation, same guard as
`ops.precision.guarded_forward_matmul` (measured requirement,
benchmarks/NOTES.md r5). The distance matmul runs at hand-rolled
3-pass HIGH, NOT the HIGHEST tier the XLA path pins for grams: the
hi/lo split keeps ~f32 operand fidelity in the cancelling
|z|^2+|x|^2-2zx expansion at half of HIGHEST's pass count, and the
residual O(2^-24)-relative exponent rounding perturbs exp() far below
the envelope's convergence tolerance (validated end-to-end by
benchmarks/fused_gram_convergence.py — this is the ONE audited
exception to CLAUDE.md's pin-Pallas-dots-at-HIGHEST rule). Cotangent
dots run at DEFAULT (1-pass), like the guarded matmul's backward.

Used by the SVGP regression bound when the kernel is a plain RBF on
TPU (s = 1, f32, aligned shapes) — `svgp_regression.py` gates it; the
XLA path is the fallback and the reference semantics
(/root/reference/mxfusion/modules/gp_modules/svgp_regression.py:98-107
keeps the expanded unfused form).
"""
import contextlib

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128


def _dot(a, b, dims, prec):
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               precision=prec,
                               preferred_element_type=jnp.float32)


def _dot_high(a, b, dims):
    """3-pass bf16 f32 matmul (the HIGH algorithm, hand-rolled:
    Mosaic's dot lowering only accepts DEFAULT/HIGHEST)."""
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _gram_tile(zs_ref, xs_ref, var):
    """var * exp(-0.5||zs_m - xs_t||^2) as (M, T), built in VMEM.

    Distance cross terms at the 3-pass tier (hand-rolled HIGH): the
    |z|^2+|x|^2-2zx expansion cancels, so 1-pass operand rounding
    perturbs exp() by O(1) (stationary.py note) — hi/lo splits keep
    ~f32 operand fidelity at half the HIGHEST pass count."""
    Zs = zs_ref[:]                                   # (M, D)
    Xs = xs_ref[:]                                   # (T, D)
    zn = 0.5 * jnp.sum(Zs * Zs, axis=1, keepdims=True)        # (M, 1)
    ones = jnp.ones((1, Xs.shape[1]), jnp.float32)
    xn = 0.5 * _dot_high(ones, Xs * Xs, ((1,), (1,)))         # (1, T)
    P = _dot_high(Zs, Xs, ((1,), (1,)))                       # (M, T)
    # clamp the exponent at 0 (i.e. R2 >= 0), matching the XLA RBF
    # path's jnp.maximum(R2, 0): rounding in the expansion must not
    # push K above var for near-coincident points (qff_diag > Kff_diag
    # would over-shoot the trace residual)
    return var * jnp.exp(jnp.minimum(P - zn - xn, 0.0))


def _fwd_kernel(zs_ref, xs_ref, uhi_ref, ulo_ref, var_ref, g_ref):
    K = _gram_tile(zs_ref, xs_ref, var_ref[0, 0])
    # 3-pass bf16 G-product with the U split hoisted OUT of the grid
    # loop (uhi/ulo are bf16 inputs, split once per step in XLA)
    k_hi = K.astype(jnp.bfloat16)
    k_lo = (K - k_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))

    def d(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    g_ref[:] = d(uhi_ref[:], k_hi) + d(uhi_ref[:], k_lo) \
        + d(ulo_ref[:], k_hi)


def _bwd_kernel(zs_ref, xs_ref, u_ref, var_ref, dg_ref,
                du_ref, dzs_ref, dxs_ref, skv_ref):
    LO = jax.lax.Precision.DEFAULT
    Zs = zs_ref[:]
    Xs = xs_ref[:]
    dG = dg_ref[:]                                   # (M, T)

    # recompute the gram tile (identical arithmetic to forward)
    K = _gram_tile(zs_ref, xs_ref, var_ref[0, 0])

    # dKuf = U^T dG, consumed immediately (never leaves VMEM);
    # cotangent products ride the 1-pass tier like the XLA guarded
    # matmul's backward (ops/precision.py)
    dK = _dot(u_ref[:], dG, ((0,), (0,)), LO)        # (M, T)
    de = K * dK            # d(exponent); also K*dK = var * d(var-path)

    M = Zs.shape[0]
    ones_m = jnp.ones((M, 1), jnp.float32)
    row_de = jnp.sum(de, axis=1, keepdims=True)      # (M, 1) VPU
    col_de = _dot(de, ones_m, ((0,), (0,)), LO)      # (T, 1) sum_m

    dZs_tile = _dot(de, Xs, ((1,), (0,)), LO) - row_de * Zs
    dXs_tile = _dot(de, Zs, ((0,), (0,)), LO) - col_de * Xs
    dU_tile = _dot(dG, K, ((1,), (1,)), LO)          # (M, M)
    skv_tile = jnp.sum(de)       # sum K*dK (scalar; dvar = skv/var)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        du_ref[:] = jnp.zeros_like(du_ref)
        dzs_ref[:] = jnp.zeros_like(dzs_ref)
        skv_ref[0, 0] = jnp.float32(0.0)

    dxs_ref[:] = dXs_tile
    du_ref[:] = du_ref[:] + dU_tile
    dzs_ref[:] = dzs_ref[:] + dZs_tile
    skv_ref[0, 0] = skv_ref[0, 0] + skv_tile


_ENABLED = True
_INTERPRET = False  # tests flip this to run the kernels on CPU


def enabled():
    return _ENABLED


def set_enabled(flag):
    """Kill switch for the fused data path (trace-time, like the
    precision flags): ``set_enabled(False)`` forces the XLA fallback
    everywhere. The fused op is a ``custom_vjp``, so forward-mode AD
    (``jax.jvp``/``jax.hessian``) cannot trace through it — wrap such
    traces in :func:`disabled` (the library's Laplace approximation
    does this itself)."""
    global _ENABLED
    _ENABLED = bool(flag)


@contextlib.contextmanager
def disabled():
    """Force the XLA fallback for the duration of the block. Needed
    around forward-mode AD (``jax.jvp``/``jax.jacfwd``/``jax.hessian``)
    of a bound inside the fused envelope: ``custom_vjp`` functions
    reject jvp tracing by design. Trace-time, like the gate itself."""
    global _ENABLED
    prev = _ENABLED
    _ENABLED = False
    try:
        yield
    finally:
        _ENABLED = prev


def set_interpret(flag):
    """Run the kernels through the Pallas interpreter (CPU tests)."""
    global _INTERPRET
    _INTERPRET = bool(flag)


def _tile(n):
    for t in (1024, 512, 256):
        if n % t == 0:
            return t
    return 256


def supported(M, N, D, dtype):
    """Envelope: f32, lane-aligned M, a data axis big enough that the
    saved panel transits beat the kernel's fixed costs (measured
    crossover ~N=131072 at M=512 — see module docstring), D small
    enough that (T, D) stays a thin block, TPU backend.

    M is capped at 512: the kernel holds u_hi+u_lo (4·M² B), the K and
    G tiles (2·4·M·T B) and, in the backward pass, U and dU in f32
    (2·4·M² B) resident in VMEM — at M=512/T=1024 that is ~7 MB
    against the ~16 MB core budget, while M=1024 already needs ~26 MB
    and would fail Mosaic compilation where the XLA fallback works.
    Nothing above M=512 (or D=32 beyond thin-block reasoning) has been
    measured; outside the cap the materialized-Kuf path serves."""
    if dtype != jnp.float32:
        return False
    if M % _LANE or M > 512 or D > 128:
        return False
    if N < 131072 or N % 256:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _call_fwd(Zs, Xs, U, var2d):
    from jax.experimental.pallas import tpu as pltpu
    M, D = Zs.shape
    N = Xs.shape[0]
    T = _tile(N)
    grid = (N // T,)
    # hoist the 3-pass split of U out of the grid loop (XLA-side,
    # once per training step)
    u_hi = U.astype(jnp.bfloat16)
    u_lo = (U - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((M, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=int(2 * M * N * D + 3 * 2 * M * M * N),
            bytes_accessed=int(4 * (M * N + N * D + M * M)),
            transcendentals=int(M * N)),
        interpret=_INTERPRET,
    )(Zs, Xs, u_hi, u_lo, var2d)


def _call_bwd(Zs, Xs, U, var2d, dG):
    from jax.experimental.pallas import tpu as pltpu
    M, D = Zs.shape
    N = Xs.shape[0]
    T = _tile(N)
    grid = (N // T,)
    return pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((M, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((M, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((M, M), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((M, D), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, M), jnp.float32),
            jax.ShapeDtypeStruct((M, D), jnp.float32),
            jax.ShapeDtypeStruct((N, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=int(4 * 2 * M * M * N + 3 * 2 * M * N * D),
            bytes_accessed=int(4 * (2 * M * N + 2 * N * D + M * M)),
            transcendentals=int(M * N)),
        interpret=_INTERPRET,
    )(Zs, Xs, U, var2d, dG)


@jax.custom_vjp
def fused_linv_rbf_gram(Linv, Zs, Xs, var):
    """``G = Linv @ (var * exp(-0.5 ||zs_m - xs_n||^2))`` without ever
    materializing the gram in HBM.

    Parameters: ``Linv`` (M, M) lower-triangular inverse of chol(Kuu);
    ``Zs`` (M, D) and ``Xs`` (N, D) lengthscale-scaled inputs; ``var``
    scalar kernel variance. Returns ``G`` (M, N) float32.

    Forward G-product at HIGH (cancellation guard), gram distances at
    hand-rolled 3-pass HIGH (see the module docstring for why this is
    an audited exception to the HIGHEST-gram rule), cotangents at
    DEFAULT — otherwise the same precision policy as the XLA path it
    replaces (ops/precision.py).
    """
    var2d = jnp.reshape(var.astype(jnp.float32), (1, 1))
    return _call_fwd(Zs, Xs, U=Linv, var2d=var2d)


def _fused_fwd(Linv, Zs, Xs, var):
    out = fused_linv_rbf_gram(Linv, Zs, Xs, var)
    return out, (Linv, Zs, Xs, var)


def _fused_bwd(res, dG):
    Linv, Zs, Xs, var = res
    var2d = jnp.reshape(var.astype(jnp.float32), (1, 1))
    dU, dZs, dXs, skv = _call_bwd(Zs, Xs, Linv, var2d, dG)
    dvar = (skv[0, 0] / var).astype(var.dtype)
    return dU, dZs, dXs, jnp.reshape(dvar, jnp.shape(var))


fused_linv_rbf_gram.defvjp(_fused_fwd, _fused_bwd)


def reference_linv_rbf_gram(Linv, Zs, Xs, var):
    """Pure-jnp reference (tests + CPU fallback semantics)."""
    from .precision import einsum as p_einsum
    zn = 0.5 * jnp.sum(Zs * Zs, axis=1)[:, None]
    xn = 0.5 * jnp.sum(Xs * Xs, axis=1)[None, :]
    P = p_einsum("md,nd->mn", Zs, Xs)
    K = var * jnp.exp(jnp.minimum(P - zn - xn, 0.0))
    return p_einsum("ij,jk->ik", Linv, K)
