"""Shared string constants (reference: mxfusion/common/constants.py:16)."""

# Prefix used by inference algorithms to push state updates (e.g. cached
# Cholesky factors) out of a pure jitted objective as auxiliary outputs.
SET_PARAMETER_PREFIX = "SET_"
