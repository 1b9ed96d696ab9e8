"""Convergence-equivalence A/B for the fused Pallas gram path.

The fused kernel (ops/pallas_fused_gram.py) replaces the XLA
materialized Kuf pipeline inside its measured-win envelope
(N >= 131072). Its G-product runs at the same guarded 3-pass tier as
the XLA path, but the gram distances use a hand-rolled hi/lo split
(Mosaic's dot only lowers DEFAULT/HIGHEST) and the predictive mean is
associated through G instead of the narrow w-vector — so convergence
equivalence must be established separately, inside the envelope.

Protocol: the shared svgp_common.py trajectory (10^6-ish points, tight
noise 0.1, adam 3e-3, DeviceMinibatchLoop, same PRNG) with
batch=131072 / M=256 so every step engages the kernel; run twice in
ONE process with pfg enabled/disabled — identical minibatch order, so
trajectory differences are pure arithmetic.

Usage: python benchmarks/fused_gram_convergence.py [epochs]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_TOTAL = 2 ** 20          # 131072 * 8 exactly
BATCH = 131072             # inside the fused envelope
M_IND = 256
D = 8


def run_mode(fused, epochs):
    from mxfusion_tpu.ops import pallas_fused_gram as pfg
    from mxfusion_tpu.ops.precision import set_data_precision
    set_data_precision("default")   # the library default (r5)
    pfg.set_enabled(fused)          # trace-time gate
    from svgp_common import run_svgp_trajectory
    return run_svgp_trajectory(epochs, n_total=N_TOTAL, batch=BATCH,
                               m_inducing=M_IND, d=D,
                               label="fused={!s}".format(fused))


def main():
    from svgp_common import print_relative_gap
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    base = run_mode(False, epochs)
    tr = run_mode(True, epochs)
    print_relative_gap("fused", tr, "xla", base)


if __name__ == "__main__":
    main()
