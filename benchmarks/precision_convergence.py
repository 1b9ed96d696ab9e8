"""Convergence-equivalence probe for the data-side precision tiers.

The question (VERDICT r4 item 1): does the 1-pass-bf16 "default" tier —
measured 2.06x over HIGHEST on the compute-bound SVGP step — converge
equivalently on the tight-noise 10^6-point north-star workload, now
that the bound is in RESIDUAL form (r5: the data fit is computed from
the f32 elementwise residual Y − m instead of three near-cancelling
O(|Y|²) expanded terms, and the trace pair is grouped per point)?

Protocol: the shared svgp_common.py trajectory (the exact svgp_1m.py
model/loop/config — 10^6 points, B=4096, M=256, D=8, true noise 0.1,
adam 3e-3, DeviceMinibatchLoop, same PRNG), run sequentially in ONE
process at each precision mode — identical minibatch order, so
trajectory differences are pure arithmetic.

Usage: python benchmarks/precision_convergence.py [epochs] [mode ...]
       (default: 20 epochs, modes highest + default)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def run_mode(mode, epochs, **config):
    from mxfusion_tpu.ops.precision import set_data_precision
    set_data_precision(mode)   # trace-time flag: set BEFORE building
    from svgp_common import run_svgp_trajectory
    return run_svgp_trajectory(epochs, label="mode={}".format(mode),
                               **config)


def main():
    from svgp_common import print_relative_gap
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    modes = sys.argv[2:] or ["highest", "default"]
    results = {}
    for mode in modes:
        results[mode] = run_mode(mode, epochs)
    base_mode = modes[0]
    for mode in modes[1:]:
        print_relative_gap(mode, results[mode], base_mode,
                           results[base_mode])


if __name__ == "__main__":
    main()
