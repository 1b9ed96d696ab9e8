"""Paired A/B: whitened vs standard SVGP parameterization at the
compute tier (B=65536, M=512, D=32), library-default data precision,
same process (relay-honest protocol from roofline.py).

Motivation: at the r5 default precision the stacked chol(2, 512, 512)
is ~19% of the step and sits at the measured serial-recurrence floor
(benchmarks/NOTES.md r5 Cholesky entry). The whitened parameterization
(q(U) over L⁻¹U) removes the Ls half of the stack — the factorization
batch drops from 2 to 1 — at the cost of one extra narrow triangular
product. Compare ms/step ONLY: the TFLOP/s print uses the
standard-path flop count for both legs.

Usage: python benchmarks/whitened_ab.py [steps]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import roofline
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    ceil = roofline.measure_matmul_ceiling(4096, "float32", "DEFAULT",
                                           iters=32)
    sec_std, _ = roofline.run_svgp_config(65536, 512, 32, steps=steps,
                                          ceiling_tflops=ceil)
    sec_wht, _ = roofline.run_svgp_config(65536, 512, 32, steps=steps,
                                          ceiling_tflops=ceil,
                                          whitened=True)
    print("standard {:.3f} ms  whitened {:.3f} ms  ratio {:.3f}x"
          .format(sec_std * 1e3, sec_wht * 1e3, sec_std / sec_wht))


if __name__ == "__main__":
    main()
