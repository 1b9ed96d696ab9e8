"""Paired A/B of the fused Pallas gram path at its envelope tier.

The fused kernel (ops/pallas_fused_gram.py) only engages at
N >= 131072, so the main compute-bound bench tier (B=65536) never
exercises it. This module measures the envelope tier —
B=262144, M=512, D=32, library-default precision — both ways in ONE
process (pfg.set_enabled is the trace-time switch; run_svgp_config
rebuilds + re-jits the whole step each call), so the recorded speedup
is a true paired comparison. bench.py records it as the `fused_gram`
tier every round.

Usage: python benchmarks/fused_ab.py [B] (default 262144)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def measure(B=262144, M=512, D=32, steps=40):
    import jax.numpy as jnp
    import roofline
    from mxfusion_tpu.ops import pallas_fused_gram as pfg

    was = pfg.enabled()
    try:
        # force each leg explicitly (don't inherit ambient state: if
        # the flag were off, both legs would silently measure XLA and
        # a fused-path regression would be invisible in BENCH history)
        pfg.set_enabled(False)
        sec_xla, _ = roofline.run_svgp_config(B, M, D, steps=steps)
        pfg.set_enabled(True)
        sec_fused, _ = roofline.run_svgp_config(B, M, D, steps=steps)
    finally:
        pfg.set_enabled(was)
    return {
        "config": "svgp_step_b{}_m{}_d{}_f32_default".format(B, M, D),
        "ms_per_step_fused": round(sec_fused * 1e3, 3),
        "ms_per_step_xla": round(sec_xla * 1e3, 3),
        "speedup": round(sec_xla / sec_fused, 3),
        "kernel_engaged": bool(pfg.supported(M, B, D, jnp.float32)),
    }


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    print(measure(B=B))
