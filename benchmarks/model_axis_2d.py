"""Prove-or-drop measurement for 2-D model-axis sharding of SVGP
(VERDICT r2 item 6).

Compares, at production M (default 2048), the compiled SVGP training
step under:

  A. 1-D data mesh (8 x data), q(U)/Z replicated        [baseline]
  B. 2-D (2 data x 4 model), q(U)/Z sharded over model
  C. 2-D (2 data x 4 model), q(U)/Z replicated          [control]

On this host the 8 devices are virtual CPU devices sharing ONE core, so
wall-clock serializes all shards and cannot show a parallel win; the
decision-grade numbers are structural, from the compiled executable:

  - collective ops in the optimized HLO (what model-sharding costs),
  - per-device argument/output/temp bytes (what it buys: capacity),
  - total FLOPs (sanity: the math is identical).

Run:  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      JAX_PLATFORMS=cpu python benchmarks/model_axis_2d.py [M] [B]
"""
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.components.distributions.gp.kernels import RBF
from mxfusion_tpu.modules import SVGPRegression
from mxfusion_tpu.inference import MAP, GradBasedInference, create_executor
from mxfusion_tpu.parallel import make_mesh, make_mesh_2d

M_IND = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
B = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
D = 16
COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
               "collective-permute", "all-to-all")


def build_step(mesh, model_sharded):
    rng = np.random.default_rng(0)
    X = rng.random((B, D)).astype(np.float32) * 4
    Y = (np.sin(X[:, :1]) +
         rng.standard_normal((B, 1)).astype(np.float32) * 0.1)
    Z0 = rng.random((M_IND, D)) * 4

    m = Model()
    m.n = Variable()
    m.X = Variable(shape=(m.n, D))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    kernel = RBF(input_dim=D, variance=1.0, lengthscale=1.0)
    m.Y = SVGPRegression.define_variable(
        X=m.X, kernel=kernel, noise_var=m.noise_var, shape=(m.n, 1),
        inducing_inputs=Variable(shape=(M_IND, D), initial_value=Z0))
    alg = MAP(model=m, observed=[m.X, m.Y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(X=X, Y=Y)
    ex = create_executor(alg, infr.params)
    tr = dict(infr.params.trainable_params())
    fx = dict(infr.params.fixed_params())

    data_sh = NamedSharding(mesh, P("data", None))
    rep = NamedSharding(mesh, P())
    data = [jax.device_put(jnp.asarray(X), data_sh),
            jax.device_put(jnp.asarray(Y), data_sh)]
    q = m.Y.factor._extra_graphs[0]
    mg = m.Y.factor._module_graph
    m_axis = {q.qU_mean.uuid, q.qU_cov_W.uuid, q.qU_cov_diag.uuid,
              mg.inducing_inputs.uuid}

    def place(u, a):
        if model_sharded and u in m_axis:
            return jax.device_put(
                a, NamedSharding(mesh, P("model",
                                         *([None] * (a.ndim - 1)))))
        return jax.device_put(a, rep)

    tr = {u: place(u, a) for u, a in tr.items()}
    fx = {u: jax.device_put(a, rep) for u, a in fx.items()}
    opt = optax.adam(1e-2)
    opt_state = opt.init(tr)

    def step(tr, fx, opt_state, key):
        def lf(t):
            loss, lg, aux = ex(t, fx, data, key)
            return lg, loss
        (_, loss), g = jax.value_and_grad(lf, has_aux=True)(tr)
        up, opt_state2 = opt.update(g, opt_state, tr)
        return optax.apply_updates(tr, up), opt_state2, loss

    lowered = jax.jit(step).lower(tr, fx, opt_state,
                                  jax.random.PRNGKey(0))
    compiled = lowered.compile()
    return compiled, (tr, fx, opt_state)


def analyze(name, compiled, args):
    hlo = compiled.as_text()
    counts = {c: len(re.findall(r"\b{}\b".format(c), hlo))
              for c in COLLECTIVES}
    mem = compiled.memory_analysis()
    cost = compiled.cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    tr, fx, opt_state = args
    key = jax.random.PRNGKey(1)
    # wall-clock (serialized on this 1-core host; secondary evidence)
    tr2, st2, loss = compiled(tr, fx, opt_state, key)
    float(loss)
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        tr2, st2, loss = compiled(tr2, fx, st2, key)
    float(loss)
    dt = (time.perf_counter() - t0) / n
    print("{:28s} collectives={} temp={:7.1f}MB args={:7.1f}MB "
          "out={:6.1f}MB flops={:.2f}G  {:.0f} ms/step(serialized)"
          .format(name,
                  {k: v for k, v in counts.items() if v},
                  mem.temp_size_in_bytes / 2**20,
                  mem.argument_size_in_bytes / 2**20,
                  mem.output_size_in_bytes / 2**20,
                  cost.get("flops", float("nan")) / 1e9,
                  dt * 1e3))
    return counts, mem


def main():
    print("SVGP step, M={}, B={}, D={}, f32, 8 virtual CPU devices"
          .format(M_IND, B, D))
    mesh1d = make_mesh(8)

    class _P:  # 1-D mesh has no 'model' axis; alias data specs
        pass

    # A: pure data-parallel on a (8,)-data mesh
    compiledA, argsA = build_step(
        make_mesh_2d(8, 1), model_sharded=False)
    analyze("A 8x1 data, qU replicated", compiledA, argsA)
    # B: 2x4 data x model, qU/Z sharded over model
    compiledB, argsB = build_step(
        make_mesh_2d(2, 4), model_sharded=True)
    analyze("B 2x4, qU model-sharded", compiledB, argsB)
    # C: 2x4 mesh but qU replicated (isolates the mesh-shape effect)
    compiledC, argsC = build_step(
        make_mesh_2d(2, 4), model_sharded=False)
    analyze("C 2x4, qU replicated", compiledC, argsC)


if __name__ == "__main__":
    main()
