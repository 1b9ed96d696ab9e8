"""Multi-host (DCN) runtime: 2 OS processes, one CPU device each,
joined by ``parallel.initialize_distributed`` into a global 2-device
mesh, evaluating the GSPMD-sharded SVI objective on globally-sharded
data. Validates the code path a real multi-host TPU slice uses
(jax.distributed + global mesh + data sharded across processes), which
the in-process virtual-mesh tests cannot reach.
"""
import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r'''
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
port = sys.argv[2]
from mxfusion_tpu.parallel import (initialize_distributed, make_mesh,
                                   batch_sharding)
initialize_distributed(coordinator_address="127.0.0.1:" + port,
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2

from mxfusion_tpu import Model, Variable
from mxfusion_tpu.components.distributions import Normal
from mxfusion_tpu.components.functions.operators import broadcast_to
from mxfusion_tpu.components.variables import PositiveTransformation
from mxfusion_tpu.inference import (GradBasedInference,
    StochasticVariationalInference, create_Gaussian_meanfield,
    create_executor)

N = 160
rng = np.random.default_rng(0)
y = rng.standard_normal((N, 1)) + 2.0          # same data everywhere
m = Model()
m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
m.s = Variable(transformation=PositiveTransformation(), initial_value=5.)
m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                             variance=broadcast_to(m.s, (N, 1)),
                             shape=(N, 1))
q = create_Gaussian_meanfield(model=m, observed=[m.y])
alg = StochasticVariationalInference(num_samples=6, model=m,
                                     posterior=q, observed=[m.y])
infr = GradBasedInference(inference_algorithm=alg)
infr.initialize(y=y)
ex = create_executor(alg, infr.params)

mesh = make_mesh()                              # 2 devices, 2 processes
sharding = batch_sharding(mesh, 2)
local = y[pid * (N // 2):(pid + 1) * (N // 2)]  # this process's shard
y_global = jax.make_array_from_process_local_data(sharding, local,
                                                  global_shape=(N, 1))
loss, _, _ = jax.jit(ex)(infr.params.trainable_params(),
                         infr.params.fixed_params(), [y_global],
                         jax.random.PRNGKey(7))
print("MULTIHOST_LOSS", pid, float(loss), flush=True)
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dcn_objective_matches_single_process(tmp_path):
    # single-process reference value (same model/data/key, CPU)
    import jax
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.distributions import Normal
    from mxfusion_tpu.components.functions.operators import broadcast_to
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.inference import (GradBasedInference,
        StochasticVariationalInference, create_Gaussian_meanfield,
        create_executor)

    N = 160
    rng = np.random.default_rng(0)
    y = rng.standard_normal((N, 1)) + 2.0
    m = Model()
    m.mu = Normal.define_variable(mean=0., variance=100., shape=(1,))
    m.s = Variable(transformation=PositiveTransformation(),
                   initial_value=5.)
    m.y = Normal.define_variable(mean=broadcast_to(m.mu, (N, 1)),
                                 variance=broadcast_to(m.s, (N, 1)),
                                 shape=(N, 1))
    q = create_Gaussian_meanfield(model=m, observed=[m.y])
    alg = StochasticVariationalInference(num_samples=6, model=m,
                                         posterior=q, observed=[m.y])
    infr = GradBasedInference(inference_algorithm=alg)
    infr.initialize(y=y)
    ex = create_executor(alg, infr.params)
    ref = float(jax.jit(ex)(infr.params.trainable_params(),
                            infr.params.fixed_params(), [y],
                            jax.random.PRNGKey(7))[0])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = str(_free_port())
    repo_root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process, real DCN split
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        cwd=repo_root)
        for i in range(2)]
    losses = {}
    for p in procs:
        out, _ = p.communicate(timeout=240)
        text = out.decode()
        assert p.returncode == 0, text[-2000:]
        for line in text.splitlines():
            if line.startswith("MULTIHOST_LOSS"):
                _, pid, val = line.split()
                losses[int(pid)] = float(val)
    assert set(losses) == {0, 1}, losses
    # every process computed the SAME global objective, equal to the
    # single-process value
    assert np.isclose(losses[0], losses[1], rtol=1e-6)
    assert np.isclose(losses[0], ref, rtol=1e-5), (losses, ref)
