"""Mesh helper tests."""
import numpy as np
import jax

from mxfusion_tpu.parallel import (make_mesh, make_mesh_2d,
                                   initialize_distributed)


def test_make_mesh_2d_axes():
    mesh = make_mesh_2d(4, 2)
    assert mesh.axis_names == ("data", "model")
    assert mesh.devices.shape == (4, 2)


def test_initialize_distributed_single_host_noop():
    # single-process: must not raise or reinitialize anything
    initialize_distributed(num_processes=1)
    initialize_distributed(num_processes=None)


def test_module_expose_hidden_parameter():
    from mxfusion_tpu import Model, Variable
    from mxfusion_tpu.components.variables import PositiveTransformation
    from mxfusion_tpu.components.distributions.gp.kernels import RBF
    from mxfusion_tpu.modules import GPRegression

    m = Model()
    m.N = Variable()
    m.X = Variable(shape=(m.N, 1))
    m.noise_var = Variable(transformation=PositiveTransformation(),
                           initial_value=0.1)
    m.Y = GPRegression.define_variable(
        X=m.X, kernel=RBF(input_dim=1), noise_var=m.noise_var,
        shape=(m.N, 1))
    gp = m.Y.factor
    ls_internal = gp._module_graph.kernel.lengthscale
    exposed = gp.expose_hidden_parameters_as_input("kern_ls", ls_internal)
    assert exposed.uuid == ls_internal.uuid
    assert "kern_ls" in gp.input_names
    assert dict(gp.inputs)["kern_ls"].uuid == ls_internal.uuid
