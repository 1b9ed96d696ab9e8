"""mxfusion_tpu: a TPU-native modular deep probabilistic programming library.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
amzn/MXFusion (reference mounted at /root/reference): factor-graph model
IR, 15+ distributions, GP modules with built-in inference, variational /
MAP / BBVI / sampling algorithms — compiled to single XLA programs with
``jax.jit``, vmapped over Monte-Carlo samples, and data-parallel over
``jax.sharding`` meshes.
"""
from .__version__ import __version__
from .models import Model, Posterior, FactorGraph
from .components import Variable, VariableType, Factor, ModelComponent
from . import common
from . import components
from . import inference
from . import models
from . import modules
from . import ops
from . import util
