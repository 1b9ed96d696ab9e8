"""Public-API surface regression: every symbol the docs advertise
(docs/api_reference.md) must import from its documented namespace.
Catches docs-vs-code drift and accidental export removals in one
place."""
import importlib

import pytest

SURFACE = {
    "mxfusion_tpu": [
        "Model", "Posterior", "FactorGraph", "Variable", "VariableType",
        "ModelComponent", "Factor", "__version__",
    ],
    "mxfusion_tpu.components.distributions": [
        "Normal", "MultivariateNormal", "NormalMeanPrecision",
        "MultivariateNormalMeanPrecision", "Gamma", "GammaMeanVariance",
        "Bernoulli", "Categorical", "Beta", "Dirichlet", "Wishart",
        "Uniform", "Laplace", "PointMass", "GaussianProcess",
        "ConditionalGaussianProcess", "Exponential", "Poisson",
        "StudentT", "LogNormal", "LogitNormal", "InverseGamma",
        "NormalMixture", "Concrete", "LinearGaussianSSM", "GaussianAR1",
        "StickBreakingNormal", "NegativeBinomial",
        "RandomGenerator", "FixedRandomGenerator",
    ],
    "mxfusion_tpu.components.distributions.gp.kernels": [
        "Kernel", "NativeKernel", "CombinationKernel",
        "StationaryKernel", "RBF", "Matern12", "Matern32", "Matern52",
        "Linear", "Bias", "White", "AddKernel", "MultiplyKernel",
        "RationalQuadratic", "Periodic", "Polynomial",
    ],
    "mxfusion_tpu.components.functions": [
        "Function", "FunctionEvaluation", "FlaxFunction",
    ],
    "mxfusion_tpu.modules": [
        "Module", "GPRegression", "SparseGPRegression",
        "SVGPRegression", "SVGPClassification",
        "SVGPPoissonRegression", "SVGPNegBinomialRegression",
        "SVGPMultiClassification", "LMCSVGPRegression",
        "DeepGPRegression",
        "DeepGPClassification",
    ],
    "mxfusion_tpu.inference": [
        "Inference", "TransferInference", "InferenceParameters",
        "GradBasedInference", "GradTransferInference",
        "BatchInferenceLoop", "MinibatchInferenceLoop",
        "StochasticVariationalInference", "create_Gaussian_meanfield",
        "MAP", "ScoreFunctionInference", "ScoreFunctionRBInference",
        "ForwardSamplingAlgorithm",
        "VariationalPosteriorForwardSampling",
        "merge_posterior_into_model", "ModulePredictionAlgorithm",
        "PILCOAlgorithm", "create_executor",
        "create_sampling_executor",
        "HMCAlgorithm", "HMCInference", "SGLDAlgorithm",
        "SGLDInference", "ChEESHMCAlgorithm", "ChEESHMCInference",
        "ParallelTemperingAlgorithm", "ParallelTemperingInference",
        "PowerPosteriorAlgorithm", "PowerPosteriorInference",
        "SVGDAlgorithm", "SVGDInference", "laplace_approximation",
        "LaplaceResult", "potential_scale_reduction",
        "effective_sample_size", "pointwise_log_likelihood", "waic",
        "loo_psis", "posterior_predictive_check", "BatchedPredictor",
        "NaturalGradientLoop",
    ],
    "mxfusion_tpu.inference.device_loop": ["DeviceMinibatchLoop"],
    "mxfusion_tpu.parallel": [
        "make_mesh", "make_mesh_2d", "shard_data", "batch_sharding",
        "replicate_tree", "DataParallelBatchLoop",
        "make_shard_map_step", "initialize_distributed",
    ],
    "mxfusion_tpu.ops.kalman": [
        "kalman_filter", "kalman_filter_parallel", "rts_smoother",
        "rts_smoother_parallel", "lgssm_sample",
    ],
    "mxfusion_tpu.ops.linalg": [
        "make_diagonal", "wide_triangular_solve", "triangular_inverse",
    ],
    "mxfusion_tpu.ops.precision": ["einsum", "set_data_precision"],
    "mxfusion_tpu.util.serialization": [],
    "mxfusion_tpu.util.checkpoint": [],
    "mxfusion_tpu.util.profiling": [],
}


@pytest.mark.parametrize("module_name", sorted(SURFACE))
def test_namespace_surface(module_name):
    mod = importlib.import_module(module_name)
    missing = [s for s in SURFACE[module_name] if not hasattr(mod, s)]
    assert not missing, "{} lacks documented symbols: {}".format(
        module_name, missing)
