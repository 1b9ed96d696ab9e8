from .function_evaluation import (
    FunctionEvaluation, FunctionEvaluationWithParameters)
from .function import Function
from .flax_function import FlaxFunction
from . import operators
