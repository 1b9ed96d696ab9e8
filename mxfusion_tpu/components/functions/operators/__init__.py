from .operators import Operator, operator_definition
from .operator_impl import (
    add, subtract, multiply, divide, power, square, exp, log, sigmoid,
    tanh, softplus, probit, sum, mean, prod, dot, diag, reshape,
    transpose, broadcast_to)
