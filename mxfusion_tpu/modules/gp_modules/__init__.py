from .gp_regression import GPRegression
