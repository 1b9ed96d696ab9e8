from .linalg import make_diagonal, broadcast_to_w_samples, cholesky_logdet
from . import pallas_kernels
