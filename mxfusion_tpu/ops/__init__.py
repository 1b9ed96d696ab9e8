from .linalg import make_diagonal, broadcast_to_w_samples, cholesky_logdet
from .blocked_cholesky import blocked_cholesky
from .pallas_batched_cholesky import batched_cholesky
from . import pallas_kernels
