"""Framework-independent SVGP-ELBO + adam trajectory oracle (PyTorch).

This module implements the uncollapsed (Hensman-style) SVGP regression
evidence lower bound, its gradients (via torch autograd — a different
AD engine than JAX), and the adam update rule, in float64 on CPU,
WITHOUT importing mxfusion_tpu. It plays the role GPy plays for the
reference framework (/root/reference/testing/modules/
gpregression_test.py:82-109: an external library validates the whole
GP stack): an independent implementation that the framework's full
optimization trajectory — bound value, gradients, and optimizer
updates, step by step — must reproduce.

The bound is written in its canonical textbook form (Hensman et al.
2013, eq. 4; Titsias-style trace correction), NOT as a transliteration
of the framework's fused form:

    ELBO = sum_n log N(y_n | mu_f(x_n), sigma^2)
         - 1/(2 sigma^2) sum_n [ k(x_n,x_n) - q(x_n,x_n) ]
         - 1/(2 sigma^2) sum_n var_S[f_n]
         - KL( q(U) || p(U) )

with q(U) = N(mu, S), S = W W^T + diag(d), mu_f = Kfu Kuu^-1 mu,
q(x,x) = Kfu Kuu^-1 Kuf, var_S[f] = diag(Kfu Kuu^-1 S Kuu^-1 Kuf).

Parameterization contract shared with the framework (its public API):
positive parameters (kernel variance/lengthscale, noise variance, the
diagonal d) are softplus-transformed from unconstrained space; W and
mu and the inducing inputs Z are unconstrained; Kuu gets +jitter*I.

The adam rule matches optax.adam's documented formulation (b1=0.9,
b2=0.999, eps=1e-8 added OUTSIDE the square root, bias-corrected
moments).
"""
import numpy as np
import torch

torch.set_default_dtype(torch.float64)


def softplus(x):
    return torch.nn.functional.softplus(x)


def rbf_K(X, X2, raw_lengthscale, raw_variance):
    """RBF gram at softplus-transformed hyperparameters.

    Computed from actual pairwise differences (numerically the safest
    form) — deliberately NOT the |x|^2+|x'|^2-2xx' expansion, so the
    oracle is an independent derivation.
    """
    ls = softplus(raw_lengthscale)          # (D,) or (1,)
    var = softplus(raw_variance)            # (1,)
    Xs = X / ls
    X2s = X2 / ls
    d2 = ((Xs[:, None, :] - X2s[None, :, :]) ** 2).sum(-1)
    return var * torch.exp(-0.5 * d2)


def svgp_neg_elbo(params, X, Y, jitter):
    """-ELBO of the uncollapsed SVGP bound; ``params`` is a dict of
    torch tensors: Z (M,D), raw_noise (1,), raw_variance (1,),
    raw_lengthscale (1,)|(D,), qU_mean (M,Dout), qU_cov_W (M,M),
    raw_qU_cov_diag (M,)."""
    Z = params["Z"]
    M = Z.shape[0]
    Dout = params["qU_mean"].shape[-1]
    sigma2 = softplus(params["raw_noise"])
    Kuu = rbf_K(Z, Z, params["raw_lengthscale"], params["raw_variance"])
    Kuu = Kuu + jitter * torch.eye(M)
    Kuf = rbf_K(Z, X, params["raw_lengthscale"], params["raw_variance"])
    Kff_diag = softplus(params["raw_variance"]).expand(X.shape[0])

    W = params["qU_cov_W"]
    S = W @ W.T + torch.diag(softplus(params["raw_qU_cov_diag"]))
    mu = params["qU_mean"]

    L = torch.linalg.cholesky(Kuu)
    Ls = torch.linalg.cholesky(S)

    A = torch.linalg.solve_triangular(L, Kuf, upper=False)  # L^-1 Kuf
    Linv_mu = torch.linalg.solve_triangular(L, mu, upper=False)
    Linv_Ls = torch.linalg.solve_triangular(L, Ls, upper=False)

    mu_f = A.T @ Linv_mu                                   # (N, Dout)
    qff_diag = (A ** 2).sum(0)                             # (N,)
    # var_S[f_n] = || Ls^T Kuu^-1 k_n ||^2 = column sums of (Linv_Ls^T A)^2
    var_f = ((Linv_Ls.T @ A) ** 2).sum(0)                  # (N,)

    # Gaussian likelihood at the predictive mean
    resid = Y - mu_f
    loglik = -0.5 * ((resid ** 2).sum() / sigma2.squeeze()
                     + Y.numel() * torch.log(2.0 * torch.tensor(np.pi)
                                             * sigma2.squeeze()))
    # trace corrections (each output column pays the same trace)
    trace_term = -0.5 * Dout * ((Kff_diag - qff_diag).sum()
                                + var_f.sum()) / sigma2.squeeze()

    # KL(q || p) per column, S shared across columns
    kl = (Dout * (torch.log(torch.diagonal(L)).sum()
                  - torch.log(torch.diagonal(Ls)).sum())
          - 0.5 * Dout * M
          + 0.5 * Dout * (Linv_Ls ** 2).sum()
          + 0.5 * (Linv_mu ** 2).sum())

    elbo = loglik + trace_term - kl
    return -elbo


class Adam:
    """optax.adam's update rule (bias-corrected moments, eps outside
    the sqrt), hand-rolled so the oracle shares no optimizer code with
    the framework."""

    def __init__(self, lr, b1=0.9, b2=0.999, eps=1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.t = 0
        self.m = {}
        self.v = {}

    def step(self, params, grads):
        self.t += 1
        out = {}
        for k, p in params.items():
            g = grads[k]
            m = self.m.get(k, torch.zeros_like(p))
            v = self.v.get(k, torch.zeros_like(p))
            m = self.b1 * m + (1 - self.b1) * g
            v = self.b2 * v + (1 - self.b2) * g * g
            self.m[k], self.v[k] = m, v
            m_hat = m / (1 - self.b1 ** self.t)
            v_hat = v / (1 - self.b2 ** self.t)
            out[k] = p - self.lr * m_hat / (torch.sqrt(v_hat) + self.eps)
        return out


def run_trajectory(init_params, X, Y, jitter, lr, n_steps):
    """Adam-optimize -ELBO from ``init_params`` (dict of numpy arrays,
    UNCONSTRAINED space); returns the per-step loss list (loss at the
    pre-update parameters of each step, matching a framework loop that
    reports the loss evaluated before applying that step's update)."""
    X = torch.as_tensor(np.array(X, copy=True))
    Y = torch.as_tensor(np.array(Y, copy=True))
    params = {k: torch.as_tensor(np.array(v, copy=True))
              for k, v in init_params.items()}
    opt = Adam(lr)
    losses = []
    for _ in range(n_steps):
        for p in params.values():
            p.requires_grad_(True)
            if p.grad is not None:
                p.grad = None
        loss = svgp_neg_elbo(params, X, Y, jitter)
        loss.backward()
        losses.append(float(loss.detach()))
        grads = {k: p.grad.detach() for k, p in params.items()}
        params = {k: p.detach() for k, p in params.items()}
        params = opt.step(params, grads)
    return losses, {k: v.detach().numpy() for k, v in params.items()}


def run_trajectory_chunked(init_params, X, Y, jitter, lr, n_steps,
                           chunk=100_000):
    """Same trajectory contract as :func:`run_trajectory`, but the
    data-dependent part of the bound is evaluated (and backpropagated)
    in ``chunk``-row pieces with gradient ACCUMULATION, so the oracle
    scales to the literal 10^6-point north-star config without
    materializing an (M, N) float64 panel for autograd all at once.
    The sum of chunk losses plus the KL is mathematically the same
    bound; f64 makes the chunked re-association a ~1e-12 effect.
    """
    X = torch.as_tensor(np.array(X, copy=True))
    Y = torch.as_tensor(np.array(Y, copy=True))
    params = {k: torch.as_tensor(np.array(v, copy=True))
              for k, v in init_params.items()}
    opt = Adam(lr)
    losses = []
    N = X.shape[0]
    for _ in range(n_steps):
        for p in params.values():
            p.requires_grad_(True)
            if p.grad is not None:
                p.grad = None
        total = 0.0
        # KL term: its own small graph, backward immediately
        kl = _svgp_kl_term(params, jitter)
        kl.backward()
        total += float(kl.detach())
        for lo in range(0, N, chunk):
            piece = _svgp_datafit_term(params, X[lo:lo + chunk],
                                       Y[lo:lo + chunk], jitter)
            piece.backward()   # grads ACCUMULATE across chunks
            total += float(piece.detach())
        losses.append(total)
        grads = {k: p.grad.detach() for k, p in params.items()}
        params = {k: p.detach() for k, p in params.items()}
        params = opt.step(params, grads)
    return losses, {k: v.detach().numpy() for k, v in params.items()}


def _svgp_kl_term(params, jitter):
    """KL(q(U) || p(U)) piece of svgp_neg_elbo (positive contribution
    to the NEGATIVE elbo)."""
    Z = params["Z"]
    M = Z.shape[0]
    Dout = params["qU_mean"].shape[-1]
    Kuu = rbf_K(Z, Z, params["raw_lengthscale"], params["raw_variance"])
    Kuu = Kuu + jitter * torch.eye(M)
    W = params["qU_cov_W"]
    S = W @ W.T + torch.diag(softplus(params["raw_qU_cov_diag"]))
    mu = params["qU_mean"]
    L = torch.linalg.cholesky(Kuu)
    Ls = torch.linalg.cholesky(S)
    Linv_mu = torch.linalg.solve_triangular(L, mu, upper=False)
    Linv_Ls = torch.linalg.solve_triangular(L, Ls, upper=False)
    kl = (Dout * (torch.log(torch.diagonal(L)).sum()
                  - torch.log(torch.diagonal(Ls)).sum())
          - 0.5 * Dout * M
          + 0.5 * Dout * (Linv_Ls ** 2).sum()
          + 0.5 * (Linv_mu ** 2).sum())
    return kl


def _svgp_datafit_term(params, Xc, Yc, jitter):
    """Data-dependent piece of svgp_neg_elbo for a row chunk: negative
    log-likelihood at the predictive mean plus the two trace
    corrections (everything except the KL)."""
    Z = params["Z"]
    M = Z.shape[0]
    Dout = params["qU_mean"].shape[-1]
    sigma2 = softplus(params["raw_noise"]).squeeze()
    Kuu = rbf_K(Z, Z, params["raw_lengthscale"], params["raw_variance"])
    Kuu = Kuu + jitter * torch.eye(M)
    Kuf = rbf_K(Z, Xc, params["raw_lengthscale"], params["raw_variance"])
    Kff_diag = softplus(params["raw_variance"]).expand(Xc.shape[0])
    W = params["qU_cov_W"]
    S = W @ W.T + torch.diag(softplus(params["raw_qU_cov_diag"]))
    mu = params["qU_mean"]
    L = torch.linalg.cholesky(Kuu)
    Ls = torch.linalg.cholesky(S)
    A = torch.linalg.solve_triangular(L, Kuf, upper=False)
    Linv_mu = torch.linalg.solve_triangular(L, mu, upper=False)
    Linv_Ls = torch.linalg.solve_triangular(L, Ls, upper=False)
    mu_f = A.T @ Linv_mu
    qff_diag = (A ** 2).sum(0)
    var_f = ((Linv_Ls.T @ A) ** 2).sum(0)
    resid = Yc - mu_f
    loglik = -0.5 * ((resid ** 2).sum() / sigma2
                     + Yc.numel() * torch.log(2.0 * torch.tensor(np.pi)
                                              * sigma2))
    trace_term = -0.5 * Dout * ((Kff_diag - qff_diag).sum()
                                + var_f.sum()) / sigma2
    return -(loglik + trace_term)


# ---------------------------------------------------------------------
# Exact-GP marginal likelihood and the Titsias collapsed sparse bound —
# the other two bound families the reference validates against GPy
# (/root/reference/testing/modules/gpregression_test.py,
# sparsegpregression_test.py). Same conventions as svgp_neg_elbo.
# ---------------------------------------------------------------------

def gpr_neg_mll(params, X, Y):
    """-log N(y | 0, K + sigma^2 I): params = Z-free dict with
    raw_noise, raw_variance, raw_lengthscale."""
    N = X.shape[0]
    sigma2 = softplus(params["raw_noise"]).squeeze()
    K = rbf_K(X, X, params["raw_lengthscale"], params["raw_variance"])
    C = K + sigma2 * torch.eye(N)
    L = torch.linalg.cholesky(C)
    a = torch.linalg.solve_triangular(L, Y, upper=False)
    mll = -0.5 * ((a ** 2).sum()
                  + Y.numel() * torch.log(2.0 * torch.tensor(np.pi)))
    mll = mll - Y.shape[1] * torch.log(torch.diagonal(L)).sum()
    return -mll


def titsias_neg_bound(params, X, Y, jitter):
    """-[ log N(y | 0, Qnn + sigma^2 I) - tr(Knn - Qnn)/(2 sigma^2) ]
    with Qnn = Kfu Kuu^-1 Kuf; params adds Z (M, D)."""
    Z = params["Z"]
    M = Z.shape[0]
    N = X.shape[0]
    sigma2 = softplus(params["raw_noise"]).squeeze()
    Kuu = rbf_K(Z, Z, params["raw_lengthscale"], params["raw_variance"])
    Kuu = Kuu + jitter * torch.eye(M)
    Kuf = rbf_K(Z, X, params["raw_lengthscale"], params["raw_variance"])
    Kff_diag = softplus(params["raw_variance"]).expand(N)

    L = torch.linalg.cholesky(Kuu)
    A = torch.linalg.solve_triangular(L, Kuf, upper=False)   # (M, N)
    # log N(y | 0, A^T A + sigma^2 I) via the M x M Woodbury core
    B = torch.eye(M) + (A @ A.T) / sigma2
    LB = torch.linalg.cholesky(B)
    AY = A @ Y / sigma2
    c = torch.linalg.solve_triangular(LB, AY, upper=False)
    quad = ((Y ** 2).sum() / sigma2 - (c ** 2).sum())
    logdet = (Y.shape[1]
              * (2.0 * torch.log(torch.diagonal(LB)).sum()
                 + N * torch.log(sigma2)))
    loglik = -0.5 * (quad + logdet
                     + Y.numel() * torch.log(2.0 * torch.tensor(np.pi)))
    trace = (Kff_diag.sum() - (A ** 2).sum()) / (2.0 * sigma2) \
        * Y.shape[1]
    return -(loglik - trace)


def run_bound_trajectory(neg_bound, init_params, X, Y, lr, n_steps,
                         **kw):
    """Adam-optimize an arbitrary torch bound; same reporting contract
    as run_trajectory."""
    X = torch.as_tensor(np.array(X, copy=True))
    Y = torch.as_tensor(np.array(Y, copy=True))
    params = {k: torch.as_tensor(np.array(v, copy=True))
              for k, v in init_params.items()}
    opt = Adam(lr)
    losses = []
    for _ in range(n_steps):
        for p in params.values():
            p.requires_grad_(True)
            if p.grad is not None:
                p.grad = None
        loss = neg_bound(params, X, Y, **kw)
        loss.backward()
        losses.append(float(loss.detach()))
        grads = {k: p.grad.detach() for k, p in params.items()}
        params = {k: p.detach() for k, p in params.items()}
        params = opt.step(params, grads)
    return losses, {k: v.detach().numpy() for k, v in params.items()}
