"""2-state diagonal-covariance Gaussian HMM: EM fit + Viterbi decode in JAX.

Native replacement for the reference's hmmlearn dependency
(scaffoldToChromosomes.py:797-801).  Semantics mirror
hmmlearn.hmm.GaussianHMM(n_components=2, covariance_type="diag",
n_iter=1000, init_params="cm", params="cmt") as configured there:

* means initialized by k-means (sklearn, as hmmlearn does);
* diag covariances initialized from the data covariance + min_covar;
* startprob stays UNIFORM throughout: the reference assigns
  ``model.startmat_`` (a typo for ``startprob_``, :798), so hmmlearn's
  uniform fallback is what actually runs — reproduced here;
* transmat starts at the reference's fixed [[.9,.1],[1e-4,.9999]] and IS
  re-estimated ("t" in params);
* EM stops when the log-likelihood gain drops below tol=1e-2 (hmmlearn's
  default) or after n_iter iterations;
* predict == Viterbi decoding (hmmlearn's default decoder).

Forward/backward/Viterbi run as lax.scan recursions over time in log
space; per-frame Gaussian log-densities are one (T, D) x (D, K) matmul —
the MXU-friendly formulation of the E step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

_MIN_COVAR = 1e-3
_LOG2PI = float(np.log(2.0 * np.pi))


@jax.jit
def _log_gaussian_diag(X, means, covars):
    """log N(x_t | mu_k, diag(sig_k)) for all t, k — matmul form."""
    # sum_d [ (x-mu)^2 / sig + log sig + log 2pi ] * -0.5
    inv = 1.0 / covars                                      # [K, D]
    quad = (
        (X ** 2) @ inv.T
        - 2.0 * (X @ (means * inv).T)
        + jnp.sum(means ** 2 * inv, axis=1)[None, :]
    )
    logdet = jnp.sum(jnp.log(covars), axis=1)[None, :]
    D = X.shape[1]
    return -0.5 * (quad + logdet + D * _LOG2PI)


def _logsumexp(a, axis=None):
    m = jnp.max(a, axis=axis, keepdims=True)
    # all--inf slices (structural zeros in the transmat) must yield -inf,
    # not NaN from (-inf) - (-inf)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    out = m_safe + jnp.log(jnp.sum(jnp.exp(a - m_safe), axis=axis, keepdims=True))
    return out.squeeze(axis)


@jax.jit
def _forward_backward(log_b, log_start, log_trans):
    """Returns (logprob, gamma, xi_sum)."""

    def fwd_step(alpha, lb):
        nxt = _logsumexp(alpha[:, None] + log_trans, axis=0) + lb
        return nxt, nxt

    alpha0 = log_start + log_b[0]
    _, alphas = jax.lax.scan(fwd_step, alpha0, log_b[1:])
    alphas = jnp.concatenate([alpha0[None], alphas])
    logprob = _logsumexp(alphas[-1], axis=0)

    def bwd_step(beta, lb):
        prev = _logsumexp(log_trans + (lb + beta)[None, :], axis=1)
        return prev, prev

    betaT = jnp.zeros_like(alpha0)
    _, betas_rev = jax.lax.scan(bwd_step, betaT, log_b[1:][::-1])
    betas = jnp.concatenate([betas_rev[::-1], betaT[None]])

    gamma = alphas + betas - logprob
    gamma = jnp.exp(gamma - _logsumexp(gamma, axis=1)[:, None])

    # xi_sum[i, j] = sum_t P(z_t = i, z_{t+1} = j | X)
    log_xi = (
        alphas[:-1, :, None]
        + log_trans[None, :, :]
        + (log_b[1:] + betas[1:])[:, None, :]
        - logprob
    )
    xi_sum = jnp.exp(_logsumexp(log_xi, axis=0))
    return logprob, gamma, xi_sum


@jax.jit
def _m_step(X, gamma, xi_sum):
    norm = jnp.maximum(gamma.sum(axis=0)[:, None], 1e-300)  # [K, 1]
    means = (gamma.T @ X) / norm
    covars = (gamma.T @ (X ** 2)) / norm - means ** 2 + _MIN_COVAR
    row = xi_sum.sum(axis=1, keepdims=True)
    trans = xi_sum / jnp.where(row > 0, row, 1.0)
    return means, jnp.maximum(covars, _MIN_COVAR), trans


@functools.partial(jax.jit, static_argnames=("n_iter",))
def _em_fit(X, means0, covars0, trans0, log_start, tol, n_iter):
    """Device-resident EM: the whole fit is ONE dispatch.

    lax.while_loop over iterations (no host sync per step — behind a
    tunneled link the per-iteration readback of the log-likelihood used
    to cost ~150 ms x up to n_iter).  Semantics identical to the python
    loop it replaces: lp is computed from the PRE-update parameters,
    the M-step always applies, and the loop stops once lp - prev_lp <
    tol (hmmlearn's convergence rule) or after n_iter iterations.
    """

    def cond(carry):
        _m, _c, _t, _prev, i, done = carry
        return jnp.logical_and(~done, i < n_iter)

    def body(carry):
        means, covars, trans, prev_lp, i, _done = carry
        log_b = _log_gaussian_diag(X, means, covars)
        lp, gamma, xi = _forward_backward(log_b, log_start, jnp.log(trans))
        means, covars, trans = _m_step(X, gamma, xi)
        return (means, covars, trans, lp, i + 1, lp - prev_lp < tol)

    carry0 = (means0, covars0, trans0, -jnp.inf, 0, jnp.bool_(False))
    means, covars, trans, _lp, _i, _done = jax.lax.while_loop(cond, body, carry0)
    return means, covars, trans


@jax.jit
def _viterbi(log_b, log_start, log_trans):
    def step(delta, lb):
        scores = delta[:, None] + log_trans
        best = jnp.argmax(scores, axis=0)
        nxt = jnp.max(scores, axis=0) + lb
        return nxt, best

    delta0 = log_start + log_b[0]
    last, backptrs = jax.lax.scan(step, delta0, log_b[1:])

    def backtrack(state, bp):
        prev = bp[state]
        return prev, prev

    final = jnp.argmax(last)
    _, path_rev = jax.lax.scan(backtrack, final, backptrs[::-1])
    return jnp.concatenate([path_rev[::-1], final[None]])


class GaussianHMM2:
    """The reference's exact HMM configuration, TPU-native."""

    def __init__(
        self,
        n_iter: int = 1000,
        tol: float = 1e-2,
        seed: int = 0,
        startprob: Tuple[float, float] = (0.5, 0.5),
        transmat=((0.9, 0.1), (1e-4, 0.9999)),
    ):
        self.n_iter = n_iter
        self.tol = tol
        self.seed = seed
        self.startprob = np.asarray(startprob, dtype=np.float64)
        self.transmat_init = np.asarray(transmat, dtype=np.float64)
        self.means_: np.ndarray = None
        self.covars_: np.ndarray = None
        self.transmat_: np.ndarray = None

    def _init_params(self, X: np.ndarray):
        from sklearn.cluster import KMeans

        km = KMeans(n_clusters=2, random_state=self.seed, n_init=10)
        means = km.fit(X).cluster_centers_
        cv = np.cov(X.T) + _MIN_COVAR * np.eye(X.shape[1])
        covars = np.tile(np.diag(cv), (2, 1))
        return means, np.maximum(covars, _MIN_COVAR)

    def fit(self, X) -> "GaussianHMM2":
        X = np.asarray(X, dtype=np.float64)
        means, covars = self._init_params(X)
        log_start = jnp.log(jnp.asarray(self.startprob))
        means_j, covars_j, trans_j = _em_fit(
            jnp.asarray(X),
            jnp.asarray(means),
            jnp.asarray(covars),
            jnp.asarray(self.transmat_init),
            log_start,
            self.tol,
            self.n_iter,
        )
        self.means_ = np.asarray(means_j)
        self.covars_ = np.asarray(covars_j)
        self.transmat_ = np.asarray(trans_j)
        return self

    def predict(self, X) -> np.ndarray:
        X = jnp.asarray(np.asarray(X, dtype=np.float64))
        log_b = _log_gaussian_diag(X, jnp.asarray(self.means_), jnp.asarray(self.covars_))
        path = _viterbi(
            log_b, jnp.log(jnp.asarray(self.startprob)), jnp.log(jnp.asarray(self.transmat_))
        )
        return np.asarray(path)
