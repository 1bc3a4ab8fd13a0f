"""Parallel-in-time GPSSM engine (infer/pit_gpssm.py).

Three oracles, per the suite's 3-level strategy (SURVEY §4):
- the general-D parallel LGSSM smoother vs a hand-written sequential
  Kalman filter + RTS smoother (analytic ground truth);
- the SLR transition moments vs Monte Carlo;
- engine-level: gpssm_vmp_pit's returned state is THE SAME fixed point as
  the Jacobi engine's (it ends with exact Jacobi sweeps of the same
  mean-field map) — means/q(v)/q(W)/FE to round-off.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.infer.chain_smoother import gpssm_vmp
from gaussianprocessnode_tpu.infer.pit_gpssm import (
    gpssm_vmp_pit,
    parallel_lgssm_smooth,
    slr_transition,
)
from gaussianprocessnode_tpu.nodes.multisgp import _split_blocks
from gaussianprocessnode_tpu.ops import quadrature as quad
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus


def _random_lgssm(T=40, D=2, seed=0):
    rng = np.random.default_rng(seed)
    A = 0.9 * np.stack([np.linalg.qr(rng.standard_normal((D, D)))[0]
                        for _ in range(T)])
    b = 0.3 * rng.standard_normal((T, D))
    Q = np.stack([np.diag(rng.uniform(0.05, 0.3, D)) for _ in range(T)])
    m0 = rng.standard_normal(D)
    V0 = 0.5 * np.eye(D)
    R = 0.2 * np.eye(D)
    # simulate
    x = m0 + np.linalg.cholesky(V0) @ rng.standard_normal(D)
    ys = []
    for t in range(T):
        x = A[t] @ x + b[t] + np.linalg.cholesky(Q[t]) @ rng.standard_normal(D)
        ys.append(x + np.linalg.cholesky(R) @ rng.standard_normal(D))
    return A, b, Q, m0, V0, R, np.asarray(ys)


def _sequential_kalman_rts(A, b, Q, m0, V0, R, ys):
    """Reference Kalman filter + RTS smoother (numpy, H = I)."""
    T, D = ys.shape
    fm, fP, mp, Pp = [m0], [V0], [None], [None]
    for t in range(T):
        m_pred = A[t] @ fm[-1] + b[t]
        P_pred = A[t] @ fP[-1] @ A[t].T + Q[t]
        S = P_pred + R
        K = P_pred @ np.linalg.inv(S)
        fm.append(m_pred + K @ (ys[t] - m_pred))
        fP.append((np.eye(D) - K) @ P_pred)
        mp.append(m_pred)
        Pp.append(P_pred)
    sm, sP = [fm[-1]], [fP[-1]]
    for t in range(T - 1, -1, -1):
        G = fP[t] @ A[t].T @ np.linalg.inv(Pp[t + 1])
        sm.insert(0, fm[t] + G @ (sm[0] - mp[t + 1]))
        sP.insert(0, fP[t] + G @ (sP[0] - Pp[t + 1]) @ G.T)
    return np.asarray(sm), np.asarray(sP)


class TestParallelLGSSM:
    def test_matches_sequential_kalman_rts(self):
        A, b, Q, m0, V0, R, ys = _random_lgssm()
        sm_ref, sP_ref = _sequential_kalman_rts(A, b, Q, m0, V0, R, ys)
        sm, sP = parallel_lgssm_smooth(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(Q),
            jnp.asarray(m0), jnp.asarray(V0), jnp.asarray(ys),
            jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(sm), sm_ref,
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(sP), sP_ref,
                                   rtol=1e-8, atol=1e-11)

    def test_d3_state(self):
        """D = 3 exercises the _inv33 dispatch of _inv_batched."""
        A, b, Q, m0, V0, R, ys = _random_lgssm(T=25, D=3, seed=3)
        sm_ref, sP_ref = _sequential_kalman_rts(A, b, Q, m0, V0, R, ys)
        sm, sP = parallel_lgssm_smooth(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(Q),
            jnp.asarray(m0), jnp.asarray(V0), jnp.asarray(ys),
            jnp.asarray(R))
        np.testing.assert_allclose(np.asarray(sm), sm_ref,
                                   rtol=1e-8, atol=1e-10)
        np.testing.assert_allclose(np.asarray(sP), sP_ref,
                                   rtol=1e-7, atol=1e-10)


class TestSLR:
    def test_moments_match_monte_carlo(self):
        """A/b/Ω from the sigma-point SLR vs a 200k-sample linear
        regression of the GP posterior-mean transition."""
        rng = np.random.default_rng(1)
        M, D = 8, 2
        Xu = jnp.asarray(rng.standard_normal((M, D)))
        kernel = Kernel("se", transform="softplus")
        theta = invsoftplus(jnp.asarray([1.0, 0.8, 1.2]))
        mu_v = jnp.asarray(rng.standard_normal(M * D))
        mu_blocks = _split_blocks(mu_v, M, D)
        means = jnp.asarray(rng.standard_normal((3, D)) * 0.5)
        # input covariances inside the kernel lengthscale; the MC oracle
        # catches FORMULA errors (which would be O(1)) — the residual
        # ~0.03 disagreement on A is the 2D-point rule's own cubature
        # error, and exactness of the plumbing is pinned by the LGSSM and
        # engine-level fixed-point tests
        covs = jnp.asarray(np.stack([np.diag(rng.uniform(0.01, 0.04, D))
                                     for _ in range(3)]))
        A, b, om = slr_transition(
            kernel, theta, Xu, quad.SphericalRadial(), mu_blocks, means, covs)

        def m_fn(x):
            return mu_blocks @ kernel(theta, Xu, x[None, :])[:, 0]

        n_mc = 200_000
        for t in range(3):
            L = np.linalg.cholesky(np.asarray(covs[t]))
            xs = np.asarray(means[t]) + rng.standard_normal((n_mc, D)) @ L.T
            fs = np.asarray(jax.vmap(m_fn)(jnp.asarray(xs)))
            dx = xs - xs.mean(0)
            df = fs - fs.mean(0)
            C = dx.T @ df / n_mc
            A_mc = C.T @ np.linalg.inv(np.asarray(covs[t]))
            b_mc = fs.mean(0) - A_mc @ np.asarray(means[t])
            om_mc = df.T @ df / n_mc - A_mc @ C
            np.testing.assert_allclose(np.asarray(A[t]), A_mc, atol=0.05)
            np.testing.assert_allclose(np.asarray(b[t]), b_mc, atol=0.05)
            np.testing.assert_allclose(np.asarray(om[t]), om_mc, atol=0.05)
            # Ω PSD (the jitter floor guarantees it)
            assert np.linalg.eigvalsh(np.asarray(om[t])).min() > 0


def _chain_problem(T=60, seed=0):
    rng = np.random.default_rng(seed)
    D, M = 2, 12
    dt = 0.05
    x = np.array([1.5, 0.0])
    ys = []
    for _ in range(T):
        x = np.array([x[0] + x[1] * dt, x[1] - 9.81 * np.sin(x[0]) * dt]) \
            + 0.02 * rng.standard_normal(2)
        ys.append(x + 0.1 * rng.standard_normal(2))
    ys = jnp.asarray(np.asarray(ys))
    Xu = jnp.asarray(np.stack([np.linspace(-2, 2, M),
                               np.linspace(-4, 4, M)], 1))
    kernel = Kernel("se", transform="softplus")
    theta = invsoftplus(jnp.asarray([1.0, 1.0, 1.0]))
    prior_v = MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0)
    P = 0.01 * jnp.eye(2)
    return (kernel, theta, Xu, ys, P, jnp.asarray([1.5, 0.0]),
            0.1 * jnp.eye(2), prior_v, 100.0, jnp.eye(2))


class TestEngineEquivalence:
    def test_same_fixed_point_as_jacobi(self):
        """PIT sweeps + polish land on the Jacobi engine's fixed point to
        round-off (measured 1e-15 means / 1e-13 FE at these shapes) — the
        LGSSM sweep is an accelerator, not a different objective."""
        args = _chain_problem()
        st_ref, fe_ref = gpssm_vmp(*args, n_iters=600)
        st_pit, fe_pit = gpssm_vmp_pit(*args, n_pit=4, n_polish=120)
        np.testing.assert_allclose(np.asarray(st_pit.x_means),
                                   np.asarray(st_ref.x_means),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(st_pit.x_covs),
                                   np.asarray(st_ref.x_covs),
                                   rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(st_pit.xi_v),
                                   np.asarray(st_ref.xi_v),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(st_pit.W_rate),
                                   np.asarray(st_ref.W_rate), rtol=1e-10)
        np.testing.assert_allclose(float(fe_pit), float(fe_ref), rtol=1e-11)

    def test_pit_sweeps_move_toward_fixed_point(self):
        """Pure PIT sweeps (no polish) approach the fixed-point FE
        monotonically in sweep count — the accelerator half is itself
        convergent here, not just rescued by the polish."""
        args = _chain_problem()
        _, fe_ref = gpssm_vmp(*args, n_iters=600)
        gaps = []
        for npit in (1, 2, 4):
            _, fe = gpssm_vmp_pit(*args, n_pit=npit, n_polish=5)
            gaps.append(abs(float(fe) - float(fe_ref)))
        assert gaps[1] < gaps[0] and gaps[2] < gaps[1], gaps
