"""Minibatch trainer tests (tiny CPU configurations).

Checks the kin40k/banana trainers' semantics: per-epoch q(v) reset (kin40k),
carried q(w) prior (banana), chunked-resume equivalence, and agreement of the
fast epoch-granular path with the faithful per-batch path at matched budgets.
"""

import numpy as np

import jax
import jax.numpy as jnp

from gaussianprocessnode_tpu.dists import GammaShapeRate, MvGaussianNat
from gaussianprocessnode_tpu.infer.minibatch import fit_banana, fit_kin40k, fit_kin40k_fast
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus

rng = np.random.default_rng(0)
KER = Kernel("se", transform="softplus")

M, B, BATCH, DIN = 12, 4, 25, 3
XU = jnp.asarray(rng.standard_normal((M, DIN)))
X = jnp.asarray(rng.standard_normal((B * BATCH, DIN)))
W_TRUE = 100.0
Y = jnp.asarray(
    np.sin(np.asarray(X).sum(axis=1)) + rng.normal(size=B * BATCH) / np.sqrt(W_TRUE)
)
XB = X.reshape(B, BATCH, DIN)
YB = Y.reshape(B, BATCH)
THETA0 = invsoftplus(jnp.ones(DIN + 1))
PRIOR_V = MvGaussianNat(jnp.zeros(M), jnp.eye(M) / 50.0)


class TestKin40kTrainer:
    def test_resume_equivalence(self):
        th_a, qv_a, _ = fit_kin40k(KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 6)
        th_b, qv_b, st = fit_kin40k(KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 3)
        th_b, qv_b, st = fit_kin40k(
            KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 3, resume_state=st
        )
        np.testing.assert_allclose(th_a, th_b, atol=1e-12)
        np.testing.assert_allclose(qv_a.prec, qv_b.prec, atol=1e-8)

    def test_epoch_reset_semantics(self):
        # with the per-epoch reset, q(v) precision after E epochs stays at
        # prior + ONE pass of data (not E passes)
        _, qv1, _ = fit_kin40k(KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 1)
        _, qv5, _ = fit_kin40k(KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 5)
        scale1 = float(jnp.trace(qv1.prec))
        scale5 = float(jnp.trace(qv5.prec))
        assert scale5 < 2.0 * scale1  # same order, not 5×

    def test_fast_matches_faithful_at_one_epoch(self):
        # one epoch, per-batch refreshes: the fast path IS the faithful
        # schedule up to μ/Rv staleness within the first epoch
        th_f, qv_f, _ = fit_kin40k(
            KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 1
        )
        th_g, qv_g, cov, _ = fit_kin40k_fast(
            KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 1,
            stats_refreshes=B,
        )
        # q(v) natural params identical (same sums at nearly-identical θ)
        np.testing.assert_allclose(qv_f.prec, qv_g.prec, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(th_f), np.asarray(th_g), atol=5e-4)

    def test_learns_signal(self):
        from gaussianprocessnode_tpu.infer.batch_vmp import predict_out
        from gaussianprocessnode_tpu.ops.linalg import ir_solve, spd_inverse_ns, sym
        from gaussianprocessnode_tpu.utils.metrics import smse

        th, qv, cov, _ = fit_kin40k_fast(
            KER, THETA0, XU, XB, YB, PRIOR_V, W_TRUE, 40, stats_refreshes=2
        )
        mu = ir_solve(sym(qv.prec), qv.xi, cov, rounds=3).astype(X.dtype)
        mean, _ = predict_out(KER, th, XU, X, mu, W_TRUE)
        assert float(smse(Y, mean)) < 0.35


class TestBananaTrainer:
    def test_carried_w_and_learning(self):
        yb = (YB > 0).astype(YB.dtype)
        pw = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))
        th, qv, qw, st = fit_banana(KER, THETA0, XU, XB, yb, PRIOR_V, pw, 5)
        # accumulated shape: 0.01 + (epochs·B batches)·batch/2
        expected_shape = 0.01 + 5 * B * BATCH / 2
        np.testing.assert_allclose(float(qw.shape), expected_shape, rtol=1e-6)
        assert float(qw.shape / qw.rate) > 0  # finite, positive w̄
        assert bool(jnp.all(jnp.isfinite(th)))

    def test_resume_equivalence(self):
        yb = (YB > 0).astype(YB.dtype)
        pw = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))
        th_a, _, qw_a, _ = fit_banana(KER, THETA0, XU, XB, yb, PRIOR_V, pw, 4)
        _, _, _, st = fit_banana(KER, THETA0, XU, XB, yb, PRIOR_V, pw, 2)
        th_b, _, qw_b, _ = fit_banana(
            KER, THETA0, XU, XB, yb, PRIOR_V, pw, 2, resume_state=st
        )
        np.testing.assert_allclose(th_a, th_b, atol=1e-12)
        np.testing.assert_allclose(float(qw_a.rate), float(qw_b.rate), rtol=1e-10)


class TestBananaFastTrainer:
    """fit_banana_fast (epoch-granular grand refresh) vs the faithful
    per-batch fit_banana at matched budgets (VERDICT round-1 item 8)."""

    def _setup(self):
        r = np.random.default_rng(3)
        N, M2 = 200, 30
        X2 = jnp.asarray(r.standard_normal((N, 2)))
        w = jnp.asarray(r.standard_normal(2))
        y2 = jnp.asarray(
            (np.asarray(X2 @ w + 0.3 * r.standard_normal(N)) > 0).astype(float)
        )
        Xu2 = X2[:M2]
        Xb2 = X2.reshape(4, N // 4, 2)
        yb2 = y2.reshape(4, N // 4)
        pv = MvGaussianNat(jnp.zeros(M2), jnp.eye(M2) / 50.0)
        pw = GammaShapeRate(jnp.asarray(1e-2), jnp.asarray(1e-2))
        th0 = invsoftplus(jnp.ones(3))
        return X2, y2, Xu2, Xb2, yb2, pv, pw, th0

    def test_matches_faithful_at_matched_budget(self):
        from gaussianprocessnode_tpu.infer.minibatch import fit_banana_fast

        X2, y2, Xu2, Xb2, yb2, pv, pw, th0 = self._setup()
        th_a, qv_a, qw_a, _ = fit_banana(KER, th0, Xu2, Xb2, yb2, pv, pw, 40)
        th_b, qv_b, qw_b, _ = fit_banana_fast(
            KER, th0, Xu2, Xb2, yb2, pv, pw, 40
        )
        mu_a = np.linalg.solve(np.asarray(qv_a.prec), np.asarray(qv_a.xi))
        mu_b = np.linalg.solve(np.asarray(qv_b.prec), np.asarray(qv_b.xi))
        # same fixed point up to within-epoch staleness: posterior means
        # nearly collinear, θ and w̄ in the same basin
        corr = float(np.corrcoef(mu_a, mu_b)[0, 1])
        assert corr > 0.98, corr
        np.testing.assert_allclose(np.asarray(th_b), np.asarray(th_a), atol=0.08)
        wa = float(qw_a.shape / qw_a.rate)
        wb = float(qw_b.shape / qw_b.rate)
        assert abs(np.log(wb / wa)) < 0.5, (wa, wb)

    def test_resume_equivalence(self):
        from gaussianprocessnode_tpu.infer.minibatch import fit_banana_fast

        X2, y2, Xu2, Xb2, yb2, pv, pw, th0 = self._setup()
        th_a, qv_a, qw_a, _ = fit_banana_fast(
            KER, th0, Xu2, Xb2, yb2, pv, pw, 8
        )
        st = None
        for _ in range(2):
            th_b, qv_b, qw_b, st = fit_banana_fast(
                KER, th0, Xu2, Xb2, yb2, pv, pw, 4, resume_state=st
            )
        np.testing.assert_allclose(np.asarray(th_b), np.asarray(th_a), rtol=1e-8)
        np.testing.assert_allclose(
            np.asarray(qv_b.prec), np.asarray(qv_a.prec), rtol=1e-8
        )
