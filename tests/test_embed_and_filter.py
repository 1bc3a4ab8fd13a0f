"""Out-of-sample GPLVM embedding + GPSSM filter serving handle (round 3).

gplvm_embed infers q(x*) for NEW observations under a trained model with
q(v) frozen — the GPLVM serving surface. Oracle: it must reproduce the
training-time latents when fed the training data back (the x-update is the
same fixed-point map), and held-out oil-flow points must embed into the
label structure (1-NN against the trained latents beats chance by a wide
margin and is in the PCA-or-better range the e2e test holds training
latents to).

GPSSMFilter wraps one_step_ahead as a frozen handle; it must match the
direct call exactly."""

import numpy as np

import jax.numpy as jnp

from experiments.gplvm import knn_accuracy, pca_2d
from gaussianprocessnode_tpu.dists import MvGaussianNat
from gaussianprocessnode_tpu.infer.chain_smoother import gpssm_vmp, one_step_ahead
from gaussianprocessnode_tpu.infer.gplvm import gplvm_embed, gplvm_vmp
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.serve import GPSSMFilter
from gaussianprocessnode_tpu.utils.datasets import oil_flow, pendulum, pendulum_inducing

KERNEL = Kernel("se", transform="softplus")


class TestGPLVMEmbed:
    _cache = None

    def _trained(self):
        # the fixture is deterministic (seed 86, fixed θ); train once for
        # both tests instead of twice
        if TestGPLVMEmbed._cache is not None:
            return TestGPLVMEmbed._cache
        Y_np, labels = oil_flow(n=160)
        mean_X = pca_2d(Y_np)
        n_tr = 120
        Y_tr = jnp.asarray(Y_np[:n_tr])
        rng = np.random.default_rng(86)
        Xu = jnp.asarray(mean_X[:n_tr][rng.permutation(n_tr)[:20]])
        theta = jnp.asarray([1.0, 0.6, 0.5])
        state, _ = gplvm_vmp(KERNEL, theta, Xu, Y_tr,
                             jnp.asarray(mean_X[:n_tr]), n_iters=6)
        TestGPLVMEmbed._cache = (Y_np, labels, mean_X, n_tr, Xu, theta, state)
        return TestGPLVMEmbed._cache

    def test_trained_latents_are_fixed_points_of_the_embed_map(self):
        """Correctness oracle: embedding the TRAINING data with the trained
        latents as starts applies the exact frozen-v x-update the final
        training sweep applied, so the trained latents must be (converged)
        fixed points — measured movement ≤ 4e-10. (Starting from the PCA
        priors instead can land ~26% of points in a DIFFERENT mode of the
        multimodal Laplace objective, max 2.3 apart — mode selection is the
        start's job, as in training.)"""
        Y_np, labels, mean_X, n_tr, Xu, theta, state = self._trained()
        m, V = gplvm_embed(
            KERNEL, theta, Xu, jnp.asarray(Y_np[:n_tr]), state,
            jnp.asarray(mean_X[:n_tr]), x_start=state.x_means,
        )
        np.testing.assert_allclose(np.asarray(m), np.asarray(state.x_means),
                                   atol=1e-8)
        assert bool(jnp.all(jnp.isfinite(V)))

    def test_held_out_points_embed_into_the_label_structure(self):
        """Serving quality at the e2e fixture's UNtrained θ (calibrated:
        1NN-vs-trained 0.65, within-embedding knn 0.725 vs PCA 0.8 — the
        bars assert structure well above the 3-class chance 0.33 without
        demanding optimized-θ quality)."""
        Y_np, labels, mean_X, n_tr, Xu, theta, state = self._trained()
        m_new, V_new = gplvm_embed(
            KERNEL, theta, Xu, jnp.asarray(Y_np[n_tr:]), state,
            jnp.asarray(mean_X[n_tr:]),
        )
        # classify each held-out embedding by its nearest TRAINED latent
        d = np.linalg.norm(
            np.asarray(m_new)[:, None, :] - np.asarray(state.x_means)[None],
            axis=-1,
        )
        pred = labels[:n_tr][d.argmin(axis=1)]
        acc = float(np.mean(pred == labels[n_tr:]))
        assert acc >= 0.55
        # and the embedding must carry the label structure internally too
        assert knn_accuracy(np.asarray(m_new), labels[n_tr:]) >= \
            knn_accuracy(pca_2d(Y_np)[n_tr:], labels[n_tr:]) - 0.1


class TestGPSSMFilter:
    def _trained(self):
        x_state, y_obs, Q, P, dt = pendulum()
        T = 60
        y_train = jnp.asarray(y_obs[:T])
        y_test = jnp.asarray(y_obs[T:T + 40])
        Xu = jnp.asarray(pendulum_inducing())
        M, D = Xu.shape[0], 2
        theta = invsoftplus(jnp.asarray([1.0, 2.0, 2.0]))
        prior_v = MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0)
        state, _ = gpssm_vmp(
            KERNEL, theta, Xu, y_train, jnp.asarray(P), jnp.asarray([1.6, 0.0]),
            0.1 * jnp.eye(2), prior_v, 100.0, jnp.eye(2), n_iters=10,
        )
        return theta, Xu, state, jnp.asarray(P), y_test

    def test_handle_matches_direct_one_step_ahead(self):
        theta, Xu, state, P, y_test = self._trained()
        handle = GPSSMFilter.from_state(KERNEL, theta, Xu, state, P)
        m_h, V_h, _ = handle(y_test)
        m_d, V_d = one_step_ahead(KERNEL, theta, Xu, state, y_test, P)
        np.testing.assert_array_equal(np.asarray(m_h), np.asarray(m_d))
        np.testing.assert_array_equal(np.asarray(V_h), np.asarray(V_d))
        assert bool(jnp.all(jnp.isfinite(m_h)))

    def test_streaming_windows_chain_exactly(self):
        """handle(y[:k]) then handle(y[k:], carry) ≡ handle(y) — the
        property that makes the handle genuinely streaming (a carry-less
        restart would condition window 2 on the training set's end marginal
        instead of the filtered one)."""
        theta, Xu, state, P, y_test = self._trained()
        handle = GPSSMFilter.from_state(KERNEL, theta, Xu, state, P)
        m_all, V_all, _ = handle(y_test)
        m1, V1, carry = handle(y_test[:17])
        m2, V2, _ = handle(y_test[17:], carry)
        np.testing.assert_array_equal(np.asarray(jnp.concatenate([m1, m2])),
                                      np.asarray(m_all))
        np.testing.assert_array_equal(np.asarray(jnp.concatenate([V1, V2])),
                                      np.asarray(V_all))
        # and a carry-LESS second window must differ (regression guard for
        # the restart-from-training-end bug the streaming API exists to fix)
        m2_restart, _, _ = handle(y_test[17:])
        assert float(jnp.max(jnp.abs(m2_restart - m2))) > 1e-6
