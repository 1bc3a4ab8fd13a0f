"""Declarative model front-end tests (infer/model.py)."""

import numpy as np

import jax.numpy as jnp

from gaussianprocessnode_tpu.infer.model import GPSSM, SGPClassification, SGPRegression
from gaussianprocessnode_tpu.ops.kernels import Kernel, invsoftplus
from gaussianprocessnode_tpu.utils.datasets import (
    pendulum,
    pendulum_inducing,
    toy_classification,
    toy_sinc,
)
from gaussianprocessnode_tpu.utils.metrics import smse

KER = Kernel("se", transform="softplus")


def test_regression_model_api():
    data = toy_sinc()
    Xu = jnp.linspace(-4.0, 4.0, 20)[:, None]
    model = SGPRegression(kernel=KER, Xu=Xu)
    theta0 = invsoftplus(jnp.asarray([1.0, 1.0]))
    res = model.infer(theta0, jnp.asarray(data.x_train), jnp.asarray(data.y_train))
    assert float(res.free_energy) < 100
    theta, fe, res = model.fit(
        theta0, jnp.asarray(data.x_train), jnp.asarray(data.y_train), epochs=60
    )
    mean, var = model.predict(theta, res, jnp.asarray(data.x_test))
    assert float(smse(data.y_test, np.asarray(mean))) < 0.05


def test_classification_model_api():
    data = toy_classification()
    Xu = jnp.linspace(-5.0, 5.0, 15)[:, None]
    model = SGPClassification(kernel=KER, Xu=Xu)
    theta0 = invsoftplus(jnp.asarray([1.0, 1.0]))
    res = model.infer(theta0, jnp.asarray(data.x_train), jnp.asarray(data.y_train))
    probs = model.predict_proba(theta0, res, jnp.asarray(data.x_test))
    assert np.all((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1))


def test_gpssm_model_api():
    x_state, y_obs, Q, P, dt = pendulum()
    Xu = jnp.asarray(pendulum_inducing())
    model = GPSSM(
        kernel=KER, Xu=Xu, obs_cov=jnp.asarray(P),
        prior_x0_mean=jnp.asarray([1.6, 0.0]), prior_x0_cov=0.1 * jnp.eye(2),
    )
    theta = invsoftplus(jnp.asarray([1.0, 2.0, 2.0]))
    state, fe = model.infer(theta, jnp.asarray(y_obs[:80]), iterations=8)
    assert bool(jnp.all(jnp.isfinite(state.x_means)))
    pred_means, pred_covs = model.predict(theta, state, jnp.asarray(y_obs[80:120]))
    assert pred_means.shape == (40, 2)
