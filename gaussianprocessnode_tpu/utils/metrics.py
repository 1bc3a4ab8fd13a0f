"""Evaluation metrics (reference: gp_helperfunction.jl:145-158)."""

import jax.numpy as jnp

__all__ = ["smse", "num_error", "error_rate"]


def smse(y_true, y_pred):
    """Standardized mean squared error: MSE / var(y_true)
    (reference: SMSE, gp_helperfunction.jl:145-149 — note Julia ``var`` is
    the corrected/sample variance)."""
    y_true = jnp.asarray(y_true)
    y_pred = jnp.asarray(y_pred)
    n = y_true.shape[0]
    mse = jnp.sum((y_true - y_pred) ** 2) / n
    return mse / jnp.var(y_true, ddof=1)


def num_error(y_true, y_pred):
    """Σ|y − ŷ| for {0,1} labels (reference: gp_helperfunction.jl:152-154)."""
    return jnp.sum(jnp.abs(jnp.asarray(y_pred) - jnp.asarray(y_true)))


def error_rate(y_true, y_pred):
    return num_error(y_true, y_pred) / jnp.asarray(y_true).shape[0]
