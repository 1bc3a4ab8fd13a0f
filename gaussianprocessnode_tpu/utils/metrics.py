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


def split2batch(x, y, batch_size: int):
    """Minibatch splitter (reference: split2batch, gp_helperfunction.jl:137-142).
    Returns arrays shaped (B, batch_size, ...) — the trailing remainder is
    dropped (static shapes for jit; the reference keeps a ragged tail)."""
    import numpy as np

    n = (len(y) // batch_size) * batch_size
    xb = np.asarray(x)[:n].reshape(len(y) // batch_size, batch_size, *np.asarray(x).shape[1:])
    yb = np.asarray(y)[:n].reshape(len(y) // batch_size, batch_size)
    return xb, yb
