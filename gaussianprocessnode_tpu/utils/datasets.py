"""Dataset loaders and synthetic-data generators (L7 layer).

Loaders for the reference's experiment data (SURVEY.md §2.8): kin40k (.mat),
banana (CSV), 3PhData oil flow (txt), plus the synthetic toy-sinc and
pendulum generators re-derived from the notebook recipes.
"""

import os
from typing import NamedTuple

import numpy as np

REFERENCE_ROOT = os.environ.get("GPNODE_REFERENCE_DATA", "/root/reference")


class Dataset(NamedTuple):
    x_train: np.ndarray
    y_train: np.ndarray
    x_test: np.ndarray
    y_test: np.ndarray


def toy_sinc(n_train: int = 50, n_test: int = 600, precision: float = 100.0, seed: int = 3):
    """Toy 1-D sinc regression (reference: GPT_regression.ipynb cell 3).

    Uses numpy RNG (the Julia seed stream differs; statistics match).
    Returns y_test = noiseless f_true as in the reference.
    """
    rng = np.random.default_rng(seed)
    xmin, xmax = -4.0, 4.0
    x = np.sort(rng.uniform(xmin, xmax, n_train))
    x_test = np.linspace(xmin - 0.1, xmax + 0.1, n_test)
    # Julia sinc(x) = sin(πx)/(πx); numpy.sinc is identical
    y = np.sinc(x) + rng.normal(size=n_train) * np.sqrt(1.0 / precision)
    f_true = np.sinc(x_test)
    return Dataset(x[:, None], y, x_test[:, None], f_true)


def toy_classification(n_train: int = 100, n_test: int = 400, seed: int = 7):
    """Toy 1-D probit classification (reference: GPT_classification.ipynb
    cell 3): latent f ~ GP(0, 2·SE(ℓ=1.2)) sampled jointly at train and test
    inputs, labels y ~ Bernoulli(Φ(f)).

    Default seed chosen so the draw's Bayes error (39/400 = 9.75%) matches
    the difficulty of the reference's Julia draw (whose SGP result is
    35/400 = 8.75%); RNG streams differ across languages, so the draw —
    not the method — is what's matched."""
    from scipy.spatial.distance import cdist

    rng = np.random.default_rng(seed)
    x_train = np.sort(rng.uniform(-5.0, 5.0, n_train))
    x_test = np.linspace(-5.0, 5.0, n_test)
    x_all = np.concatenate([x_train, x_test])
    d2 = cdist(x_all[:, None], x_all[:, None], "sqeuclidean")
    K = 2.0 * np.exp(-0.5 * d2 / 1.2**2) + 1e-6 * np.eye(len(x_all))
    f = np.linalg.cholesky(K) @ rng.standard_normal(len(x_all))
    from scipy.stats import norm

    y = (rng.uniform(size=len(x_all)) < norm.cdf(f)).astype(float)
    return Dataset(
        x_train[:, None], y[:n_train], x_test[:, None], y[n_train:]
    )


def kin40k(root: str = REFERENCE_ROOT):
    """kin40k regression: 10k train / 30k test, 8-D
    (reference: regression_kin40k.ipynb cell 3)."""
    from scipy.io import loadmat

    d = os.path.join(root, "data", "kin40k")
    xtr = loadmat(os.path.join(d, "kin40k_xtrain.mat"))["xtrain"].astype(np.float64)
    ytr = loadmat(os.path.join(d, "kin40k_ytrain.mat"))["ytrain"].ravel().astype(np.float64)
    xte = loadmat(os.path.join(d, "kin40k_xtest.mat"))["xtest"].astype(np.float64)
    yte = loadmat(os.path.join(d, "kin40k_ytest.mat"))["ytest"].ravel().astype(np.float64)
    return Dataset(xtr, ytr, xte, yte)


def banana(root: str = REFERENCE_ROOT, n_train: int = 4000):
    """Banana 2-D classification, labels −1/1 → 0/1
    (reference: classification_banana.ipynb cell 3)."""
    path = os.path.join(root, "data", "banana", "banana.csv")
    raw = np.genfromtxt(path, delimiter=",", skip_header=1)
    x = raw[:, :2].astype(np.float64)
    y = (raw[:, 2] > 0).astype(np.float64)  # replace -1 => 0
    return Dataset(x[:n_train], y[:n_train], x[n_train:], y[n_train:])


def oil_flow(root: str = REFERENCE_ROOT, n: int = 200):
    """3PhData oil-flow for GPLVM: 12-D outputs + 3-class labels
    (reference: GPLVM.ipynb cells 4-6)."""
    d = os.path.join(root, "3PhData")
    data = np.loadtxt(os.path.join(d, "DataTrn.txt"))[:n]
    labels = np.loadtxt(os.path.join(d, "DataTrnLbls.txt"))[:n]
    return data, labels.argmax(axis=1)


def pendulum(n: int = 700, max_time: float = 7.0, qc: float = 0.01, obs_var: float = 0.1, seed: int = 69):
    """Pendulum GPSSM data (reference: Pendulum_Wishart_2d.ipynb cells 4-5).

    x_{t+1} = [x1 + x2·Δt, x2 − 9.81·sin(x1)·Δt] + N(0, Q),  y = x + N(0, P).

    The reference seeds Julia's MersenneTwister(124), which numpy cannot
    reproduce; seed 69 is difficulty-matched instead: the converged
    UT-known-dynamics smoother baseline scores SMSE (0.006072, 0.000722) on
    this draw vs the reference's recorded (0.006313, 0.000800) on its draw.
    """
    rng = np.random.default_rng(seed)
    dt = max_time / (n - 1)
    Q = np.array([[qc * dt**3 / 3, qc * dt**2 / 2], [qc * dt**2 / 2, qc * dt]])
    P = obs_var * np.eye(2)
    Lq = np.linalg.cholesky(Q)
    Lp = np.linalg.cholesky(P)
    x_prev = np.array([1.5, 0.0])
    xs, ys = [], []
    for _ in range(n):
        x = np.array(
            [x_prev[0] + x_prev[1] * dt, x_prev[1] - 9.81 * np.sin(x_prev[0]) * dt]
        ) + Lq @ rng.standard_normal(2)
        y = x + Lp @ rng.standard_normal(2)
        xs.append(x)
        ys.append(y)
        x_prev = x
    return np.asarray(xs), np.asarray(ys), Q, P, dt


def pendulum_inducing():
    """Structured 48-point inducing grid (reference: Pendulum cells 9, 13)."""
    xu2_neg1 = np.linspace(-4, 0, 12)[::-1]
    xu2_neg2 = xu2_neg1[::-1] + 1e-5
    xu2_pos1 = np.linspace(1e-4, 4, 12)
    xu2_pos2 = xu2_pos1[::-1]
    xu2 = np.concatenate([xu2_neg1, xu2_neg2, xu2_pos1, xu2_pos2])
    xu1 = np.linspace(-2, 2, len(xu2) // 2)
    xu1 = np.concatenate([xu1[::-1], xu1 + 1e-5])
    return np.stack([xu1, xu2], axis=1)


def co2(root: str = REFERENCE_ROOT):
    """Mauna-Loa CO₂ series (reference: data/co2data.csv; 1958–2024 monthly).

    The file is semicolon-delimited with a leading empty column:
    ``;year;month;decimal-date;monthly-average;de-seasonalized;…``.
    Returns ``(t, y)``: decimal dates and monthly-average CO₂ (ppm), with
    missing-value sentinels (≤ 0) dropped.  No reference notebook consumes
    this file (it ships orphaned next to the multisine GPSSM checkpoint);
    the real-data regression workload built on it lives in
    experiments/legacy_gp.py (``--co2``)."""
    raw = np.genfromtxt(os.path.join(root, "data", "co2data.csv"),
                        delimiter=";", skip_header=1)
    t, y = raw[:, 3], raw[:, 4]
    keep = y > 0.0
    return t[keep], y[keep]


def btc_usd(root: str = REFERENCE_ROOT):
    """BTC-USD daily OHLC+volume (reference: BTC-USD.csv; 365 rows,
    2022-10-01 → 2023-09-30).

    Returns ``(t, ohlcv)``: day index (float) and columns
    (Open, High, Low, Close, Volume).  Like co2data.csv the file is orphaned
    in the reference (no notebook loads it); the GPSSM filtering workload
    built on it lives in experiments/legacy_gp.py (``--btc``)."""
    raw = np.genfromtxt(os.path.join(root, "BTC-USD.csv"),
                        delimiter=",", skip_header=1, usecols=(1, 2, 3, 4, 6))
    return np.arange(raw.shape[0], dtype=np.float64), raw


def toy_sinc_reference(root: str = REFERENCE_ROOT):
    """The reference's EXACT toy-regression draw (savefiles/*_toyregression.jld),
    enabling end-to-end parity against SMSE 0.008132."""
    from .jld import load_jld

    d = os.path.join(root, "savefiles")
    x = np.asarray(load_jld(os.path.join(d, "xtrain_toyregression.jld")))
    y = np.asarray(load_jld(os.path.join(d, "ytrain_toyregression.jld")))
    xt = np.asarray(load_jld(os.path.join(d, "xtest_toyregression.jld")))
    yt = np.asarray(load_jld(os.path.join(d, "ytest_toyregression.jld")))
    return Dataset(x[:, None], y, xt[:, None], yt)


def toy_classification_reference(root: str = REFERENCE_ROOT):
    """The reference's EXACT toy-classification draw
    (savefiles/*_toyclassification.jld); its recorded result is 35 errors
    against thresholded predictions on the 400-point grid."""
    from .jld import load_jld

    d = os.path.join(root, "savefiles")
    x = np.asarray(load_jld(os.path.join(d, "xtrain_toyclassification.jld")))
    y = np.asarray(load_jld(os.path.join(d, "ytrain_toyclassification.jld")))
    xt = np.asarray(load_jld(os.path.join(d, "xtest_toyclassification.jld")))
    yt = np.asarray(load_jld(os.path.join(d, "ytest_toyclassification.jld")))
    return Dataset(x[:, None], y, xt[:, None], yt)


def split2batch(x, y, batch_size: int):
    """Minibatch splitter (reference: split2batch, gp_helperfunction.jl:137-142).
    Returns arrays shaped (B, batch_size, ...) — the trailing remainder is
    dropped (static shapes for jit; the reference keeps a ragged tail)."""
    n = (len(y) // batch_size) * batch_size
    xa, ya = np.asarray(x), np.asarray(y)
    xb = xa[:n].reshape(n // batch_size, batch_size, *xa.shape[1:])
    yb = ya[:n].reshape(n // batch_size, batch_size)
    return xb, yb
