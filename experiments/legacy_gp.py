"""Legacy-notebook GP families: exact/t-process regression and SDE-GP.

The reference's `.ipynb_checkpoints/` holds exploratory notebooks outside
its current library surface (SURVEY §2.8); this CLI runs the three that are
self-contained GP models, re-designed TPU-first:

- tprocess        (tpregression-checkpoint.ipynb): dense GP vs Student-t
                  process on sinc-with-outliers — the TP ribbon widens under
                  outliers, the GP's cannot.
- sde             (GPregress_SDE_M52-checkpoint.ipynb): Matérn-5/2 GP
                  regression as an O(T) Kalman/RTS `lax.scan`, exact vs the
                  dense posterior; plus gradient-based θ learning through
                  the scan (beyond the notebook).
- fullcov         (regression_fullcov_CVI_UT-checkpoint.ipynb): dense GP
                  with BAYESIAN hyperparameter inference — mean-field
                  q(f)q(γ)q(θ), θ a Gaussian posterior updated by
                  re-localized GH moment matching (the notebook's CVI/UT
                  meta), γ a learned Gamma noise precision.
- pad             (GPSSD_PAD-checkpoint.ipynb): GP probabilistic amplitude
                  demodulation — parallel-EP smoother recovering a slow
                  Matérn-5/2 log-envelope from a noise-carrier-modulated
                  signal (its synthetic workload: σ_c = 2π/30, T=400).
- pad2            (GPSSD_PAD_2-checkpoint.ipynb): colored-carrier PAD —
                  the carrier is itself a fast Matérn-5/2 GP; alternating
                  exact Kalman c-sweep + re-localized two-stage GH tilt.
- padlearn        (LearnParamsGPSDE / LearnParams_PAD2 / GPPAD_mixture
                  checkpoints): hyperparameter LEARNING over the SDE-GP/PAD
                  families — Bayesian q(log ℓ) by evidence-tilted moment
                  matching, EP-EM / variational-EM point learning, and an
                  evidence-weighted model bank (infer/pad_learn.py).
- control         (GPSSM_realdata-checkpoint.ipynb's GPTransitionControl
                  node): controlled GPSSM — x_t ~ GP([x_{t-1}; u_t]) with a
                  known control signal, smoothed + filtered; the filter fed
                  the true controls beats the same filter with zeroed
                  controls.
- fitc/sor live in experiments/vsgp_baselines.py (fitc_sor_toy /
  fitc_sor_kin40k) since they share its saved-Xu loaders.

- co2 / btc       the reference's two shipped-but-orphaned real-data files
                  (data/co2data.csv, BTC-USD.csv — no reference notebook
                  loads either): Mauna-Loa SDE-GP regression with learned θ
                  and held-out months, and BTC-USD log-price GPSSM
                  filtering (D=1 Wishart machinery) with a 1-step-ahead
                  random-walk comparison. Write benchmarks/*_r4.json.

Usage: python experiments/legacy_gp.py [tprocess] [sde] [fullcov] [pad]
       [pad2] [padlearn] [control] [co2] [btc]
Plus an opt-in benchmark (not in the default list): `padscale [--tpu]` —
sequential vs parallel-in-time smoother wall-clock at audio-scale T
(writes benchmarks/pad_scale_r3.json).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from gaussianprocessnode_tpu.ops.kernels import Kernel


def run_tprocess(verbose: bool = True):
    """GP vs TP(ν=100) on the notebook's sinc-with-outliers shape (its
    cell 2: N=20, precision-100 noise, targets 10:11 shifted +2, ℓ=log 2)."""
    from gaussianprocessnode_tpu.infer.tprocess import (
        gp_exact_posterior, tp_exact_posterior)

    kernel = Kernel("matern52", transform="identity")
    theta = jnp.asarray([1.0, float(np.log(2.0))])
    rng = np.random.default_rng(4)
    x = np.sort(rng.uniform(-3.0, 3.0, size=20))
    y = np.sinc(x / np.pi) + rng.normal(size=20) * 0.1
    y[9:11] += 2.0
    xt = np.linspace(-3.1, 3.1, 60)
    X, Y, Xt = jnp.asarray(x[:, None]), jnp.asarray(y), jnp.asarray(xt[:, None])
    t0 = time.time()
    gp = gp_exact_posterior(kernel, theta, X, Y, Xt, 0.01)
    tp = tp_exact_posterior(kernel, theta, 100.0, X, Y, Xt, 0.01)
    if verbose:
        print(f"[t-process toy] GP mean==TP mean: "
              f"{np.allclose(np.asarray(gp.mean), np.asarray(tp.mean))}; "
              f"TP fit_scale {float(tp.fit_scale):.3f} (>1 ⇒ outliers widen "
              f"the ribbon), mean var ratio TP/GP "
              f"{float(jnp.mean(tp.var / jnp.maximum(gp.var, 1e-12))):.3f}, "
              f"wall {time.time()-t0:.1f}s")
    return float(tp.fit_scale)


def run_sde(verbose: bool = True):
    """The SDE notebook's workload (cell 8: 2 sin t + cos 2t on 100 grid
    points, 38 observed, σ²=0.2) smoothed in O(T), checked against the
    dense Matérn-5/2 posterior, then θ learned by gradient through the
    scan."""
    import optax

    from gaussianprocessnode_tpu.infer.sde_gp import sde_gp_nlml, sde_gp_smooth

    kernel = Kernel("matern52", transform="identity")
    rng = np.random.default_rng(10)
    T = 100
    t = np.linspace(0.0, 5.0, T)
    f_true = 2.0 * np.sin(t) + np.cos(2.0 * t)
    mask = np.zeros(T, bool)
    mask[np.sort(rng.permutation(75)[:38])] = True
    obs_var = 0.2
    y = f_true + np.sqrt(obs_var) * rng.normal(size=T)
    tj, yj, mj = jnp.asarray(t), jnp.asarray(y), jnp.asarray(mask)

    theta = jnp.asarray([1.0, 1.0])
    t0 = time.time()
    res = sde_gp_smooth(theta, tj, yj, mj, obs_var)
    # observations live in the first 75 grid positions (notebook cell 8), so
    # t > 3.75 is pure extrapolation — report the interpolation region
    interp = np.arange(T) < 75
    rmse0 = float(np.sqrt(np.mean(
        (np.asarray(res.mean)[interp] - f_true[interp]) ** 2)))

    # dense-GP cross-check (the equivalence the tests pin to 1e-8)
    to = t[mask][:, None]
    Koo = np.asarray(kernel(theta, to, to)) + obs_var * np.eye(mask.sum())
    Kto = np.asarray(kernel(theta, t[:, None], to))
    dense_mean = Kto @ np.linalg.solve(Koo, y[mask])
    agree = float(np.max(np.abs(dense_mean - np.asarray(res.mean))))

    # θ learning through the scan (beyond the fixed-θ notebook)
    opt = optax.adamax(0.05)

    @jax.jit
    def step(th, os_):
        g = jax.grad(lambda p: sde_gp_nlml(p, tj, yj, mj, obs_var))(th)
        upd, os_ = opt.update(g, os_, th)
        return optax.apply_updates(th, upd), os_

    os_ = opt.init(theta)
    th = theta
    for _ in range(200):
        th, os_ = step(th, os_)
    res_opt = sde_gp_smooth(th, tj, yj, mj, obs_var)
    rmse1 = float(np.sqrt(np.mean(
        (np.asarray(res_opt.mean)[interp] - f_true[interp]) ** 2)))
    if verbose:
        print(f"[SDE-GP Matérn-5/2] smoother==dense to {agree:.2e}; "
              f"interp RMSE vs truth {rmse0:.4f} @θ=[1,1] → {rmse1:.4f} "
              f"after 200 NLML steps "
              f"(θ=[{float(th[0]):.3f}, {float(th[1]):.3f}]), "
              f"log_lik {float(res.log_lik):.2f} → "
              f"{float(res_opt.log_lik):.2f}, wall {time.time()-t0:.1f}s")
    return rmse1


def run_fullcov(verbose: bool = True):
    """The CVI/UT notebook's exact config (cells 3-6): N=100 sinc draw at
    precision 100, Matérn-5/2, θ ~ N(log 4, 2), γ ~ Γ(0.01, 0.01),
    50 VMP sweeps."""
    from gaussianprocessnode_tpu.dists import gamma_mean
    from gaussianprocessnode_tpu.infer.fullcov_gp import (
        fullcov_gp_predict, fullcov_gp_vmp)

    kernel = Kernel("matern52", transform="identity")
    rng = np.random.default_rng(2)
    x = np.sort(rng.uniform(-3.0, 3.0, size=100))
    y = np.sinc(x) + rng.normal(size=100) * 0.1
    xt = np.linspace(-3.1, 3.1, 200)
    X, Y, Xt = jnp.asarray(x[:, None]), jnp.asarray(y), jnp.asarray(xt[:, None])
    t0 = time.time()
    state = fullcov_gp_vmp(kernel, X, Y, m_th0=float(np.log(4.0)),
                           v_th0=2.0, iters=50)
    mean, _ = fullcov_gp_predict(kernel, state, X, Xt)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - np.sinc(xt)) ** 2)))
    if verbose:
        print(f"[full-cov Bayes-θ GP] q(θ): ℓ = {float(jnp.exp(state.m_th)):.3f} "
              f"± {float(jnp.exp(state.m_th) * jnp.sqrt(state.v_th)):.3f} "
              f"(init 4.0), q(γ) mean = {float(gamma_mean(state.gamma)):.1f} "
              f"(generating precision 100), FE {float(state.fe[0]):.1f} → "
              f"{float(state.fe[-1]):.1f}, test RMSE {rmse:.4f}, "
              f"wall {time.time()-t0:.1f}s")
    return rmse


def run_pad(verbose: bool = True):
    """The PAD notebook's synthetic workload (cells 2-4): T=400 on [0,4],
    carrier σ_c = 2π/30, slow log-envelope; EP demodulation."""
    from gaussianprocessnode_tpu.infer.gppad import gppad_infer

    rng = np.random.default_rng(1)
    T = 400
    t = np.linspace(0.0, 4.0, T)
    f_true = 0.8 * np.sin(2.0 * np.pi * t / 4.0)
    sigma_c = 2.0 * np.pi / 30.0
    y = sigma_c * rng.normal(size=T) * np.exp(f_true)
    t0 = time.time()
    state = gppad_infer(jnp.asarray([1.0, 0.9]), jnp.asarray(t),
                        jnp.asarray(y), carrier_var=sigma_c**2, iters=25)
    m = np.asarray(state.mean)
    corr = float(np.corrcoef(m, f_true)[0, 1])
    err_pad = float(np.sqrt(np.mean(
        (np.asarray(state.envelope) - np.exp(f_true)) ** 2)))
    env_naive = np.abs(y) / (sigma_c * np.sqrt(2.0 / np.pi))
    err_naive = float(np.sqrt(np.mean((env_naive - np.exp(f_true)) ** 2)))
    if verbose:
        print(f"[GP-PAD] corr(log-envelope, truth) = {corr:.3f}; envelope "
              f"RMSE {err_pad:.4f} vs naive |y|-rescale {err_naive:.4f}; "
              f"site movement {float(state.site_delta[0]):.2f} → "
              f"{float(state.site_delta[-1]):.2e} over 25 EP sweeps, "
              f"wall {time.time()-t0:.1f}s")
    return corr


def run_pad2(verbose: bool = True):
    """Colored-carrier PAD (GPSSD_PAD_2 cells 3-8): both envelope (ℓ=0.8)
    and carrier (ℓ=0.05) are Matérn-5/2 GP draws; y = c·exp(f)."""
    from gaussianprocessnode_tpu.infer.gppad import gppad_colored_infer

    kernel = Kernel("matern52", transform="identity")
    rng = np.random.default_rng(5)
    T = 500
    t = np.linspace(0.0, 5.0, T)
    th_f = jnp.asarray([0.4, 0.8])
    th_c = jnp.asarray([1.0, 0.05])
    Kf = np.asarray(kernel(th_f, t[:, None], t[:, None])) + 1e-9 * np.eye(T)
    Kc = np.asarray(kernel(th_c, t[:, None], t[:, None])) + 1e-9 * np.eye(T)
    f_true = np.linalg.cholesky(Kf) @ rng.normal(size=T)
    c_true = np.linalg.cholesky(Kc) @ rng.normal(size=T)
    y = c_true * np.exp(f_true)
    t0 = time.time()
    state = gppad_colored_infer(th_f, th_c, jnp.asarray(t), jnp.asarray(y),
                                obs_var=1e-3, iters=40)
    corr_f = float(np.corrcoef(np.asarray(state.f_mean), f_true)[0, 1])
    corr_c = float(np.corrcoef(np.asarray(state.c_mean), c_true)[0, 1])
    recon = np.asarray(state.c_mean) * np.asarray(state.envelope)
    rel = float(np.sqrt(np.mean((recon - y) ** 2)) / np.sqrt(np.mean(y**2)))
    if verbose:
        print(f"[GP-PAD colored carrier] corr(f) = {corr_f:.3f}, corr(c) = "
              f"{corr_c:.3f}, reconstruction rel RMSE {rel:.4f} "
              f"(f/c slow-component trade bounds the correlations; the "
              f"product is pinned), wall {time.time()-t0:.1f}s")
    return rel


def run_padlearn(verbose: bool = True):
    """The three legacy LEARNING notebooks over the SDE-GP/PAD families
    (LearnParamsGPSDE, LearnParams_PAD2, GPPAD_mixture — infer/pad_learn.py):
    Bayesian lengthscale posterior on the PAD model, EP-EM point learning of
    the white-carrier θ, variational EM for the colored lengthscales, and an
    evidence-weighted 3-model bank."""
    from gaussianprocessnode_tpu.infer.pad_learn import (
        fit_gppad_colored_theta, fit_gppad_theta, gppad_bayes_lengthscale,
        gppad_mixture)

    kernel = Kernel("matern52", transform="identity")
    rng = np.random.default_rng(13)
    T = 300
    t = np.linspace(0.0, 4.0, T)
    ell_true = 0.9
    Kf = np.asarray(kernel(jnp.asarray([1.0, ell_true]),
                           t[:, None], t[:, None])) + 1e-10 * np.eye(T)
    f_true = np.linalg.cholesky(Kf) @ np.random.default_rng(14).normal(size=T)
    y = 0.3 * rng.normal(size=T) * np.exp(f_true)
    tj, yj = jnp.asarray(t), jnp.asarray(y)

    t0 = time.time()
    bay = gppad_bayes_lengthscale(tj, yj, carrier_var=0.09, iters=6,
                                  ep_iters=15)
    t_bay = time.time() - t0
    t0 = time.time()
    em = fit_gppad_theta(tj, yj, theta0=jnp.asarray([0.5, 0.35]),
                         carrier_var=0.09, epochs=30, ep_iters=10)
    t_em = time.time() - t0
    t0 = time.time()
    mix = gppad_mixture(jnp.asarray([[1.0, 0.9], [1.0, 0.15], [1.0, 4.0]]),
                        tj, yj, carrier_vars=jnp.asarray([0.09] * 3),
                        iters=25)
    t_mix = time.time() - t0

    # colored variational EM on the PAD_2 workload shape
    rng2 = np.random.default_rng(9)
    T2 = 400
    t2 = np.linspace(0.0, 5.0, T2)
    Kf2 = np.asarray(kernel(jnp.asarray([0.4, 0.8]),
                            t2[:, None], t2[:, None])) + 1e-10 * np.eye(T2)
    Kc2 = np.asarray(kernel(jnp.asarray([1.0, 0.05]),
                            t2[:, None], t2[:, None])) + 1e-10 * np.eye(T2)
    f2 = np.linalg.cholesky(Kf2) @ np.random.default_rng(21).normal(size=T2)
    c2 = np.linalg.cholesky(Kc2) @ np.random.default_rng(22).normal(size=T2)
    y2 = c2 * np.exp(f2) + np.sqrt(1e-3) * rng2.normal(size=T2)
    t0 = time.time()
    cem = fit_gppad_colored_theta(jnp.asarray(t2), jnp.asarray(y2),
                                  ell0=jnp.asarray([0.3, 0.1]),
                                  var_f=0.4, var_c=1.0, epochs=12)
    t_cem = time.time() - t0

    m_s, v_s = float(bay.m_s), float(bay.v_s)
    if verbose:
        print(f"[PAD learning] Bayesian q(log ℓ) = N({m_s:.3f}, {v_s:.3f}) "
              f"vs log ℓ_true = {np.log(ell_true):.3f} (prior var 10 → "
              f"{v_s:.3f}), wall {t_bay:.1f}s")
        print(f"[PAD learning] EP-EM θ: [σ², ℓ] = "
              f"[{float(em.theta[0]):.3f}, {float(em.theta[1]):.3f}] from "
              f"[0.5, 0.35] (truth ℓ {ell_true}); evidence "
              f"{float(em.evidence[0]):.1f} → {float(em.evidence[-1]):.1f}, "
              f"wall {t_em:.1f}s")
        print(f"[PAD learning] colored EM ℓ = "
              f"[{float(cem.theta[0]):.3f}, {float(cem.theta[1]):.3f}] from "
              f"[0.3, 0.1] (truth [0.8, 0.05]); ELBO "
              f"{float(cem.evidence[0]):.1f} → {float(cem.evidence[-1]):.1f}, "
              f"wall {t_cem:.1f}s")
        resp = np.asarray(mix.resp)
        print(f"[PAD learning] 3-model bank responsibilities {resp.round(4)} "
              f"(truth is model 0; EP-evidence and ELBO rankings "
              f"{'agree' if int(np.argmax(resp)) == int(np.argmax(np.asarray(mix.elbo))) else 'DISAGREE'}), "
              f"wall {t_mix:.1f}s")
    return m_s, float(em.theta[1]), resp


def run_control(verbose: bool = True):
    """Controlled pendulum (θ̈ = −4 sin θ − 0.3 θ̇ + u, strong sinusoid u):
    train the controlled GPSSM on 150 steps, filter 30 test steps with the
    true vs zeroed control signal."""
    from gaussianprocessnode_tpu.dists import MvGaussianNat
    from gaussianprocessnode_tpu.infer.gpssm_control import (
        gpssm_control_vmp, one_step_ahead_control)

    kernel = Kernel("se", transform="identity")
    rng = np.random.default_rng(3)
    T_train, T_test = 150, 30
    T = T_train + T_test
    us = 2.0 * np.sin(0.25 * np.arange(T))
    xs = [np.array([0.5, 0.0])]
    for t in range(T):
        th, om = xs[-1]
        xs.append(np.array([th + 0.1 * om,
                            om + 0.1 * (-4 * np.sin(th) - 0.3 * om + us[t])]))
    X = np.stack(xs)
    ys = X[1:] + 0.05 * rng.normal(size=(T, 2))
    rng2 = np.random.default_rng(7)
    train_inputs = np.concatenate([X[:T_train], us[:T_train, None]], axis=1)
    idx = np.linspace(0, T_train - 1, 30).astype(int)
    Xu = jnp.asarray(train_inputs[idx] + 0.05 * rng2.normal(size=(30, 3)))
    D, M = 2, 30
    t0 = time.time()
    state, fe = gpssm_control_vmp(
        kernel, jnp.asarray([2.0, 1.5]), Xu, jnp.asarray(ys[:T_train]),
        jnp.asarray(us[:T_train, None]), jnp.eye(D) * 2.5e-3,
        prior_x0_mean=jnp.asarray(X[0]), prior_x0_cov=jnp.eye(D) * 0.1,
        prior_v=MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0),
        prior_W_df=100.0, prior_W_scale=jnp.eye(D), n_iters=10)
    sm = float(np.sqrt(np.mean(
        (np.asarray(state.x_means[1:]) - X[1:T_train + 1]) ** 2)))
    args = (kernel, jnp.asarray([2.0, 1.5]), Xu, state,
            jnp.asarray(ys[T_train:]))
    pred, _ = one_step_ahead_control(
        *args, jnp.asarray(us[T_train:, None]), jnp.eye(D) * 2.5e-3)
    pred0, _ = one_step_ahead_control(
        *args, jnp.zeros((T_test, 1)), jnp.eye(D) * 2.5e-3)
    truth = X[T_train + 1:]
    e1 = float(np.sqrt(np.mean((np.asarray(pred) - truth) ** 2)))
    e0 = float(np.sqrt(np.mean((np.asarray(pred0) - truth) ** 2)))
    if verbose:
        print(f"[controlled GPSSM] smoothing RMSE {sm:.4f} (obs noise 0.05), "
              f"FE {float(fe):.1f}; 1-step-ahead RMSE {e1:.4f} with true "
              f"controls vs {e0:.4f} zeroed ({e1/e0:.2f}×), "
              f"wall {time.time()-t0:.1f}s")
    return e1, e0


def run_co2(verbose: bool = True, holdout_frac: float = 0.15,
            nlml_steps: int = 300, write_json: bool = True):
    """Mauna-Loa CO₂ regression on the reference's OWN data file
    (data/co2data.csv — shipped but consumed by no reference notebook;
    VERDICT r3 item 6): the monthly series (1958→2024, T≈790) smoothed by
    the O(T) SDE-GP Matérn-5/2 engine with gradient θ learning through the
    scan, a random 15% of months held out for evaluation.

    Reports held-out RMSE before/after NLML learning, the learned θ, and
    the sequential-vs-parallel-in-time smoother agreement on this real
    series. Writes benchmarks/co2_sde_r4.json."""
    import json

    import optax

    from gaussianprocessnode_tpu.infer.sde_gp import sde_gp_nlml, sde_gp_smooth
    from gaussianprocessnode_tpu.utils.datasets import co2

    t_raw, y_raw = co2()
    mu, sd = float(y_raw.mean()), float(y_raw.std())
    t = jnp.asarray(t_raw - t_raw[0])
    y = jnp.asarray((y_raw - mu) / sd)
    T = t.shape[0]
    rng = np.random.default_rng(5)
    held = np.zeros(T, bool)
    held[rng.permutation(T)[: int(holdout_frac * T)]] = True
    mask = jnp.asarray(~held)
    obs_var0 = 1e-3  # init: monthly averages are near-noiseless at std scale

    theta0 = jnp.asarray([1.0, 1.0])  # [σ², ℓ] in years
    t0 = time.time()
    res0 = sde_gp_smooth(theta0, t, y, mask, obs_var0)

    # learn the noise variance jointly with θ (log-parametrized): at a
    # fixed obs_var the NLML optimum trades held-out sharpness for
    # calibration, and the data's true noise floor is not known a priori
    opt = optax.adamax(0.05)
    p0 = jnp.concatenate([theta0, jnp.log(jnp.asarray([obs_var0]))])

    @jax.jit
    def step(p, os_):
        g = jax.grad(lambda q: sde_gp_nlml(
            q[:2], t, y, mask, jnp.exp(q[2])))(p)
        upd, os_ = opt.update(g, os_, p)
        return optax.apply_updates(p, upd), os_

    p, os_ = p0, opt.init(p0)
    for _ in range(nlml_steps):
        p, os_ = step(p, os_)
    th, obs_var = p[:2], float(jnp.exp(p[2]))
    res1 = sde_gp_smooth(th, t, y, mask, obs_var)
    res1p = sde_gp_smooth(th, t, y, mask, obs_var, parallel=True)
    agree = float(jnp.max(jnp.abs(res1.mean - res1p.mean)))

    def rmse_ppm(r):
        d = (np.asarray(r.mean) - np.asarray(y))[held] * sd
        return float(np.sqrt(np.mean(d**2)))

    out = {
        "workload": "co2 (data/co2data.csv, orphaned in the reference)",
        "T": int(T), "held_out_months": int(held.sum()),
        "rmse_ppm_theta0": round(rmse_ppm(res0), 4),
        "rmse_ppm_learned": round(rmse_ppm(res1), 4),
        "theta_learned": [round(float(v), 4) for v in th],
        "obs_var_learned": obs_var,
        "log_lik_theta0": round(float(res0.log_lik), 2),
        "log_lik_learned": round(float(res1.log_lik), 2),
        "seq_vs_parallel_max_abs": agree,
        "seconds": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    if verbose:
        print(f"[co2] held-out RMSE {out['rmse_ppm_theta0']:.3f} → "
              f"{out['rmse_ppm_learned']:.3f} ppm after {nlml_steps} NLML "
              f"steps (θ={out['theta_learned']}, ℓ in years); "
              f"seq≡parallel to {agree:.2e}; wall {out['seconds']}s")
    if write_json:
        path = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "benchmarks", "co2_sde_r4.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    return out


def run_btc(verbose: bool = True, epochs: int = 40, n_train: int = 300,
            m_inducing: int = 16, n_test: int | None = None,
            write_json: bool = True):
    """BTC-USD GPSSM filtering on the reference's OWN data file
    (BTC-USD.csv — shipped but consumed by no reference notebook; VERDICT
    r3 item 6): standardized log-close prices as a D=1 GPSSM with a learned
    GP transition and Wishart process noise (the Pendulum_Wishart machinery
    at D=1), hyperopt by L-BFGS on the backward-message objective, then
    1-step-ahead filtering over the held-out tail.

    The honest metric on an efficient-market series is parity: the filter's
    1-step-ahead RMSE vs the random-walk baseline (predict y_{t+1}=y_t).
    Writes benchmarks/btc_gpssm_r4.json."""
    import json

    from gaussianprocessnode_tpu.dists import MvGaussianNat
    from gaussianprocessnode_tpu.infer.chain_smoother import (
        gpssm_vmp, one_step_ahead,
    )
    from gaussianprocessnode_tpu.infer.training import lbfgs_solve
    from gaussianprocessnode_tpu.objectives import neg_log_backwardmess_multi
    from gaussianprocessnode_tpu.ops.linalg import (
        chol_lower, chol_solve, cholinv, sum_blocks_weighted, sym,
    )
    from gaussianprocessnode_tpu.ops.kernels import invsoftplus, softplus
    from gaussianprocessnode_tpu.ops.quadrature import SphericalRadial
    from gaussianprocessnode_tpu.utils.datasets import btc_usd

    _, ohlcv = btc_usd()
    logp = np.log(ohlcv[:, 3])  # daily close
    mu, sd = logp[:n_train].mean(), logp[:n_train].std()
    z = (logp - mu) / sd
    y_train = jnp.asarray(z[:n_train, None])
    stop = None if n_test is None else n_train + n_test
    y_test = jnp.asarray(z[n_train:stop, None])
    D, M = 1, m_inducing

    kernel = Kernel("se", transform="softplus")
    theta0 = invsoftplus(jnp.asarray([1.0, 1.0]))
    lo, hi_ = float(z[:n_train].min()), float(z[:n_train].max())
    Xu = jnp.linspace(lo - 0.3, hi_ + 0.3, M)[:, None]
    prior_v = MvGaussianNat(jnp.zeros(M * D), jnp.eye(M * D) / 50.0)
    prior_x0 = jnp.asarray([float(z[0])])
    prior_x0_cov = 0.1 * jnp.eye(1)
    P = 1e-3 * jnp.eye(1)  # log-close is observed nearly noiselessly
    sr = SphericalRadial()

    def vmp(theta, init_state=None):
        return gpssm_vmp(kernel, theta, Xu, y_train, P, prior_x0,
                         prior_x0_cov, prior_v, 100.0, jnp.eye(1),
                         n_iters=8, init_state=init_state)

    def hyper_objective(theta, y_means, qx_means, qx_covs, sumRv_W, mu_v, W):
        return neg_log_backwardmess_multi(
            theta, kernel=kernel, Xu=Xu, y_means=y_means, qx_means=qx_means,
            qx_covs=qx_covs, sumRv_W=sumRv_W, mu_v=mu_v, W=W, method=sr,
        )

    @jax.jit
    def epoch_fn(carry, _):
        theta, vmp_state = carry
        state, fe = vmp(theta, init_state=vmp_state)
        L = chol_lower(sym(state.prec_v))
        cov_v = sym(chol_solve(L, jnp.eye(M * D)))
        mu_v = chol_solve(L, state.xi_v)
        Rv = cov_v + jnp.outer(mu_v, mu_v)
        W_bar = state.W_df * cholinv(sym(state.W_rate))
        sumRv_W = sum_blocks_weighted(Rv, W_bar, D, M)
        theta, _ = lbfgs_solve(
            lambda th: hyper_objective(
                th, state.x_means[1:], state.x_means[:-1], state.x_covs[:-1],
                sumRv_W, mu_v, W_bar),
            theta, max_steps=25,
        )
        return (theta, state), fe

    t0 = time.time()
    carry = (theta0, None)
    fes = []
    for _ in range(epochs):
        carry, fe = epoch_fn(carry, None)
        fes.append(float(fe))
    theta, state = carry

    pred_means, pred_covs = one_step_ahead(kernel, theta, Xu, state, y_test, P)
    pred = np.asarray(pred_means)[:, 0]
    truth = np.asarray(y_test)[:, 0]
    # predict y_t from the filter state BEFORE seeing y_t: pred[i] is the
    # 1-step-ahead predictive mean for test step i
    rmse_gp = float(np.sqrt(np.mean((pred - truth) ** 2))) * sd
    rw = np.concatenate([[z[n_train - 1]], truth[:-1]])
    rmse_rw = float(np.sqrt(np.mean((rw - truth) ** 2))) * sd

    out = {
        "workload": "btc-usd (BTC-USD.csv, orphaned in the reference)",
        "n_train": n_train, "n_test": int(truth.shape[0]), "epochs": epochs,
        "theta_softplus": [round(float(v), 4) for v in softplus(theta)],
        "fe_first": round(fes[0], 2), "fe_last": round(fes[-1], 2),
        "one_step_rmse_logprice_gp": round(rmse_gp, 6),
        "one_step_rmse_logprice_rw": round(rmse_rw, 6),
        "rmse_ratio_gp_over_rw": round(rmse_gp / rmse_rw, 4),
        "seconds": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    if verbose:
        print(f"[btc] 1-step-ahead RMSE(log price): GP {rmse_gp:.5f} vs "
              f"random-walk {rmse_rw:.5f} (ratio "
              f"{out['rmse_ratio_gp_over_rw']}); FE {fes[0]:.1f} → "
              f"{fes[-1]:.1f} over {epochs} epochs; wall {out['seconds']}s")
    if write_json:
        path = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "benchmarks", "btc_gpssm_r4.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
    return out


def _padscale_workload(T):
    """PAD-shaped smoother inputs: heteroscedastic pseudo-observations with
    a third of the sites inactive (what the EP loop feeds back)."""
    rng = np.random.default_rng(11)
    t = jnp.asarray(np.linspace(0.0, 60.0, T))
    z = jnp.asarray(rng.normal(size=T) * 0.5)
    r = jnp.asarray(rng.uniform(0.05, 2.0, size=T))
    mask = jnp.asarray(rng.uniform(size=T) < (2.0 / 3.0))
    return t, z, mask, r


def run_padscale_one(T: int, parallel: bool, reps: int = 10):
    """ONE (T, mode) measurement, printed as a JSON line — run in its OWN
    process by `run_padscale`: a long sequential f64 chain was measured to
    CRASH this tunnel's TPU worker (T=32768, execution — the same failure
    mode recorded for the full pendulum --tpu run), and a dead worker takes
    the whole process's backend with it, so isolation is what turns a crash
    into a data point."""
    import json

    from gaussianprocessnode_tpu.infer.sde_gp import sde_gp_smooth
    from gaussianprocessnode_tpu.utils.profiling import block_via_host

    theta = jnp.asarray([1.0, 0.9])
    t, z, mask, r = _padscale_workload(T)
    fn = lambda: sde_gp_smooth(theta, t, z, mask, r, parallel=parallel)
    c0 = time.time()
    out = fn()
    block_via_host(out.mean)
    compile_s = time.time() - c0
    tt = time.time()
    for _ in range(reps):
        o = fn()
    block_via_host(o.mean)
    ms = (time.time() - tt) / reps * 1e3
    print(json.dumps({
        "T": T, "mode": "parallel" if parallel else "sequential",
        "warm_ms": round(ms, 2), "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
        "mean_head": [float(v) for v in np.asarray(out.mean[:3])],
        "log_lik": float(out.log_lik)}))


def run_padscale(verbose: bool = True, sizes=(1 << 13, 1 << 15, 1 << 17),
                 write_json: bool = True):
    """Benchmark: sequential `lax.scan` vs parallel-in-time (associative
    scan) smoother at audio-scale T — GP-PAD's natural regime (the PAD
    notebooks demodulate signals; T = 10⁵–10⁶ at audio rates).

    Each (T, mode) runs in a fresh subprocess (see `run_padscale_one`); a
    measurement that crashes the TPU worker or times out is recorded as
    such instead of killing the sweep. Timing is warm (post-compile) with
    host materialization (DEVIATIONS #6a); where both modes survive at the
    same T, their posterior means and log-likelihoods are cross-checked.
    Not in the default experiment list — run explicitly:
    `python experiments/legacy_gp.py padscale [--tpu]`.
    """
    import json
    import subprocess

    for a in sys.argv:  # optional override: --sizes=8192,32768
        if a.startswith("--sizes="):
            sizes = tuple(int(s) for s in a.split("=")[1].split(","))
    rows = []
    for T in sizes:
        res = {}
        for mode in ("sequential", "parallel"):
            cmd = [sys.executable, _os.path.abspath(__file__),
                   "padscale-one", f"--T={T}", f"--mode={mode}"]
            if "--tpu" in sys.argv:
                cmd.append("--tpu")
            try:
                p = subprocess.run(cmd, capture_output=True, text=True,
                                   timeout=1200)
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("{")]
                if p.returncode == 0 and line:
                    res[mode] = json.loads(line[-1])
                else:
                    err = (p.stderr.strip().splitlines() or ["?"])[-1]
                    res[mode] = {"T": T, "mode": mode, "error": err[:300]}
            except subprocess.TimeoutExpired:
                res[mode] = {"T": T, "mode": mode, "error": "timeout 1200s"}
            if verbose:
                r = res[mode]
                msg = (f"{r['warm_ms']} ms warm (compile {r['compile_s']} s)"
                       if "warm_ms" in r else f"FAILED: {r['error'][:120]}")
                print(f"[pad-scale T={T} {mode}] {msg}", flush=True)
        row = {"T": T, **{m: res[m] for m in res}}
        if all("warm_ms" in res[m] for m in res):
            row["speedup"] = round(res["sequential"]["warm_ms"]
                                   / res["parallel"]["warm_ms"], 1)
            dm = max(abs(a - b) for a, b in zip(
                res["sequential"]["mean_head"], res["parallel"]["mean_head"]))
            dl = abs(res["sequential"]["log_lik"] - res["parallel"]["log_lik"])
            # a mismatch is RECORDED in the row, not asserted: an assert
            # would abort the sweep before the JSON is written, discarding
            # every earlier measurement (and disappears under python -O)
            ok = dm < 1e-6 and dl < 1e-5 * max(
                1.0, abs(res["sequential"]["log_lik"]))
            row["crosscheck"] = "ok" if ok else "FAILED"
            row["crosscheck_dmean"] = dm
            row["crosscheck_dll"] = dl
            if verbose:
                print(f"[pad-scale T={T}] speedup {row['speedup']}×, "
                      f"cross-check {row['crosscheck']} "
                      f"max|Δmean_head| {dm:.2e}", flush=True)
        rows.append(row)
    if write_json:
        payload = {"tpu": "--tpu" in sys.argv, "rows": rows}
        path = _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), "benchmarks", "pad_scale_r3.json")
        with open(path, "w") as f:
            json.dump(payload, f, indent=1)
        if verbose:
            print(f"[pad-scale] wrote {path}")
    return rows


if __name__ == "__main__":
    which = [a for a in sys.argv[1:] if not a.startswith("--")]
    if which == ["padscale-one"]:  # subprocess entry for run_padscale
        T = int(next(a for a in sys.argv if a.startswith("--T=")).split("=")[1])
        mode = next(a for a in sys.argv
                    if a.startswith("--mode=")).split("=")[1]
        run_padscale_one(T, parallel=(mode == "parallel"))
        sys.exit(0)
    which = which or ["tprocess", "sde", "fullcov", "pad", "pad2",
                      "padlearn", "control"]
    for w in which:
        {"tprocess": run_tprocess, "sde": run_sde,
         "fullcov": run_fullcov, "pad": run_pad, "pad2": run_pad2,
         "padlearn": run_padlearn, "padscale": run_padscale,
         "control": run_control, "co2": run_co2, "btc": run_btc}[w]()
