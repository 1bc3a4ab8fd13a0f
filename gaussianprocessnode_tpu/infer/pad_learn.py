"""Hyperparameter learning and model selection for the state-space GP /
GP-PAD families: EP model evidence, mean-field ELBOs, Bayesian lengthscale
posteriors, EP-EM point learning, and evidence-weighted mixtures.

TPU-native equivalents of the reference's remaining legacy-learning
notebooks (SURVEY §2.8):

- ``LearnParamsGPSDE-checkpoint.ipynb``: puts a Gaussian prior on the
  Matérn-5/2 SDE rate ``lλ ~ N(lλ_init, 10)`` (cell 11) and routes messages
  through per-step ``ComputeMatA/Q/P∞`` deterministic nodes (cells 8-12)
  with sampled/GH backward products — i.e. BAYESIAN inference of the
  state-space GP lengthscale inside the PAD model. Here the same posterior
  is computed without any per-step λ nodes: the λ-marginal is
  p(lλ | y) ∝ p₀(lλ)·p(y | lλ), and p(y | lλ) is available in closed O(T)
  form — exactly (Kalman prediction-error decomposition) for regression,
  and as the parallel-EP evidence for the PAD likelihood — so q(lλ) is a
  re-localized GH tilted moment match against the EXACT evidence curve
  (:func:`sde_gp_bayes_lengthscale`, :func:`gppad_bayes_lengthscale`),
  the same CVI-style update measured to be load-bearing in
  infer/fullcov_gp.py (DEVIATIONS #23a).
- ``LearnParams_PAD2-checkpoint.ipynb``: aims at learning the PAD-2
  amplitude/carrier hyperparameters (cells 9-11 rebuild A/Q/P∞ from θ; the
  committed notebook stops at fixed-θ inference). Here: EP-EM —
  alternate the EP/mean-field E-step with a gradient M-step on the
  site-frozen evidence (:func:`fit_gppad_theta`,
  :func:`fit_gppad_colored_theta`), all inside one jitted ``lax.scan``.
- ``GPPAD_mixture-checkpoint.ipynb``: K candidate (θ_amplitude, θ_carrier)
  settings scored by accumulated ``@logscale`` evidence into a Categorical
  switch (cells 7-15). Here: the model bank runs as ONE vmapped EP program
  and is scored by per-model evidence — the EP marginal likelihood AND the
  rigorous mean-field ELBO (both computed; they must agree on the ranking)
  — giving softmax responsibilities and an evidence-weighted envelope
  (:func:`gppad_mixture`, :func:`gppad_colored_mixture`).

Evidence construction (the shared piece). A converged EP chain holds
Gaussian sites s_k(f) = C_k·exp(λ₁ₖ f − λ₂ₖ f²/2) standing in for the true
likelihoods ℓ_k(f). Writing z = λ₁/λ₂, R = 1/λ₂ gives
exp(λ₁f − λ₂f²/2) = √(2πR)·e^{z²/(2R)}·N(z; f, R), so

    log Z_EP = log ∫ p(f₁..T) Π_k s_k(f_k) df
             = log Z_chain(z, R)                       [Kalman evidence]
             + Σ_k [log C_k + ½log(2πR_k) + z_k²/(2R_k)]

with log C_k = log Z_tilt,k − log G_k matching each site's mass to the true
likelihood against its cavity: Z_tilt,k = ∫ cav_k(f)·ℓ_k(f) df (GH) and
G_k = ∫ cav_k(f)·e^{λ₁f − λ₂f²/2} df (closed form). When ℓ_k is itself
Gaussian and the sites are exact, every correction is identically 0 and
log Z_EP equals the exact chain evidence (tests/test_pad_learn.py).

Mean-field ELBO (colored PAD). q(f) and q(c) are EXACT chain posteriors
under their own pseudo-observations, so log q = log p_θ + Σ log N(z_k; ·, R_k)
− log Z_chain and the KL terms collapse to closed forms:

    KL(q ‖ p) = Σ_k E_q[log N(z_k; x_k, R_k)] − log Z_chain,

and E_q(f)q(c)[log p(y | f, c)] is closed-form in the chain marginals
(E[e^f] = e^{m+v/2}, E[e^{2f}] = e^{2m+2v}, E[e^{−2f}] = e^{−2m+2v}) — no
quadrature anywhere in the bound.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..ops.quadrature import moment_match_uni, moment_match_uni_logz
from .gppad import (colored_pad_sweep, gppad_infer, gppad_colored_infer,
                    pad_loglik, PADState)
from .sde_gp import sde_gp_smooth

__all__ = [
    "ep_chain_evidence", "pad_evidence", "pad_elbo", "colored_pad_elbo",
    "sde_gp_bayes_lengthscale", "gppad_bayes_lengthscale", "BayesThetaResult",
    "fit_gppad_theta", "fit_gppad_colored_theta", "PADFitResult",
    "gppad_mixture", "gppad_colored_mixture", "MixturePADResult",
]


# ---------------------------------------------------------------------------
# EP evidence and mean-field ELBOs
# ---------------------------------------------------------------------------

def _cavities(m, v, lam1, lam2, active):
    """Delete each active site from its smoothed marginal (same guard
    pattern as gppad_infer's sweep: a site whose precision reached the
    marginal's has no valid cavity — clamp, its tilt falls back)."""
    raw = 1.0 / v - jnp.where(active, lam2, 0.0)
    prec = jnp.maximum(raw, 1e-12)
    v_cav = 1.0 / prec
    m_cav = (m / v - jnp.where(active, lam1, 0.0)) * v_cav
    return m_cav, v_cav, prec


def ep_chain_evidence(theta, t, lam1, lam2, loglik, args=(), n_gh: int = 61,
                      lam2_floor: float = 1e-10, parallel: bool = False):
    """EP approximation of log p(y | θ) for a Matérn-5/2 chain with Gaussian
    sites ``(lam1, lam2)`` standing in for per-point likelihoods
    ``exp(loglik(f, *args_k))`` (``args``: tuple of (T,) arrays of per-point
    likelihood data). Sites below ``lam2_floor`` are inactive: they
    contribute their cavity-tilt mass log Z_tilt,k directly (zeroth-order
    inclusion of a likelihood the sites never captured) and are masked out
    of the Kalman pass. See the module docstring for the construction."""
    t = jnp.asarray(t)
    dt = t.dtype
    lam1 = jnp.asarray(lam1, dt)
    lam2 = jnp.asarray(lam2, dt)
    r = 1.0 / jnp.maximum(lam2, lam2_floor)
    z = lam1 * r
    active = lam2 > lam2_floor
    res = sde_gp_smooth(theta, t, z, active, r, parallel=parallel)
    m_cav, v_cav, prec_cav = _cavities(res.mean, res.var, lam1, lam2, active)

    def tilt_logz(mc, vc, a):
        _, _, lz = moment_match_uni_logz(
            lambda f: loglik(f, *a), mc, vc, n=n_gh)
        return lz

    log_zt = jax.vmap(tilt_logz)(m_cav, v_cav, args)
    # log G_k = log ∫ cav·e^{λ₁f − λ₂f²/2} df: combined precision p, linear h
    p = prec_cav + lam2
    h = m_cav * prec_cav + lam1
    log_g = 0.5 * (jnp.log(prec_cav) - jnp.log(p) + h * h / p
                   - m_cav * m_cav * prec_cav)
    corr = jnp.where(
        active,
        log_zt - log_g + 0.5 * jnp.log(2.0 * jnp.pi * r) + 0.5 * z * z / r,
        log_zt)
    return res.log_lik + jnp.sum(corr)


def pad_evidence(theta, t, y, lam1, lam2, carrier_var=1.0, n_gh: int = 61,
                 lam2_floor: float = 1e-10, parallel: bool = False):
    """EP marginal likelihood of the white-carrier PAD model
    y_t = c_t·e^{f_t}, c_t ~ N(0, σ_c²) at the given converged sites."""
    y = jnp.asarray(y)
    return ep_chain_evidence(
        theta, t, lam1, lam2,
        lambda f, yk: pad_loglik(yk, f, carrier_var), (y,),
        n_gh=n_gh, lam2_floor=lam2_floor, parallel=parallel)


def _site_cross_terms(z, r, m, v, active):
    """Σ_active E_q[log N(z_k; x_k, R_k)] — the closed-form piece of
    KL(q‖p) for an exact chain posterior under pseudo-observations."""
    e = -0.5 * (jnp.log(2.0 * jnp.pi * r) + ((z - m) ** 2 + v) / r)
    return jnp.sum(jnp.where(active, e, 0.0))


def pad_elbo(theta, t, y, state: PADState, carrier_var=1.0,
             lam2_floor: float = 1e-10, parallel: bool = False):
    """Rigorous mean-field ELBO of the white-carrier PAD model at the
    state's q(f): Σ_t E_q[log N(y_t; 0, σ_c² e^{2f_t})] − KL(q(f)‖p(f)).
    Fully closed form: E_q[log-lik] = −½log(2πσ_c²) − m_t −
    y_t²·e^{−2m_t+2v_t}/(2σ_c²); the KL collapses per the module docstring.
    A lower bound on the true log-evidence — ranked against
    :func:`pad_evidence` in the mixture tests."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    lam2 = jnp.asarray(state.lam2, t.dtype)
    lam1 = jnp.asarray(state.lam1, t.dtype)
    r = 1.0 / jnp.maximum(lam2, lam2_floor)
    z = lam1 * r
    active = lam2 > lam2_floor
    res = sde_gp_smooth(theta, t, z, active, r, parallel=parallel)
    m, v = res.mean, res.var
    e_lik = jnp.sum(-0.5 * jnp.log(2.0 * jnp.pi * carrier_var) - m
                    - y * y * jnp.exp(-2.0 * m + 2.0 * v)
                    / (2.0 * carrier_var))
    kl = _site_cross_terms(z, r, m, v, active) - res.log_lik
    return e_lik - kl


def colored_pad_elbo(theta_f, theta_c, t, y, lam1, lam2, obs_var=1e-3,
                     lam2_floor: float = 1e-10, parallel: bool = False):
    """Rigorous mean-field ELBO of the colored-carrier PAD model
    (GPSSD_PAD_2) at the f-sites ``(lam1, lam2)``:

        F = Σ_t E_q(f)q(c)[log N(y_t; c_t e^{f_t}, σ_y²)]
            − KL(q(f)‖p(f)) − KL(q(c)‖p(c)),

    where q(c) is the exact carrier chain posterior the inference loop
    builds from the f-moments (gppad_colored_infer's final pass) — both KLs
    collapse to closed forms because each q is an exact chain posterior
    under its own pseudo-observations."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    lam1 = jnp.asarray(lam1, t.dtype)
    lam2 = jnp.asarray(lam2, t.dtype)
    rf = 1.0 / jnp.maximum(lam2, lam2_floor)
    zf = lam1 * rf
    active = lam2 > lam2_floor
    resf = sde_gp_smooth(theta_f, t, zf, active, rf, parallel=parallel)
    m, v = resf.mean, resf.var
    eg = jnp.exp(m + 0.5 * v)
    eg2 = jnp.exp(2.0 * m + 2.0 * v)
    zc = y * eg / eg2
    rc = obs_var / eg2
    ones = jnp.ones(y.shape[0], bool)
    resc = sde_gp_smooth(theta_c, t, zc, ones, rc, parallel=parallel)
    mc, vc = resc.mean, resc.var
    e_lik = jnp.sum(-0.5 * jnp.log(2.0 * jnp.pi * obs_var)
                    - (y * y - 2.0 * y * mc * eg + (mc * mc + vc) * eg2)
                    / (2.0 * obs_var))
    kl_f = _site_cross_terms(zf, rf, m, v, active) - resf.log_lik
    kl_c = _site_cross_terms(zc, rc, mc, vc, ones) - resc.log_lik
    return e_lik - kl_f - kl_c


# ---------------------------------------------------------------------------
# Bayesian lengthscale posteriors (LearnParamsGPSDE)
# ---------------------------------------------------------------------------

class BayesThetaResult(NamedTuple):
    m_s: jax.Array  # posterior mean of s = log ℓ
    v_s: jax.Array  # posterior variance of s
    trace: jax.Array  # (iters, 2) per-iteration (m_s, v_s)


def _bayes_lengthscale(log_evidence, m0, v0, iters, n_gh, dtype):
    """Shared re-localized GH tilt loop: q(s) ← moments of
    p₀(s)·exp(log_evidence(s)) evaluated on q's own grid via the importance
    tilt log_ev + log p₀ − log q (the fullcov_gp.py CVI update — a fixed
    prior-wide grid was measured there to collapse onto one node).

    Non-finite evidence values are mapped to −∞ (zero quadrature mass)
    BEFORE the product: the prior-wide first sweep (v₀ = 10 → GH-21 nodes
    out to s ≈ ±25) probes lengthscales where the Kalman evidence NaNs
    (measured: s ≤ −6.5 on an 80-point chain), and moment_match_uni's
    whole-product NaN fallback would otherwise freeze q(s) at the prior
    forever. The reference-parity fallback semantics of moment_match_uni
    itself are untouched — this model has no Julia counterpart to match."""
    m0 = jnp.asarray(m0, dtype)
    v0 = jnp.asarray(v0, dtype)

    def sweep(carry, _):
        m_s, v_s = carry

        def log_tilt(s):
            le = log_evidence(s)
            le = jnp.where(jnp.isfinite(le), le, -jnp.inf)
            return (le
                    - (s - m0) ** 2 / (2.0 * v0)
                    + (s - m_s) ** 2 / (2.0 * v_s))

        m_new, v_new = moment_match_uni(log_tilt, m_s, v_s, n=n_gh)
        # variance trust region: the evidence curve spans thousands of
        # nats across a prior-wide grid, so the first product puts all
        # its mass on ONE GH node — v_new ≈ 0 — and an undamped update
        # freezes there forever (measured: (m, v) = (0, 2e-12) against a
        # grid posterior at (−0.52, 0.016)). Shrinking at most 4× per
        # sweep localizes gradually; once the grid matches the posterior
        # width the floor is inactive and the fixed point is exact.
        v_s = jnp.maximum(v_new, 0.25 * v_s)
        m_s = m_new
        return (m_s, v_s), jnp.stack([m_s, v_s])

    (m_s, v_s), trace = jax.lax.scan(sweep, (m0, v0), None, length=iters)
    return BayesThetaResult(m_s=m_s, v_s=v_s, trace=trace)


@partial(jax.jit, static_argnames=("iters", "n_gh"))
def sde_gp_bayes_lengthscale(t, y, obs_mask, obs_var, m0=0.0, v0=10.0,
                             sigma2=1.0, iters: int = 8, n_gh: int = 21
                             ) -> BayesThetaResult:
    """Gaussian posterior q(s), s = log ℓ, for Matérn-5/2 SDE GP REGRESSION:
    the tilt is the EXACT O(T) Kalman evidence log p(y | ℓ = e^s), so the
    only approximation is the Gaussian family + GH grid — testable against
    a dense numeric grid posterior (tests/test_pad_learn.py). The
    reference's LearnParamsGPSDE puts this prior on log λ = log√5 − log ℓ
    (cell 13, variance 10); s = log ℓ is the same family mirrored."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    s2 = jnp.asarray(sigma2, t.dtype)

    def log_ev(s):
        theta = jnp.stack([s2, jnp.exp(s)])
        return sde_gp_smooth(theta, t, y, obs_mask, obs_var).log_lik

    return _bayes_lengthscale(log_ev, m0, v0, iters, n_gh, t.dtype)


@partial(jax.jit, static_argnames=("iters", "ep_iters", "n_gh", "n_gh_theta"))
def gppad_bayes_lengthscale(t, y, carrier_var=1.0, m0=0.0, v0=10.0,
                            sigma2=1.0, iters: int = 6, ep_iters: int = 15,
                            n_gh: int = 61, n_gh_theta: int = 21
                            ) -> BayesThetaResult:
    """Gaussian posterior q(s), s = log ℓ, over the PAD log-envelope prior's
    lengthscale — the LearnParamsGPSDE model itself (its gpPAD_params,
    cell 11: data are amplitude-modulated, lλ is random). Each GH node runs
    its own parallel-EP inference and is scored by its EP evidence; the
    whole update is one jitted program (21 EP chains per sweep, vmapped)."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    s2 = jnp.asarray(sigma2, t.dtype)

    def log_ev(s):
        theta = jnp.stack([s2, jnp.exp(s)])
        st = gppad_infer(theta, t, y, carrier_var=carrier_var,
                         iters=ep_iters, n_gh=n_gh)
        return pad_evidence(theta, t, y, st.lam1, st.lam2,
                            carrier_var=carrier_var, n_gh=n_gh)

    return _bayes_lengthscale(log_ev, m0, v0, iters, n_gh_theta, t.dtype)


# ---------------------------------------------------------------------------
# Implicit differentiation of an E-step fixed point
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(0, 3, 4))
def _fixed_point(step, theta, x0, n_fwd: int, n_bwd: int):
    """x* ≈ step(θ, ·) iterated ``n_fwd`` times from ``x0``, with the
    implicit-function-theorem VJP: treating x* as the fixed point
    x* = step(θ, x*), the adjoint is u = ḡ + (∂step/∂x)ᵀu (a Neumann
    series solved by ``n_bwd`` iterations of the same contraction the
    forward loop converges under), and θ̄ = (∂step/∂θ)ᵀu.

    Why not just backprop the scan: a WARM-started E-step at its fixed
    point contributes dq/dθ = Σ_{j<K} Mʲ·∂step/∂θ through K unrolled
    sweeps — the truncation at K=12 with damping 0.5 was MEASURED to lose
    most of the q-response on the colored-PAD ELBO (ℓ_f driven 0.3 → 0.20
    against a converged-objective gradient of the opposite sign; the same
    failure mode as the frozen-site surrogate, which is its K=0 limit).
    The adjoint iteration extends the series to n_bwd terms at the cost of
    one sweep-VJP each, independent of the forward warm-start depth.
    No gradient flows to x0 (a true fixed point forgets its start)."""
    x, _ = jax.lax.scan(lambda c, _: (step(theta, c), None), x0, None,
                        length=n_fwd)
    return x


def _fixed_point_fwd(step, theta, x0, n_fwd, n_bwd):
    x = _fixed_point(step, theta, x0, n_fwd, n_bwd)
    return x, (theta, x)


def _fixed_point_bwd(step, n_fwd, n_bwd, res, gbar):
    theta, x = res
    _, vjp_x = jax.vjp(lambda xx: step(theta, xx), x)

    def body(u, _):
        (mu,) = vjp_x(u)
        return jax.tree.map(jnp.add, gbar, mu), None

    u, _ = jax.lax.scan(body, gbar, None, length=n_bwd)
    _, vjp_th = jax.vjp(lambda th: step(th, x), theta)
    (th_bar,) = vjp_th(u)
    return th_bar, jax.tree.map(jnp.zeros_like, x)


_fixed_point.defvjp(_fixed_point_fwd, _fixed_point_bwd)


# ---------------------------------------------------------------------------
# EP-EM point learning (LearnParams_PAD2)
# ---------------------------------------------------------------------------

class PADFitResult(NamedTuple):
    theta: jax.Array  # learned θ (white: [σ², ℓ]; colored: [ℓ_f, ℓ_c])
    evidence: jax.Array  # (epochs,) objective trace (EP evidence / surrogate)
    theta_trace: jax.Array  # (epochs, d)
    sites: tuple  # final (lam1, lam2) f-sites


@partial(jax.jit, static_argnames=("epochs", "ep_iters", "n_gh", "learn_var"))
def fit_gppad_theta(t, y, theta0, carrier_var=1.0, epochs: int = 30,
                    ep_iters: int = 10, learning_rate: float = 0.08,
                    n_gh: int = 61, learn_var: bool = True) -> PADFitResult:
    """EP-EM for the white-carrier PAD prior θ = [σ², ℓ]: per epoch, an
    E-step of ``ep_iters`` warm-started parallel-EP sweeps at the current θ,
    then one Adam step on −:func:`pad_evidence` in log θ with the SITES
    FROZEN (the EP-EM surrogate: at an EP fixed point the site-frozen
    evidence gradient matches the marginal-likelihood gradient to the order
    of the EP approximation itself). One jitted ``lax.scan`` over epochs."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    T = y.shape[0]
    log_th0 = jnp.log(jnp.asarray(theta0, t.dtype))
    opt = optax.adam(learning_rate)

    def objective(log_th, lam1, lam2):
        th = jnp.exp(log_th)
        th = th if learn_var else jnp.stack([jnp.exp(log_th0[0]), th[1]])
        return -pad_evidence(th, t, y, lam1, lam2,
                             carrier_var=carrier_var, n_gh=n_gh)

    def epoch(carry, _):
        log_th, lam1, lam2, opt_state = carry
        st = gppad_infer(jnp.exp(log_th), t, y, carrier_var=carrier_var,
                         iters=ep_iters, n_gh=n_gh, sites0=(lam1, lam2))
        neg_ev, g = jax.value_and_grad(objective)(log_th, st.lam1, st.lam2)
        updates, opt_state = opt.update(g, opt_state)
        log_th = optax.apply_updates(log_th, updates)
        return ((log_th, st.lam1, st.lam2, opt_state),
                (-neg_ev, jnp.exp(log_th)))

    init = (log_th0, jnp.zeros(T, t.dtype), jnp.zeros(T, t.dtype),
            opt.init(log_th0))
    (log_th, lam1, lam2, _), (evs, ths) = jax.lax.scan(
        epoch, init, None, length=epochs)
    theta = jnp.exp(log_th)
    if not learn_var:
        theta = jnp.stack([jnp.exp(log_th0[0]), theta[1]])
    # one final E-step AT the learned θ: the scan's last carry holds sites
    # from the E-step taken before the final θ update, so returning them
    # directly would hand back a one-θ-step-inconsistent (θ, sites) pair
    # (pad_evidence(θ, sites) ≠ evidence[-1])
    st = gppad_infer(theta, t, y, carrier_var=carrier_var,
                     iters=ep_iters, n_gh=n_gh, sites0=(lam1, lam2))
    return PADFitResult(theta=theta, evidence=evs, theta_trace=ths,
                        sites=(st.lam1, st.lam2))


@partial(jax.jit, static_argnames=("epochs", "ep_iters", "adjoint_iters",
                                   "n_gh"))
def fit_gppad_colored_theta(t, y, ell0, var_f=1.0, var_c=0.5,
                            obs_var=1e-3, epochs: int = 25,
                            ep_iters: int = 150, adjoint_iters: int = 60,
                            learning_rate: float = 0.08,
                            damping: float = 0.8,
                            n_gh: int = 61) -> PADFitResult:
    """Variational EM for the colored-carrier PAD lengthscales ℓ = [ℓ_f, ℓ_c]
    (LearnParams_PAD2's θ_amplitude[1], θ_carrier[1]; the variances stay at
    the notebook's fixed settings). Per epoch: a warm-started
    ``ep_iters``-sweep E-step, then one Adam step on −:func:`colored_pad_elbo`
    with the E-step fixed point differentiated IMPLICITLY
    (:func:`_fixed_point`: adjoint Neumann iteration, ``adjoint_iters``
    sweep-VJPs).

    Why implicit: the mean-field ELBO is NOT stationary in the parallel-EP
    sites (they come from moment-matching tilts, not ELBO ascent), so unlike
    the white-carrier EP-EM the site response dq*/dθ carries most of the
    ℓ_f signal. Three cheaper gradients were each measured to drive ℓ_f the
    WRONG way on notebook-shaped draws (truth ℓ_f = 0.8, start 0.3): the
    site-frozen chain evidence (0.3 → 0.18), the site-frozen ELBO
    (0.3 → 0.19), and backprop through the warm-started 12-sweep stack
    (0.3 → 0.20 — at the fixed point the truncated chain collapses toward
    the frozen-site gradient, its K=0 limit).

    Why the E-step is DEEP (150 sweeps) and lightly damped (0.8): the f↔c
    mean-field exchange relaxes slowly — at the generating θ the per-sweep
    ELBO was still climbing after 600 damping-0.5 sweeps (−27 → +62 over
    sweeps 60→360; damping 1.0 reaches +84 in the same budget and is
    stable; an explicit 1-D move over the global (f+a, c·e^{−a})
    likelihood-invariance picked a ≈ 0 after the first sweeps, so the slow
    mode is the local relaxation itself, not that global trade). A shallow
    12-sweep E-step leaves the trainer on a lagged site manifold where even
    the implicit gradient stalls (measured: ℓ_f parked at ~0.20 for 60
    epochs while the CONVERGED ELBO at ℓ_f = 0.8 was +79 vs −23 at 0.2).
    With the deep E-step the fit climbs straight through the truth —
    ℓ_f: 0.3 → 0.85 by epoch 12 → 1.86 at epoch 25 (the converged-ELBO
    plateau above the truth, where corr(f, truth) peaks; the earlier curve
    measurements: ELBO −42.8 at ℓ_f = 0.3 → +3.9 at 0.8 → +18.4 at 2.0,
    corr peaking 0.893 near 1.2), and ℓ_c: 0.1 → 0.051 (truth 0.05), ELBO
    monotone throughout (tests/test_pad_learn.py::TestEPEM). Sweeps are
    O(T) scans, so depth is cheap on the target hardware."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    T = y.shape[0]
    log_l0 = jnp.log(jnp.asarray(ell0, t.dtype))
    vf = jnp.asarray(var_f, t.dtype)
    vc_ = jnp.asarray(var_c, t.dtype)
    opt = optax.adam(learning_rate)

    def estep(th_pair, sites):
        return colored_pad_sweep(th_pair[0], th_pair[1], t, y, sites,
                                 obs_var=obs_var, n_gh=n_gh,
                                 damping=damping)

    def objective(log_l, lam1, lam2):
        th_f = jnp.stack([vf, jnp.exp(log_l[0])])
        th_c = jnp.stack([vc_, jnp.exp(log_l[1])])
        sites = _fixed_point(estep, (th_f, th_c), (lam1, lam2),
                             ep_iters, adjoint_iters)
        neg = -colored_pad_elbo(th_f, th_c, t, y, sites[0], sites[1],
                                obs_var=obs_var)
        return neg, sites

    def epoch(carry, _):
        log_l, lam1, lam2, opt_state = carry
        (neg, (lam1, lam2)), g = jax.value_and_grad(
            objective, has_aux=True)(log_l, lam1, lam2)
        updates, opt_state = opt.update(g, opt_state)
        log_l = optax.apply_updates(log_l, updates)
        return ((log_l, lam1, lam2, opt_state),
                (-neg, jnp.exp(log_l)))

    init = (log_l0, jnp.zeros(T, t.dtype), jnp.zeros(T, t.dtype),
            opt.init(log_l0))
    (log_l, lam1, lam2, _), (evs, ls) = jax.lax.scan(
        epoch, init, None, length=epochs)
    return PADFitResult(theta=jnp.exp(log_l), evidence=evs, theta_trace=ls,
                        sites=(lam1, lam2))


# ---------------------------------------------------------------------------
# Mixture PAD (GPPAD_mixture)
# ---------------------------------------------------------------------------

class MixturePADResult(NamedTuple):
    log_evidence: jax.Array  # (K,) per-model EP evidence (white) / ELBO
    elbo: jax.Array  # (K,) per-model mean-field ELBO
    resp: jax.Array  # (K,) posterior model responsibilities
    envelopes: jax.Array  # (K, T) per-model E[e^f]
    envelope: jax.Array  # (T,) responsibility-weighted envelope


def _responsibilities(scores, log_prior):
    lp = scores if log_prior is None else scores + log_prior
    return jax.nn.softmax(lp)


@partial(jax.jit, static_argnames=("iters", "n_gh"))
def gppad_mixture(thetas, t, y, carrier_vars=None, log_prior=None,
                  iters: int = 25, n_gh: int = 61) -> MixturePADResult:
    """K-model white-carrier PAD bank (GPPAD_mixture's nmixtures candidate
    hyperparameter settings, cells 9-10): one vmapped EP program over the
    bank, each model scored by its EP evidence (responsibilities =
    softmax(log-evidence + log-prior)) with the mean-field ELBO computed
    alongside as a ranking cross-check. ``thetas``: (K, 2) rows [σ², ℓ];
    ``carrier_vars``: (K,) or None (= 1)."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    thetas = jnp.asarray(thetas, t.dtype)
    K = thetas.shape[0]
    cvars = (jnp.ones(K, t.dtype) if carrier_vars is None
             else jnp.asarray(carrier_vars, t.dtype))

    def one(th, cv):
        st = gppad_infer(th, t, y, carrier_var=cv, iters=iters, n_gh=n_gh)
        ev = pad_evidence(th, t, y, st.lam1, st.lam2, carrier_var=cv,
                          n_gh=n_gh)
        el = pad_elbo(th, t, y, st, carrier_var=cv)
        return ev, el, st.envelope

    evs, els, envs = jax.vmap(one)(thetas, cvars)
    resp = _responsibilities(evs, log_prior)
    return MixturePADResult(log_evidence=evs, elbo=els, resp=resp,
                            envelopes=envs, envelope=resp @ envs)


@partial(jax.jit, static_argnames=("iters", "n_gh"))
def gppad_colored_mixture(thetas_f, thetas_c, t, y, obs_var=1e-3,
                          log_prior=None, iters: int = 30, n_gh: int = 61
                          ) -> MixturePADResult:
    """K-model COLORED PAD bank — the GPPAD_mixture notebook's actual
    setting (per-component (θ_amplitude, θ_carrier) pairs, cell 9) — scored
    by the rigorous mean-field ELBO :func:`colored_pad_elbo` (the notebook's
    per-switch @logscale accumulation has no well-defined equivalent under
    a converged mean-field posterior; the ELBO is the principled
    lower-bound score on each model's evidence)."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    thetas_f = jnp.asarray(thetas_f, t.dtype)
    thetas_c = jnp.asarray(thetas_c, t.dtype)

    def one(th_f, th_c):
        st = gppad_colored_infer(th_f, th_c, t, y, obs_var=obs_var,
                                 iters=iters, n_gh=n_gh)
        el = colored_pad_elbo(th_f, th_c, t, y, st.lam1, st.lam2,
                              obs_var=obs_var)
        return el, st.envelope

    els, envs = jax.vmap(one)(thetas_f, thetas_c)
    resp = _responsibilities(els, log_prior)
    return MixturePADResult(log_evidence=els, elbo=els, resp=resp,
                            envelopes=envs, envelope=resp @ envs)
