"""GP probabilistic amplitude demodulation (GP-PAD): recover a slow
log-amplitude GP envelope from an amplitude-modulated signal.

TPU-native equivalent of the reference's legacy PAD notebooks
(``.ipynb_checkpoints/GPSSD_PAD-checkpoint.ipynb`` and variants): their
model (cells 2-8) is

    f ~ Matérn-5/2 GP (state-space form — the same F/P∞/A/Q chain as
        infer/sde_gp.py, their cell 9),
    y_t = c_t · exp(f_t),  carrier c_t ~ N(0, σ_c²)

so marginally  p(y_t | f_t) = N(y_t; 0, σ_c² e^{2 f_t})  — a closed-form
but non-Gaussian likelihood (the notebook routes it through a MyExponential
→ LogNormal node chain with GH-131 products; here it is ONE exact log-pdf).

Inference is an EP smoother over the chain: Gaussian sites (λ₁ₜ, λ₂ₜ)
stand in for each likelihood; one outer iteration = a Kalman/RTS sweep
with the sites as heteroscedastic pseudo-observations
(:func:`sde_gp_smooth` — O(T), one `lax.scan` pair), then a vmapped GH
tilt of every cavity against the EXACT likelihood and a damped site
update. All sites update in parallel from one smoothing pass (parallel
EP), so an iteration is a fixed sequence of scans + batched quadrature —
TPU-shaped, no per-site sequential loop.

The site update is branchless: non-PSD candidates (1/ṽ ≤ cavity
precision) and NaN tilts keep the previous site, mirroring the repo-wide
guard style.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.quadrature import moment_match_uni
from .sde_gp import sde_gp_smooth

__all__ = ["PADState", "gppad_infer", "pad_loglik",
           "ColoredPADState", "gppad_colored_infer", "colored_pad_loglik",
           "colored_pad_sweep", "two_stage_tilt"]


class PADState(NamedTuple):
    mean: jax.Array  # (T,) smoothed posterior mean of the log-envelope f
    var: jax.Array  # (T,) smoothed posterior variance of f
    lam1: jax.Array  # (T,) site natural mean parameters
    lam2: jax.Array  # (T,) site precisions
    envelope: jax.Array  # (T,) E[e^f] = exp(mean + var/2)
    site_delta: jax.Array  # per-iteration max |Δλ₂| trace (convergence)


def pad_loglik(y, f, carrier_var):
    """Exact log p(y | f) = log N(y; 0, σ_c² e^{2f}) for one point."""
    v = carrier_var * jnp.exp(2.0 * f)
    return -0.5 * (jnp.log(2.0 * jnp.pi * v) + y * y / v)


@partial(jax.jit, static_argnames=("iters", "n_gh", "parallel"))
def gppad_infer(
    theta,  # [σ² (GP variance), ℓ] of the Matérn-5/2 log-envelope prior
    t,  # (T,) timeline
    y,  # (T,) modulated observations
    carrier_var: float = 1.0,  # σ_c² of the carrier (notebook's σ_c)
    iters: int = 20,
    damping: float = 0.5,
    n_gh: int = 61,  # the notebook uses GH-131 for its products
    lam2_floor: float = 1e-10,
    sites0=None,  # optional (lam1, lam2) warm start — EP-EM re-runs
    parallel: bool = False,  # parallel-in-time chain sweeps (associative scan)
) -> PADState:
    """Parallel-EP GP-PAD. Returns the smoothed log-envelope posterior and
    the site trajectory diagnostics."""
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    T = y.shape[0]
    dt = t.dtype

    def sweep(carry, _):
        lam1, lam2 = carry
        # sites as heteroscedastic pseudo-observations; a floor keeps the
        # smoother well-posed while mask kills no-information sites
        r = 1.0 / jnp.maximum(lam2, lam2_floor)
        z = lam1 * r
        mask = lam2 > lam2_floor
        res = sde_gp_smooth(theta, t, z, mask, r, parallel=parallel)
        m, v = res.mean, res.var
        # cavity: delete the site from the smoothed marginal. A site whose
        # precision has crept up to the marginal's (raw cavity precision
        # ≤ 0 under rounding) has no valid cavity: clamping alone would
        # inflate m_cav by the clamp factor (~1e12) and the finite-moments
        # guard below could NOT catch it — so such sites are frozen this
        # sweep via cav_ok.
        raw_prec_cav = 1.0 / v - lam2
        cav_ok = raw_prec_cav > 1e-12
        prec_cav = jnp.maximum(raw_prec_cav, 1e-12)
        v_cav = 1.0 / prec_cav
        m_cav = (m / v - lam1) * v_cav

        # GH tilt of every cavity against the exact likelihood, in parallel
        def tilt(mc, vc, yk):
            return moment_match_uni(
                lambda f: pad_loglik(yk, f, carrier_var), mc, vc, n=n_gh)

        m_t, v_t = jax.vmap(tilt)(m_cav, v_cav, y)
        # derivative-safe floor: tilted variances below 1e-13 would be
        # rejected anyway (1/v_t > 1e13 ≥ the 1e12 ceiling below), but
        # their UNCLAMPED reciprocal has an unbounded derivative that
        # poisons the rejection-where's VJP (0·inf = NaN) — the EP-EM
        # trainers (infer/pad_learn.py) differentiate through this sweep.
        v_t = jnp.maximum(v_t, 1e-13)
        lam2_new = 1.0 / v_t - prec_cav
        lam1_new = m_t / v_t - m_cav * prec_cav
        # the 1e12 ceiling mirrors the reference's clamp(·, 1e-12, 1e12)
        # on its energy terms (UniSGPnode.jl:189-190): under θ badly
        # mismatched to the data the site loop has a positive feedback
        # (sharper pseudo-obs → sharper tilt) measured to run precisions
        # to 1e53, where the evidence/ELBO cross-terms lose all precision
        ok = (cav_ok & jnp.isfinite(lam1_new) & jnp.isfinite(lam2_new)
              & (lam2_new > 0) & (lam2_new < 1e12))
        lam1_new = jnp.where(ok, lam1_new, lam1)
        lam2_new = jnp.where(ok, lam2_new, lam2)
        lam1 = (1.0 - damping) * lam1 + damping * lam1_new
        lam2 = (1.0 - damping) * lam2 + damping * lam2_new
        delta = jnp.max(jnp.abs(lam2 - carry[1]))
        return (lam1, lam2), delta

    if sites0 is None:
        init = (jnp.zeros(T, dt), jnp.zeros(T, dt))
    else:
        init = (jnp.asarray(sites0[0], dt), jnp.asarray(sites0[1], dt))
    (lam1, lam2), deltas = jax.lax.scan(sweep, init, None, length=iters)
    r = 1.0 / jnp.maximum(lam2, lam2_floor)
    res = sde_gp_smooth(theta, t, lam1 * r, lam2 > lam2_floor, r,
                        parallel=parallel)
    return PADState(mean=res.mean, var=res.var, lam1=lam1, lam2=lam2,
                    envelope=jnp.exp(res.mean + 0.5 * res.var),
                    site_delta=deltas)


class ColoredPADState(NamedTuple):
    f_mean: jax.Array  # (T,) smoothed log-envelope posterior mean
    f_var: jax.Array  # (T,)
    c_mean: jax.Array  # (T,) smoothed carrier posterior mean
    c_var: jax.Array  # (T,)
    envelope: jax.Array  # (T,) E[e^f]
    site_delta: jax.Array  # per-outer-iteration max |Δλ₂| on the f-sites
    lam1: jax.Array  # (T,) f-site natural mean parameters (EP-EM warm starts)
    lam2: jax.Array  # (T,) f-site precisions


def colored_pad_loglik(y, f, mc, vc, obs_var):
    """E_q(c)[log N(y; c·e^f, σ_y²)] up to f-constants: the f-likelihood of
    the colored-carrier model with the carrier marginalized under its
    current Gaussian posterior q(c_t) = N(mc, vc)."""
    g = jnp.exp(f)
    return (y * mc * g - 0.5 * (mc * mc + vc) * g * g) / obs_var


def two_stage_tilt(ll, m, v, n: int = 61):
    """Moment-match N(m, v)·exp(ll) with a RE-LOCALIZED second pass: the
    colored model's likelihood is far sharper than the cavity (σ_y² ~ 1e-3
    scales it by ~1000), so a single cavity-scaled GH grid under-resolves
    the tilted density (measured: 0.04 absolute mean error at σ_y² = 1e-2).
    Pass 1 estimates the tilted moments; pass 2 re-evaluates the SAME
    product on a grid centered there via the importance identity
    q₁·exp(ll + log N_cav − log N_q₁) ∝ N_cav·exp(ll)."""
    m1, v1 = moment_match_uni(ll, m, v, n=n)
    # derivative-safe floor on the pass-1 variance: a near-delta likelihood
    # can collapse the product onto ONE GH node (measured v1 ~ 1e-179 at
    # σ_y² = 1e-3 with a strong carrier), and pass 2's re-localization term
    # (f−m1)²/(2v1) then divides by v1² in the VJP — under/overflow → NaN
    # for every consumer that differentiates through the tilt
    # (infer/pad_learn.py's EP-EM). A raw v1 this sharp indicates a site
    # that is overwhelmingly likely to exceed the λ₂ ≥ 1e12 rejection
    # ceiling; the floor widens pass 2's grid for exactly those sites (in
    # principle an update could re-localize back under the ceiling and be
    # accepted where the unfloored pass would have rejected it, but only
    # at sites already at the edge of numerical meaning).
    v1 = jnp.maximum(v1, 1e-12)

    def ll2(f):
        return ll(f) - (f - m) ** 2 / (2.0 * v) + (f - m1) ** 2 / (2.0 * v1)

    return moment_match_uni(ll2, m1, v1, n=n)


def colored_pad_sweep(theta_f, theta_c, t, y, sites, obs_var=1e-3,
                      damping: float = 0.5, n_gh: int = 61,
                      lam2_floor: float = 1e-10, parallel: bool = False):
    """ONE outer iteration of the colored-carrier mean-field loop:
    f-moments at the current sites → exact q(c) chain sweep → one damped
    parallel-EP f-site update. ``sites`` is the ``(lam1, lam2)`` pair; the
    return is the updated pair. Exposed as a standalone map so the EP-EM
    trainer (infer/pad_learn.py) can differentiate its FIXED POINT
    implicitly instead of back-propagating through a truncated sweep
    stack — see pad_learn._fixed_point."""
    lam1, lam2 = sites
    T = y.shape[0]
    ones = jnp.ones(T, bool)
    # --- f-moments at the current sites (empty sites → the f prior) ---
    r = 1.0 / jnp.maximum(lam2, lam2_floor)
    mask = lam2 > lam2_floor
    resf = sde_gp_smooth(theta_f, t, lam1 * r, mask, r, parallel=parallel)
    m, v = resf.mean, resf.var
    # --- q(c): exact conjugate chain sweep given the envelope moments ---
    Eg = jnp.exp(m + 0.5 * v)
    Eg2 = jnp.exp(2.0 * m + 2.0 * v)
    resc = sde_gp_smooth(theta_c, t, y * Eg / Eg2, ones, obs_var / Eg2,
                         parallel=parallel)
    mc, vc = resc.mean, resc.var

    # --- q(f): one damped parallel-EP sweep at the new q(c) ---
    raw_prec_cav = 1.0 / v - lam2
    cav_ok = raw_prec_cav > 1e-12
    prec_cav = jnp.maximum(raw_prec_cav, 1e-12)
    v_cav = 1.0 / prec_cav
    m_cav = (m / v - lam1) * v_cav

    def tilt(mcav, vcav, yk, mck, vck):
        return two_stage_tilt(
            lambda f: colored_pad_loglik(yk, f, mck, vck, obs_var),
            mcav, vcav, n=n_gh)

    m_t, v_t = jax.vmap(tilt)(m_cav, v_cav, y, mc, vc)
    # same derivative-safe floor as gppad_infer's sweep (see there)
    v_t = jnp.maximum(v_t, 1e-13)
    lam2_new = 1.0 / v_t - prec_cav
    lam1_new = m_t / v_t - m_cav * prec_cav
    # same 1e12 site-precision ceiling as gppad_infer (see there)
    ok = (cav_ok & jnp.isfinite(lam1_new) & jnp.isfinite(lam2_new)
          & (lam2_new > 0) & (lam2_new < 1e12))
    lam1_new = jnp.where(ok, lam1_new, lam1)
    lam2_new = jnp.where(ok, lam2_new, lam2)
    return ((1.0 - damping) * lam1 + damping * lam1_new,
            (1.0 - damping) * lam2 + damping * lam2_new)


@partial(jax.jit, static_argnames=("iters", "n_gh", "parallel"))
def gppad_colored_infer(
    theta_f,  # [σ², ℓ] of the Matérn-5/2 log-envelope GP
    theta_c,  # [σ², ℓ] of the Matérn-5/2 CARRIER GP (the PAD_2 extension)
    t,
    y,
    obs_var: float = 1e-3,  # σ_y² of the (small) observation noise
    iters: int = 40,
    damping: float = 0.5,
    n_gh: int = 61,
    lam2_floor: float = 1e-10,
    sites0=None,  # optional (lam1, lam2) f-site warm start — EP-EM re-runs
    parallel: bool = False,  # parallel-in-time chain sweeps (associative scan)
) -> ColoredPADState:
    """Colored-carrier GP-PAD (GPSSD_PAD_2-checkpoint.ipynb cells 3-8):
    y_t = c_t · exp(f_t) + σ_y·ε with BOTH the log-envelope f and the
    carrier c Matérn-5/2 GPs. Mean-field q(f-chain) ⊗ q(c-chain),
    alternating two O(T) passes per outer iteration:

    - q(c) FIRST (at the first iteration the f-sites are empty, so the
      envelope moments come from the f-PRIOR — starting with the f-update
      instead was measured to collapse the envelope: at q(c) mean 0 the
      f-message is pure −½E[c²]e^{2f}/σ_y², driving f → −∞):
      the exact VMP message E_q(f)[log N(y; c·g, σ_y²)] is Gaussian in c
      with precision E[g²]/σ_y² — ONE heteroscedastic Kalman/RTS sweep
      (:func:`sde_gp_smooth`) with pseudo-observations z = y·E[g]/E[g²],
      R = σ_y²/E[g²], where E[g] = e^{m+v/2}, E[g²] = e^{2m+2v}.
    - q(f): the parallel-EP site loop of :func:`gppad_infer` with the
      carrier-marginalized likelihood :func:`colored_pad_loglik`, tilted
      by the re-localized :func:`two_stage_tilt`.

    Measured on the notebook's workload shape (T=500, carrier ℓ=0.05,
    envelope ℓ=0.8): corr(f, truth) 0.86, corr(c, truth) 0.87,
    reconstruction E[c]·E[e^f] within 0.5 % relative RMSE of the clean
    signal — the residual decorrelation is the inherent slow-component
    trade between c and f, not an inference failure (the reconstruction
    shows the product is pinned).
    """
    t = jnp.asarray(t)
    y = jnp.asarray(y, t.dtype)
    T = y.shape[0]
    dt = t.dtype
    ones = jnp.ones(T, bool)

    def outer(carry, _):
        sites = colored_pad_sweep(theta_f, theta_c, t, y, carry,
                                  obs_var=obs_var, damping=damping,
                                  n_gh=n_gh, lam2_floor=lam2_floor,
                                  parallel=parallel)
        delta = jnp.max(jnp.abs(sites[1] - carry[1]))
        return sites, delta

    if sites0 is None:
        f_sites = (jnp.zeros(T, dt), jnp.zeros(T, dt))
    else:
        f_sites = (jnp.asarray(sites0[0], dt), jnp.asarray(sites0[1], dt))
    (lam1, lam2), deltas = jax.lax.scan(outer, f_sites, None, length=iters)
    r = 1.0 / jnp.maximum(lam2, lam2_floor)
    resf = sde_gp_smooth(theta_f, t, lam1 * r, lam2 > lam2_floor, r,
                         parallel=parallel)
    # final q(c) at the FINAL f moments (the loop's mc is one f-sweep stale)
    Eg = jnp.exp(resf.mean + 0.5 * resf.var)
    Eg2 = jnp.exp(2.0 * resf.mean + 2.0 * resf.var)
    resc = sde_gp_smooth(theta_c, t, y * Eg / Eg2, ones, obs_var / Eg2,
                         parallel=parallel)
    return ColoredPADState(
        f_mean=resf.mean, f_var=resf.var, c_mean=resc.mean, c_var=resc.var,
        envelope=Eg, site_delta=deltas, lam1=lam1, lam2=lam2)
