"""Ozaki int8-MXU f64 GEMM: correctness oracles vs numpy f64 matmul.

The scheme's partial products are exact in int32, so at 8 slices the only
deviation from the EXACT real product is the dropped s ≥ 8 tail (~2^-60
relative) — the result should match numpy's f64 matmul to its own rounding
(~K·ε₆₄ worst case, √K·ε₆₄ typical)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gaussianprocessnode_tpu.ops.ozaki import ozaki_matmul

rng = np.random.default_rng(7)


def _relerr(C, C_ref):
    return float(np.max(np.abs(C - C_ref)) / np.max(np.abs(C_ref)))


@pytest.mark.parametrize("shape", [(60, 40, 50), (128, 600, 64)])
def test_matches_numpy_f64(shape):
    m, k, n = shape
    A = jnp.asarray(rng.standard_normal((m, k)))
    B = jnp.asarray(rng.standard_normal((k, n)))
    C = np.asarray(ozaki_matmul(A, B))
    C_ref = np.asarray(A) @ np.asarray(B)
    assert _relerr(C, C_ref) < 1e-14


def test_wild_dynamic_range():
    """Row/col scaling must localize exponents: entries spanning 1e-12..1e12
    across rows/cols still come out f64-exact elementwise (this is exactly
    what a fixed global scaling would get catastrophically wrong)."""
    m = k = n = 48
    A = rng.standard_normal((m, k)) * (10.0 ** rng.uniform(-12, 12, (m, 1)))
    B = rng.standard_normal((k, n)) * (10.0 ** rng.uniform(-12, 12, (1, n)))
    C = np.asarray(ozaki_matmul(jnp.asarray(A), jnp.asarray(B)))
    C_ref = A @ B
    # elementwise relative (each element has its own scale here)
    rel = np.abs(C - C_ref) / np.maximum(np.abs(C_ref), 1e-300)
    assert float(np.max(rel)) < 1e-12


def test_spd_product_stays_symmetric_psd():
    """The Newton–Schulz use case: X·(ΛX) chains on an SPD Λ. The scheme is
    deterministic, so Λ@Λᵀ with Λ symmetric must come out symmetric to
    round-off and match numpy on an ill-conditioned SPD factor."""
    M = 96
    Q = rng.standard_normal((M, M))
    lam = 10.0 ** np.linspace(-6, 6, M)  # κ = 1e12, the kin40k regime
    S = (Q * lam) @ Q.T
    S = (S + S.T) / 2.0
    C = np.asarray(ozaki_matmul(jnp.asarray(S), jnp.asarray(S)))
    C_ref = S @ S
    assert _relerr(C, C_ref) < 1e-14
    np.testing.assert_allclose(C, C.T, rtol=1e-13)


def test_zero_rows_and_exact_integers():
    A = np.zeros((8, 8))
    A[2, 3] = 3.0
    A[5, :] = np.arange(8)
    B = np.eye(8)
    C = np.asarray(ozaki_matmul(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_array_equal(C, A)


def test_fewer_slices_degrade_gracefully():
    A = jnp.asarray(rng.standard_normal((64, 64)))
    B = jnp.asarray(rng.standard_normal((64, 64)))
    C_ref = np.asarray(A) @ np.asarray(B)
    e6 = _relerr(np.asarray(ozaki_matmul(A, B, n_slices=6)), C_ref)
    e4 = _relerr(np.asarray(ozaki_matmul(A, B, n_slices=4)), C_ref)
    assert e6 < 5e-11  # ~41-bit envelope (6·7 − 1 scaling bit)
    assert e4 < 5e-7   # ~27-bit envelope, still ≫ f32
    assert e6 < e4


def test_near_overflow_magnitudes():
    """absmax near the f64 exponent ceiling: 2^e itself would overflow a
    single lookup (review repro: full((2,8), 2**1022) @ eye came back 7.8e-3
    off after the clipped table silently wrapped the first int8 chunk); the
    two-half scaling must keep such rows exact."""
    A = np.full((2, 8), 2.0 ** 1022)
    A[1, 3] = -(2.0 ** 1021)
    B = np.eye(8)
    C = np.asarray(ozaki_matmul(jnp.asarray(A), jnp.asarray(B)))
    np.testing.assert_array_equal(C, A)
    # tiny-magnitude (subnormal-adjacent) rows stay exact too
    A2 = np.full((2, 8), 2.0 ** -1021)
    C2 = np.asarray(ozaki_matmul(jnp.asarray(A2), jnp.asarray(B)))
    np.testing.assert_array_equal(C2, A2)


def test_rejects_f32():
    with pytest.raises(TypeError):
        ozaki_matmul(jnp.zeros((4, 4), jnp.float32), jnp.zeros((4, 4), jnp.float32))
