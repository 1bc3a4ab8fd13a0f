"""f64-accurate GEMM on the int8 MXU via Ozaki-scheme mantissa splitting.

The kin40k trainer's measured hot op is the f64 Newton–Schulz refresh
(DEVIATIONS #6/#22): XLA's f64 matmul on this TPU is software emulation at
~1.06 TFLOP/s (bench ``ns_f64_tflops``), 186× below the chip's bf16 peak —
Mosaic has no f64 path either, so a Pallas kernel cannot beat it. What the
MXU DOES have is a fast integer path. The Ozaki scheme (Ozaki et al. 2012;
int8 variant a la ozIMMU, Ootomo et al. 2024) reconstructs an f64 GEMM from
error-free int8×int8→int32 products:

    A = diag(2^eA) · Σ_t At · 2^-7(t+1)   (row-wise power-of-2 scaling,
                                            At int8-valued, |At| ≤ 64)
    A@B = diag(2^eA) · [ Σ_{t+u=s} At@Bu · 2^-7(s+2) ] · diag(2^eB)

Each partial product At@Bu is EXACT in int32 (|sum| ≤ 64·64·K < 2³¹ for
K < 5·10⁵), so with t+u < n_slices the only error is the dropped tail
s ≥ n_slices: relative ~2^-7·n_slices · K-fold smaller than the leading
term — at 8 slices (56 ≥ 53 mantissa bits, the split is exact) the result
is MORE accurate than a rounding f64 BLAS accumulation.

Matmul count: n_slices(n_slices+1)/2 pairs, grouped by s into n_slices
K-concatenated int8 GEMMs (one MXU dispatch per diagonal group, operand
shapes (m, (s+1)K)×((s+1)K, n)). At 8 slices that is 36 unit passes.

MEASURED RESULT (TPU v5e, round 3 — benchmarks/ozaki_probe_r3.json): the
scheme is correct (oracle tests below) but LOSES to XLA's f64 software
emulation on this backend, so it is NOT wired into the trainers:

- eager per-op timings flatter it (600³: 1.43 vs 1.94 ms; 600×10000 SYRK:
  4.9 vs 8.4 ms) — but those are tunnel-dispatch-dominated;
- in-program, where dispatch amortizes, a jitted 28-iteration Newton–Schulz
  chain runs 19.9 ms with XLA f64 matmuls vs 36.3 ms with Ozaki matmuls
  (1.8× SLOWER), and the K-blocked SYRK is 9.6 vs 8.3 ms;
- this backend's int8×int8→int32 dot is NOT exact integer arithmetic: with
  7-bit chunks (products ≤ 2^12) a K=10000 product shows 3.7e-4 relative
  error unblocked and 9.7e-6 even with K-blocking that provably keeps every
  f32-accumulated prefix ≤ 2^24 — consistent with the MXU multiplying
  through a ~bf16 (8-bit-mantissa) path, which rounds the 12-bit chunk
  products themselves. Exactness would force 4-bit chunks → 14 slices →
  105 unit passes, ~3× more MXU work on top of already losing at 36.

Together with DEVIATIONS #6/#22 this closes the f64-GEMM question on this
hardware: XLA's double-double emulation (~1.06 TFLOP/s, bench
``ns_f64_tflops``) IS the practical ceiling; the module stays as the
tested, reproducible experiment behind that claim (CPU int8 dots are true
integer ops, so the oracle tests pin the scheme itself as correct).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as _np

__all__ = ["ozaki_matmul", "OZAKI_SLICES"]

# 8 slices × 7 bits = 56 ≥ 53 mantissa bits: the split captures the f64
# mantissa exactly; dropped cross terms are ≤ 2^-63 relative.
OZAKI_SLICES = 8
_BITS = 7
# exact powers of two 2^-1022 .. 2^1022 (python floats, so bit-exact)
_EMAX = 1022
_POW2_TABLE = _np.asarray([2.0 ** i for i in range(-_EMAX, _EMAX + 1)])


def _split_int8(X, n_slices, axis):
    """Row-/column-scale X to [1/4, 1/2) and peel n_slices 7-bit mantissa
    chunks. Returns (chunks int8 (n_slices, m, k), scale halves (s1, s2)
    with s1·s2 = 2^e, each (m, 1) or (1, k) f64)."""
    absmax = jnp.max(jnp.abs(X), axis=axis, keepdims=True)
    # floor(log2)+2 puts |X̂| in [1/4, 1/2), so every peeled chunk satisfies
    # |q| ≤ 64 and fits int8 (with +1 the first chunk of a near-power-of-2
    # maximum rounds to 128 and WRAPS).
    e = jnp.where(absmax > 0.0, jnp.floor(jnp.log2(absmax)) + 2.0, 0.0)
    # exact 2^e via a host-built table: exp2 may be rewritten exp(x·ln2)
    # (observed an ulp off, e.g. 7.999999999999998), and ldexp bitcasts
    # through s64, which this TPU backend's x64-rewrite pass rejects. A
    # gather from exact python-float constants has neither problem. The
    # scale is applied in TWO power-of-2 halves so e up to 1025 (absmax near
    # f64 max, where 2^e itself would overflow) still divides exactly —
    # a single clipped lookup was measured to silently wrap the first int8
    # chunk at absmax ≥ 2^1021 (7.8e-3 relative error).
    e1 = jnp.floor(e / 2.0)
    table = jnp.asarray(_POW2_TABLE, X.dtype)
    s1 = jnp.take(table, e1.astype(jnp.int32) + _EMAX)
    s2 = jnp.take(table, (e - e1).astype(jnp.int32) + _EMAX)
    # |r| < 1/2, exact (power-of-2 divisors). The barrier is load-bearing:
    # under --xla_allow_excess_precision XLA fuses the divide chain into
    # X·1/(s1·s2), and 1/(s1·s2) over/underflows exactly in the extreme-
    # exponent cases the two-half scaling exists for (observed: all-zero
    # output at absmax = 2^1022 under jit, correct eagerly).
    r = jax.lax.optimization_barrier(X / s1) / s2
    chunks = []
    for _ in range(n_slices):
        r = r * (2.0 ** _BITS)
        q = jnp.round(r)  # |q| ≤ 64 — int8-safe
        chunks.append(q.astype(jnp.int8))
        r = r - q  # |r| ≤ 1/2, exact (no bits lost below 2^-53·scale)
    return jnp.stack(chunks), (s1, s2)


@partial(jax.jit, static_argnames=("n_slices",))
def ozaki_matmul(A, B, n_slices: int = OZAKI_SLICES):
    """A @ B for f64 A (m,k), B (k,n) via error-free int8 MXU products.

    n_slices=8 reproduces f64 to ≤ ~2^-60 relative of the exact product
    (better than a rounding f64 accumulation); 6 slices ≈ 2^-49 relative
    (still far beyond f32) at 21/36 the MXU work.
    """
    if A.dtype != jnp.float64 or B.dtype != jnp.float64:
        raise TypeError("ozaki_matmul is the f64 path; cast inputs to f64")
    Ac, (sA1, sA2) = _split_int8(A, n_slices, axis=1)  # (S, m, k), 2×(m, 1)
    Bc, (sB1, sB2) = _split_int8(B, n_slices, axis=0)  # (S, k, n), 2×(1, n)
    # group by s = t+u: one K-concatenated int8 GEMM per diagonal group
    # Σ_{t+u=s} At@Bu = [A0 | ... | As] @ [Bs ; ... ; B0]
    m, k = A.shape
    n = B.shape[1]
    out = jnp.zeros((m, n), jnp.float64)
    for s in range(n_slices):
        Acat = jnp.moveaxis(Ac[: s + 1], 0, 1).reshape(m, (s + 1) * k)
        Bcat = Bc[s::-1].reshape((s + 1) * k, n)
        P = jnp.matmul(Acat, Bcat, preferred_element_type=jnp.int32)
        out = out + P.astype(jnp.float64) * (2.0 ** (-_BITS * (s + 2)))
    # scale halves applied interleaved so intermediates track ~sqrt of the
    # total rescaling (a single sA·sB product could itself overflow); the
    # barrier again stops XLA regrouping the chain into that product
    return jax.lax.optimization_barrier(out * sA1 * sB1) * sA2 * sB2
