"""NTT kernel shoot-out on the real TPU: Stockham (VPU butterfly chain)
vs four-step MXU (int8-limb systolic contraction, DESIGN §9/§12).

Measures forward transforms of a [R, N] residue batch (R = limbs of a
production keyswitch digit extension) and verifies the MXU path bitwise
against the Stockham chain.  Prints one JSON line.

Env: NTT_N (8192), NTT_ROWS (41), NTT_REPS (20), NTT_N1 (128).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("NTT_N", "8192"))
    rows_n = int(os.environ.get("NTT_ROWS", "41"))
    reps = int(os.environ.get("NTT_REPS", "20"))
    n1 = int(os.environ.get("NTT_N1", "128"))

    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.core.primes import find_ntt_primes
    from fhe_spear_tpu.core.ntt import NttContext, bitrev_indices
    from fhe_spear_tpu.parallel.ntt_fourstep import FourStepNtt

    primes = find_ntt_primes(n, rows_n)
    ntt = NttContext.build(n, primes)
    fs = FourStepNtt(ntt, n1, n // n1)
    rows = tuple(range(rows_n))

    rng = np.random.default_rng(0)
    q = np.array([p.p for p in primes], dtype=np.uint64)
    x = jnp.asarray(rng.integers(0, q[:, None], (rows_n, n)
                                 ).astype(np.uint32))

    j_stock = jax.jit(lambda v: ntt.ntt(v, rows))
    j_mxu = jax.jit(lambda v: fs.ntt_mxu(v, rows))

    # correctness: bitwise after the bitrev bin permutation
    want = np.asarray(j_stock(x))
    got = np.asarray(j_mxu(x))[..., bitrev_indices(n)]
    assert np.array_equal(got, want), "MXU four-step mismatch"
    log("bitwise-equal on TPU")

    def bench(f, arg=None):
        """Kernel time per transform: `reps` transforms CHAINED inside ONE
        jit (NTT output is a valid input — uint32 residues < p), so the
        axon tunnel's per-dispatch latency (~1-4 ms) divides across reps
        instead of flooring every sample."""
        from jax import lax

        a = x if arg is None else arg
        chain = jax.jit(lambda v: lax.fori_loop(0, reps, lambda i, u: f(u),
                                                v))
        jax.block_until_ready(chain(a))
        t0 = time.perf_counter()
        for _ in range(3):
            y = chain(a)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / (3 * reps)

    t_stock = bench(j_stock)
    t_mxu = bench(j_mxu)
    log(f"stockham {t_stock*1e3:.3f} ms  mxu {t_mxu*1e3:.3f} ms")

    # Pallas fused Stockham (all butterfly stages in VMEM, bitrev order —
    # bitwise-equal to the jnp chain directly)
    pallas_ms = {}
    from fhe_spear_tpu.core.ntt_pallas import ntt_pallas

    try:
        j_ps = jax.jit(lambda v: ntt_pallas(ntt, v))
        got_s = np.asarray(j_ps(x[:, None, :]))[:, 0, :]
        assert np.array_equal(got_s, want), "pallas stockham mismatch"
        t_ps = bench(lambda v: j_ps(v), arg=x[:, None, :])
        pallas_ms["stockham_fused"] = round(t_ps * 1e3, 4)
        log(f"pallas[stockham_fused] {t_ps*1e3:.3f} ms (bitwise-equal)")
    except Exception as e:
        pallas_ms["stockham_fused"] = (
            f"unavailable: {type(e).__name__}: {e}"[:200])
        log(f"pallas[stockham_fused] failed: {e}")

    # Pallas fused four-step (twist+DFTs+twiddle in VMEM) — optional:
    # report per dot_impl if Mosaic compiles it on this backend.
    # NTT_BSZ batches the pallas transforms per limb row ([R, B, N]) and
    # measures the Stockham chain on the same [B, R, N] workload — the
    # production kernels transform G*chunk-row batches, so batched is the
    # representative comparison; times are reported per [R, N] batch.
    from fhe_spear_tpu.core.fourstep_pallas import ntt_fourstep_pallas

    bsz = int(os.environ.get("NTT_BSZ", "1"))
    if bsz > 1:
        xs_b = jnp.tile(x[None], (bsz, 1, 1))           # [B, R, N]
        j_stock_b = jax.jit(lambda v: ntt.ntt(v, rows))
        t_stock_b = bench(j_stock_b, arg=xs_b) / bsz
        log(f"stockham batched[{bsz}] {t_stock_b*1e3:.3f} ms per [R,N]")
    else:
        t_stock_b = t_stock
    xb = jnp.tile(x[:, None, :], (1, bsz, 1))           # [R, B, N]
    for impl in ("f32", "int8"):
        for variant in ("3d", "2d", "2dio"):
            key = impl if variant == "3d" else f"{impl}_{variant}"
            try:
                j_pal = jax.jit(
                    lambda v, _i=impl, _v=variant: ntt_fourstep_pallas(
                        fs, v, rows=rows, dot_impl=_i, variant=_v))
                got_p = np.asarray(j_pal(xb))[:, 0, :]
                # pallas kernel emits natural four-step bin order (same as
                # ntt_mxu); compare via the same bitrev permutation
                assert np.array_equal(got_p[..., bitrev_indices(n)], want), (
                    f"pallas {key} mismatch")
                t_pal = bench(lambda v: j_pal(v), arg=xb) / bsz
                pallas_ms[key] = round(t_pal * 1e3, 4)
                log(f"pallas[{key}] {t_pal*1e3:.3f} ms per [R,N] "
                    f"(bitwise-equal, bsz={bsz})")
            except Exception as e:  # Mosaic/backend-specific: report
                pallas_ms[key] = f"unavailable: {type(e).__name__}: {e}"[:200]
                log(f"pallas[{key}] failed: {e}")

    print(json.dumps({
        "metric": f"NTT [R={rows_n}, N={n}] forward transform (TPU)",
        "value": round(t_mxu * 1e3, 4),
        "unit": "ms (four-step MXU)",
        "vs_baseline": round(t_stock / t_mxu, 3),
        "detail": {"stockham_ms": round(t_stock * 1e3, 4),
                   "stockham_batched_ms": round(t_stock_b * 1e3, 4),
                   "mxu_ms": round(t_mxu * 1e3, 4),
                   "pallas_ms": pallas_ms,
                   "bsz": bsz,
                   "n1": n1, "bitwise_equal": True},
    }))


if __name__ == "__main__":
    main()
