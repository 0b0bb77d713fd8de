"""Per-phase device profile of one client-aided server block (VERDICT r1:
prove where block time goes — kernel compute vs dispatch).

Times each protocol phase of a block in isolation (jitted, steady-state,
block_until_ready) and compares their sum to the wall time of a full
fused block step.  The difference is dispatch/transport overhead; with
the device-client pipeline that overhead collapses to one dispatch.

Also emits a jax.profiler trace (PROFILE_DIR, default /tmp/fhe_profile)
for op-level inspection.

Env: PROF_D (2048), PROF_F (8192), PROF_N (8192), PROF_REPS (10),
PROF_BACKEND (stockham|mxu).
"""

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    d = int(os.environ.get("PROF_D", "2048"))
    f = int(os.environ.get("PROF_F", "8192"))
    n = int(os.environ.get("PROF_N", "8192"))
    reps = int(os.environ.get("PROF_REPS", "10"))
    backend = os.environ.get("PROF_BACKEND", "stockham")
    trace_dir = os.environ.get("PROFILE_DIR", "/tmp/fhe_profile")

    import jax

    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.ops.bsgs import BsgsMatvec

    t0 = time.perf_counter()
    ctx = CkksContext(CkksParams(n=n, num_limbs=3, num_special=1,
                                 ntt_backend=backend), seed=0)
    log(f"context ({time.perf_counter() - t0:.1f}s)")
    eng = BsgsMatvec(ctx, d)
    rng = np.random.default_rng(0)

    level = ctx.L
    x = rng.normal(0, 1, d)
    ct = ctx.encrypt_replicated(x)
    w = rng.normal(0, 0.3, (d, d))
    pt = eng.load(eng.encode(w), level)

    import jax.numpy as jnp
    from jax import lax

    def timeit(make_body, x0, *extras):
        """Honest per-call device time: `reps` calls chained inside ONE
        jitted fori_loop, each iteration's input perturbed by the loop
        index (a loop-invariant body would be hoisted by XLA, and repeated
        identical async dispatches can be coalesced by the tunnel).
        make_body(x, *extras) must return an array; x0 is uint32.  Large
        operands go in `extras` — runtime args, never closure constants."""
        def chain_fn(v, *ex):
            def step(i, carry):
                xi = carry.at[(0,) * carry.ndim].set(
                    i.astype(jnp.uint32) % 3)
                y = make_body(xi, *ex)
                # fold one word of the result back into the carry: a real
                # data dependence from iteration i to i+1
                return carry.at[(0,) * carry.ndim].set(
                    y.reshape(-1)[0].astype(jnp.uint32) % 3)
            return lax.fori_loop(0, reps, step, v)

        chain = jax.jit(chain_fn)
        jax.block_until_ready(chain(x0, *extras))
        t0 = time.perf_counter()
        for _ in range(3):
            y = chain(x0, *extras)
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / (3 * reps)

    phases = {}

    # 1. full BSGS matvec (keyswitch-heavy; the server projection kernel)
    kern_raw = eng._kernel_raw(level)
    xs = eng._xs(level)
    phases["bsgs_matvec"] = timeit(
        lambda c, pt_, *xs_: kern_raw(c, pt_, *xs_), ct.c, pt, *xs)

    # 1b. same kernel with i32-staged diagonals (in-kernel RNS expansion —
    # the production device-client / deep-chain configuration)
    kern_i32 = eng._kernel_raw(level, i32=True)
    pt_i32 = jax.jit(lambda a: a)(jnp.asarray(eng.encode(w).coeffs))
    phases["bsgs_matvec_i32"] = timeit(
        lambda c, pt_, *xs_: kern_i32(c, pt_, *xs_), ct.c, pt_i32, *xs)

    # 2. hoisted digit decomposition alone
    phases["decompose"] = timeit(lambda c: ctx._decompose(c[1], level), ct.c)

    # 3. one keyswitch apply + mod-down
    D = jax.jit(lambda c: ctx._decompose(c[1], level))(ct.c)
    g = ctx.galois_element(1)
    kb, ka = ctx.select_key(ctx.galois_keys[g], level)
    phases["keyswitch_apply"] = timeit(
        lambda D_, kb_, ka_: ctx._mod_down(
            ctx._apply_ksk(D_, kb_, ka_, level), level), D, kb, ka)

    # 4. forward+inverse NTT of a ciphertext-sized tensor
    rows = tuple(range(level))
    phases["ntt_roundtrip"] = timeit(
        lambda v: ctx.ntt.ntt(ctx.ntt.intt(v, rows), rows), ct.c[0])

    # 5. encrypt + decrypt (client boundary ops; host encode included, so
    # these are dispatch+host-bound — NOT the device-client path, which
    # encrypts/decrypts inside the fused token kernel)
    m = rng.normal(0, 1, ctx.slots)

    def timeit_host(fn):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            y = fn()
        jax.block_until_ready(y)
        return (time.perf_counter() - t0) / reps

    phases["encrypt_host"] = timeit_host(lambda: ctx.encrypt(m).c)
    phases["decrypt_host"] = timeit_host(lambda: ctx.decrypt_vec(ct))

    kern = eng._kernel(level)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            y = kern(ct.c, pt)
        jax.block_until_ready(y)
    log(f"trace written to {trace_dir}")

    total = phases["bsgs_matvec"]
    print(json.dumps({
        "metric": f"BSGS server projection D={d} N={n} ({backend} NTT)",
        "value": round(total * 1e3, 3),
        "unit": "ms",
        "vs_baseline": None,
        "detail": {k: round(v * 1e3, 3) for k, v in phases.items()},
    }))


if __name__ == "__main__":
    main()
