"""Multi-chip scaling report: sharded-BSGS matvec throughput at
1/2/4/8 devices (VERDICT r1 item 5c).

On this host the devices are VIRTUAL (8 XLA host-platform devices over 4
shared vCPUs), so absolute numbers measure the sharding machinery's
overhead — collective cost, shard_map partitioning — NOT real ICI
scaling: virtual devices share the same silicon, so ideal scaling shows
up as FLAT wall time with rising aggregate ops/s only in the per-device
accounting.  The table's purpose is (a) the methodology of record for a
real pod slice and (b) a regression guard on collective overhead.

Writes one JSON line per device count; run with
    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu
(handled in-process below).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import Mesh
    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.parallel.sharded_bsgs import ShardedBsgsMatvec

    d = int(os.environ.get("SCALE_D", "256"))
    n = int(os.environ.get("SCALE_N", "2048"))
    reps = int(os.environ.get("SCALE_REPS", "5"))
    ctx = CkksContext(CkksParams(n=n, num_limbs=3, num_special=1), seed=0)
    rng = np.random.default_rng(0)
    w = rng.normal(0, 0.3, (d, d))
    x = rng.normal(0, 1, d)

    rows = []
    for ndev in (1, 2, 4, 8):
        devs = np.array(jax.devices()[:ndev])
        mesh = Mesh(devs, ("giant",))
        eng = ShardedBsgsMatvec(ctx, d, mesh)
        enc = eng.encode(w)
        pt = eng.load(enc, ctx.L)
        ct = ctx.encrypt_replicated(x)
        y = eng(ct, pt)                       # compile + warm
        got = ctx.decrypt_vec(y, d)
        err = float(np.abs(got - w @ x).max())
        t0 = time.perf_counter()
        for _ in range(reps):
            y = eng(ct, pt)
        jax.block_until_ready(y.c)
        dt = (time.perf_counter() - t0) / reps
        rot = eng.G - 1 + eng.B               # rotations per call
        row = {"devices": ndev, "matvec_ms": round(dt * 1000, 2),
               "rotations_per_s": round(rot / dt, 1),
               "per_device_giants": eng.B // ndev, "max_err": err}
        rows.append(row)
        print(json.dumps(row), flush=True)

    base = rows[0]["matvec_ms"]
    print(json.dumps({
        "metric": f"sharded BSGS matvec scaling D={d} N={n} "
                  "(virtual CPU devices — methodology run)",
        "value": rows[-1]["matvec_ms"],
        "unit": "ms @ 8 devices",
        "vs_baseline": round(base / rows[-1]["matvec_ms"], 3),
        "detail": {"rows": rows},
    }))


if __name__ == "__main__":
    main()
