"""Probe which Pallas/Mosaic constructs compile on this TPU backend.

Runs a ladder of minimal kernels (elementwise uint32, mont_mul, f32 dot,
int8 dot, in-kernel transpose/reshape, multi-stage butterfly) and prints
pass/fail per rung — isolates what the remote Mosaic compiler rejects
so kernel work targets supported constructs.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl


def log(m):
    print(m, file=sys.stderr, flush=True)


def probe(name, fn):
    try:
        out = jax.jit(fn)()
        jax.block_until_ready(out)
        log(f"PASS {name}")
        return True
    except Exception as e:
        log(f"FAIL {name}: {type(e).__name__}: {str(e)[:160]}")
        return False


def main():
    log(f"devices: {jax.devices()}")
    x32 = jnp.asarray(np.arange(8 * 8192, dtype=np.uint32).reshape(8, 8192))
    xf = jnp.asarray(np.random.rand(128, 128).astype(np.float32))
    x8 = jnp.asarray((np.arange(128 * 128) % 100).astype(np.int8)
                     .reshape(128, 128))

    # 1. elementwise uint32
    def k1(x_ref, o_ref):
        o_ref[...] = x_ref[...] * jnp.uint32(3) + jnp.uint32(1)
    probe("u32 elementwise", lambda: pl.pallas_call(
        k1, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.uint32))(x32))

    # 2. mont_mul-style: mul-hi via 16-bit split
    def k2(x_ref, o_ref):
        a = x_ref[...]
        a0, a1 = a & jnp.uint32(0xFFFF), a >> jnp.uint32(16)
        t = a1 * a0 + ((a0 * a0) >> jnp.uint32(16))
        o_ref[...] = a1 * a1 + (t >> jnp.uint32(16))
    probe("u32 mul-hi", lambda: pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.uint32))(x32))

    # 3. where/compare on uint32
    def k3(x_ref, o_ref):
        a = x_ref[...]
        o_ref[...] = jnp.where(a >= jnp.uint32(7), a - jnp.uint32(7), a)
    probe("u32 where", lambda: pl.pallas_call(
        k3, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.uint32))(x32))

    # 4. f32 dot
    def k4(a_ref, o_ref):
        o_ref[...] = lax.dot_general(
            a_ref[...], a_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST)
    probe("f32 dot 128x128", lambda: pl.pallas_call(
        k4, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(xf))

    # 5. int8 dot -> int32
    def k5(a_ref, o_ref):
        o_ref[...] = lax.dot_general(
            a_ref[...], a_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    probe("s8 dot 128x128", lambda: pl.pallas_call(
        k5, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32))(x8))

    # 6. uint32 -> int32 -> f32 cast chain
    def k6(x_ref, o_ref):
        o_ref[...] = (x_ref[...] & jnp.uint32(0x7F)).astype(jnp.int32).astype(
            jnp.float32)
    probe("u32->s32->f32 cast", lambda: pl.pallas_call(
        k6, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.float32))(x32))

    # 7. in-kernel 2-D transpose
    def k7(a_ref, o_ref):
        o_ref[...] = a_ref[...].T
    probe("f32 transpose 128x128", lambda: pl.pallas_call(
        k7, out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32))(xf))

    def k7b(x_ref, o_ref):
        o_ref[...] = x_ref[...].reshape(8, 64, 128).swapaxes(0, 1).reshape(
            64, 1024)
    probe("u32 reshape+swap", lambda: pl.pallas_call(
        k7b, out_shape=jax.ShapeDtypeStruct((64, 1024), jnp.uint32))(x32))

    # 8. butterfly stage pattern (split + concat on lane axis)
    def k8(x_ref, o_ref):
        v = x_ref[...]
        for s in range(3):
            half = v.shape[-1] // 2
            lo, hi = v[..., :half], v[..., half:]
            u = lo + hi
            w = (lo - hi) * jnp.uint32(3)
            v = jnp.concatenate([u, w], axis=-1)
        o_ref[...] = v
    probe("u32 butterfly x3 (concat)", lambda: pl.pallas_call(
        k8, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.uint32))(x32))

    # 9. butterfly via stack+reshape (the core/ntt.py pattern)
    def k9(x_ref, o_ref):
        v = x_ref[...].reshape(8, 1, 8192)
        for s in range(3):
            half = v.shape[-1] // 2
            lo, hi = v[..., :half], v[..., half:]
            u = lo + hi
            w = (lo - hi) * jnp.uint32(3)
            v = jnp.stack([u, w], axis=-2).reshape(8, 2 << s, half)
        o_ref[...] = v.reshape(8, 8192)
    probe("u32 butterfly x3 (stack)", lambda: pl.pallas_call(
        k9, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.uint32))(x32))

    # 10. grid + rank-3 blocks (the fourstep_pallas layout)
    def k10(x_ref, o_ref):
        o_ref[0] = x_ref[0] * jnp.uint32(5)
    probe("grid rank-3 blocks", lambda: pl.pallas_call(
        k10, grid=(4,),
        in_specs=[pl.BlockSpec((1, 8, 2048), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, 2048), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((4, 8, 2048), jnp.uint32))(
            x32.reshape(4, 8, 2048)))


if __name__ == "__main__":
    main()


def probe_roll():
    import numpy as np
    import jax, jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    x32 = jnp.asarray(np.arange(8 * 8192, dtype=np.uint32).reshape(8, 8192))

    def k(x_ref, o_ref):
        v = x_ref[...].reshape(8, 64, 128)
        vx = pltpu.roll(v, 32, 2)
        i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
        hi = (i & 32) != 0
        o_ref[...] = jnp.where(hi, vx + v, vx - v).reshape(8, 8192)
    probe("pltpu.roll lane + iota mask", lambda: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.uint32))(x32))

    def k2(x_ref, o_ref):
        v = x_ref[...].reshape(8, 64, 128)
        out = v
        for h in (64, 32, 16, 8, 4, 2, 1):
            vr = pltpu.roll(out, h, 2)
            vl = pltpu.roll(out, 128 - h, 2)
            i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 128), 2)
            hi = (i & h) != 0
            vx = jnp.where(hi, vr, vl)
            out = jnp.where(hi, vx - out, vx + out)
        o_ref[...] = out.reshape(8, 8192)
    probe("7x roll-butterfly chain", lambda: pl.pallas_call(
        k2, out_shape=jax.ShapeDtypeStruct((8, 8192), jnp.uint32))(x32))


if __name__ == "__main__":
    probe_roll()
