"""BSGS diagonal-method matvec under CKKS — the framework's hot kernel.

Re-designs the reference's BSGS engine (SURVEY.md C6/C7/C8;
/root/reference/scripts/bootstrap_generation.py:29-659) TPU-first:

  * Baby rotations are hoisted (one digit decomposition) and evaluated by a
    lax.scan over a stacked [G-1, ...] tensor of rotation keys and
    automorphism permutations — one compiled body, G-1 iterations.
  * The G x B multiply-accumulate (the reference's fused CUDA
    `bsgs_multiply_accumulate`) is a scan over giant groups; each step is a
    batched Montgomery multiply [G, 2, l, N] + modular tree-reduction —
    pure VPU work that XLA fuses, with the giant rotation keyswitch in the
    same scan body.
  * Diagonals are pre-encoded on the host to *coefficient-domain int32*
    (4x smaller than RNS residues) and expanded to NTT/Montgomery residues
    on device at block-load time — the TPU analog of the reference's
    CPU-offloaded plaintext staging (`offload_plaintexts`/`bsgs_from_cpu`,
    scripts/bootstrap_generation.py:336-357,449).
  * Exactly one rescale at the end: 1 level per call, like the reference
    (paper/main.tex:1049).

Complex packing comes for free: a complex weight matrix W1 + i*W2 encodes
into complex diagonals and one call evaluates both matrices
(fhe_matmul_bsgs_complex, scripts/bootstrap_generation.py:488-542).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from ..core.modops import mont_mul, add_mod, barrett_reduce, sub_mod
from ..core.ntt import automorphism_perm
from ..ckks.context import CkksContext, _sel
from ..ckks.ciphertext import Ciphertext

__all__ = ["bsgs_dims", "BsgsMatvec", "DiagonalMatvec", "EncodedDiagonals",
           "extract_diagonals"]


def _split_i64(coeffs: np.ndarray) -> np.ndarray:
    """int64 [..., N] -> int32 planes [..., 2, N] with value =
    hi*2^31 + lo, lo in [0, 2^31) (two's-complement exact for negatives)."""
    lo = (coeffs & np.int64(0x7FFFFFFF)).astype(np.int32)
    hi = (coeffs >> np.int64(31)).astype(np.int32)
    return np.stack([lo, hi], axis=-2)


def bsgs_dims(d: int) -> tuple[int, int]:
    """(G, B): G = ceil(sqrt(D)) baby steps, B = ceil(D/G) giant groups
    (scripts/bootstrap_generation.py:29-32)."""
    g = math.isqrt(d)
    if g * g < d:
        g += 1
    return g, (d + g - 1) // g


def extract_diagonals(w: np.ndarray, d: int | None = None) -> np.ndarray:
    """delta_k[j] = W[j, (j+k) % D] for k = 0..G*B-1 (zero-padded past D),
    pre-rotated left by -(g*G) within each giant group: [B, G, D]."""
    w = np.asarray(w)
    d = w.shape[0] if d is None else d
    assert w.shape == (d, d), w.shape
    G, B = bsgs_dims(d)
    j = np.arange(d)
    k = np.arange(G * B)
    diags = np.where((k < d)[:, None], w[j[None, :], (j[None, :] + k[:, None]) % d],
                     0.0 if not np.iscomplexobj(w) else 0.0 + 0.0j)
    diags = diags.reshape(B, G, d)
    # pre-rotate group g by +g*G (so the giant rotation can happen after the
    # baby-step accumulation): rot_{-gG}(delta) = np.roll(delta, +gG)
    for g in range(1, B):
        diags[g] = np.roll(diags[g], g * G, axis=-1)
    return diags


@dataclass
class EncodedDiagonals:
    """Host-staged pre-encoded diagonal plaintexts for one BSGS matrix.

    coeffs: int32 [B, G, N] coefficient-domain encodings (signed, centered).
    Stays in host RAM until `BsgsMatvec.load` stages it to the device.
    """

    coeffs: np.ndarray
    scale: float
    d: int

    @property
    def nbytes(self) -> int:
        return self.coeffs.nbytes


class BsgsMatvec:
    """BSGS matvec engine for a fixed (context, D, level) configuration.

    Usage:
        eng = BsgsMatvec(ctx, d=1024)
        enc = eng.encode(W)              # host: [B, G, N] int32
        pt  = eng.load(enc, level)       # device: [B, G, l, N] NTT/Mont
        y   = eng(ct_x, pt)              # level l -> l-1, slots = W @ x
    """

    def __init__(self, ctx: CkksContext, d: int, key_sharding=None,
                 full_key_stacks: bool | None = None):
        """key_sharding: optional NamedSharding partitioning the limb axis
        of the stacked rotation-key tensors (axis 2 of [S, d_l, T, N]) —
        the RNS-limb scale-out axis; see CkksContext.shard_eval_keys.
        With it, each level's key stack divides across the mesh and the
        jitted kernels are SPMD-partitioned by XLA (bitwise-identical
        results).

        full_key_stacks: stack the FULL [S, dnum, L+K, N] key tensors ONCE
        (level-independent) and select the level's digits/targets INSIDE
        the jitted kernel, instead of gathering a selected stack per
        level.  A deep chain walks ~40 distinct levels and each per-level
        gather costs ~9-23 s through the tunnel (2 per block — measured
        ~27 s of the 33 s/block fe19 pass-2 time, docs/NOTES_r4.md);
        the full stack makes that a one-time cost.  At the deepest level
        the selected stack is the same size as the full one, so resident
        memory is unchanged for the deepest-level engine — but an engine
        used at ONE shallow level (bootstrap stage matvecs, the L=3 token
        paths) would pin (L+K)/T more than its selected slice, so the
        class default is OFF (ADVICE r4 #5); the deep-chain runtime
        (FullyEncryptedFfn) opts in explicitly.  Env FHE_FULL_KEY_STACKS
        (0/1) overrides the default when the argument is None;
        key_sharding implies it."""
        import os

        assert ctx.slots % d == 0, (d, ctx.slots)
        self.ctx = ctx
        self.d = d
        self.G, self.B = bsgs_dims(d)
        self.baby_steps = tuple(range(1, self.G))
        self.giant_steps = tuple(g * self.G for g in range(1, self.B))
        self.key_sharding = key_sharding
        if full_key_stacks is None:
            full_key_stacks = os.environ.get("FHE_FULL_KEY_STACKS",
                                             "0") == "1"
        self.full_key_stacks = bool(full_key_stacks) or (
            key_sharding is not None)
        ctx.ensure_galois(self.baby_steps + self.giant_steps)
        self._xs_cache: dict = {}

    def galois_elements(self) -> set:
        """Galois elements of this engine's rotation steps (for
        CkksContext.drop_galois_keys after warm_stacks)."""
        return {self.ctx.galois_element(s)
                for s in self.baby_steps + self.giant_steps}

    def warm_stacks(self, levels=("full",)) -> set:
        """Build (and materialize) the stacked key tensors now, so the
        raw per-element keys can be dropped (drop_galois_keys) before the
        memory-peak phase of a deep run.  With full_key_stacks the single
        "full" stack covers every level.  Returns galois_elements()."""
        for l in levels:
            self._xs("full" if self.full_key_stacks else l)
        return self.galois_elements()

    # -- host-side diagonal pre-encoding (reference pre_encode_block) ------

    def encode(self, w: np.ndarray, scale: float | None = None
               ) -> EncodedDiagonals:
        ctx = self.ctx
        scale = ctx.scale if scale is None else scale
        diags = extract_diagonals(w, self.d)                    # [B, G, D]
        tiled = np.tile(diags, (1, 1, ctx.slots // self.d))     # [B, G, slots]
        coeffs = _encode_slot_array(ctx, tiled, scale)
        return EncodedDiagonals(coeffs, scale, self.d)

    def encode_wide(self, w: np.ndarray, scale: float) -> EncodedDiagonals:
        """Composite-scale (width-2, scale ~ 2^56) diagonal pre-encode:
        int64 coefficients split into two int32 planes [B, G, 2, N]
        (value = hi*2^31 + lo; see rns_expand_wide).  The encode rounding
        error drops from 2^-28 to ~2^-53 relative — the precision source
        of the width-2 fully-encrypted chain (VERDICT r4 #4)."""
        ctx = self.ctx
        diags = extract_diagonals(w, self.d)
        tiled = np.tile(diags, (1, 1, ctx.slots // self.d))
        coeffs = np.round(ctx.encoder.embed(tiled) * scale).astype(np.int64)
        limit = np.abs(coeffs).max(initial=0)
        assert limit < (1 << 62), (
            f"wide-encoded coefficient magnitude {limit} >= 2^62 "
            f"(scale {scale:g})")
        return EncodedDiagonals(_split_i64(coeffs), scale, self.d)

    # -- device staging ----------------------------------------------------

    def load(self, enc: EncodedDiagonals, level: int) -> jnp.ndarray:
        """Stage host int32 coefficients -> device NTT/Mont residues
        [B, G, l, N]."""
        return _load_coeffs(self.ctx, jnp.asarray(enc.coeffs), level)

    # -- the matvec kernel -------------------------------------------------

    def __call__(self, ct: Ciphertext, pt: jnp.ndarray, pt_scale: float | None = None
                 ) -> Ciphertext:
        l = ct.level
        assert pt.shape[-2] == l, (pt.shape, l)
        scale = self.ctx.scale if pt_scale is None else pt_scale
        out = self._kernel(l)(ct.c, pt)
        return Ciphertext(out, ct.scale * scale / float(self.ctx.q_np[l - 1]))

    def _xs(self, l: int):
        """Stacked rotation-key tensors for level l, passed as runtime
        ARGUMENTS (closure constants would be embedded into the compiled
        HLO — ~100 MB of constants at D=2048 and minutes of compile time).
        Returns (baby_perms, baby_kb, baby_ka, giant_perms, giant_kb,
        giant_ka).

        The cache holds at most 2 levels (a fully-encrypted block touches
        l for its key projection and l-2 for its value projection): each
        stack is a full gathered COPY of every rotation key (~6 GB at
        D=2048/N=16384/L=59), and a deep chain walks ~40 distinct levels —
        an unbounded cache OOMs the chip (round-3 fe19 postmortem).
        Re-stacking an evicted level costs one device gather.  With
        full_key_stacks the stacks are level-INDEPENDENT (raw keys; the
        kernel selects inside the jit) and are built exactly once."""
        if self.full_key_stacks:
            l = "full"
        if l not in self._xs_cache:
            import os
            import sys
            import time as _time

            t_xs0 = _time.perf_counter()
            ctx = self.ctx
            n = ctx.n
            cap = max(1, int(os.environ.get("FHE_XS_CACHE", "2")))
            while len(self._xs_cache) >= cap:
                self._xs_cache.pop(next(iter(self._xs_cache)))

            # stacking runs jitted: eager concatenate dispatches are
            # unimplemented over the axon TPU tunnel.  With key_sharding
            # set, FULL (padded) key tensors are stacked limb-sharded
            # across the mesh — [S, dnum, LKpad, N] with LKpad sharded —
            # dividing the per-level stack footprint (~6 GB at
            # D=2048/N=16384/L=59) by the mesh size; the level selection
            # happens INSIDE the jitted kernel (a partitioned gather), so
            # no replicated selected copy is ever resident.
            if self.key_sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                ks = self.key_sharding
                spec = PartitionSpec(None, *ks.spec)
                out_sh = NamedSharding(ks.mesh, spec)
                stk = jax.jit(lambda bs, as_: (jnp.stack(bs), jnp.stack(as_)),
                              out_shardings=(out_sh, out_sh))
            else:
                stk = jax.jit(lambda bs, as_: (jnp.stack(bs), jnp.stack(as_)))

            def stack_keys(steps):
                gs = [ctx.galois_element(s) for s in steps]
                perms = np.stack([ctx.ntt.autoperm(g) for g in gs]
                                 ).astype(np.int32)
                # a step that is ≡ 0 mod slots has Galois element 1 (it
                # happens on DiagonalMatvec offset lattices, e.g. the
                # N=16384 bootstrap C2S stages): rotation is the identity
                # and no rotation key exists — switch with the identity
                # key (s -> s) to keep the stacked kernel uniform (one
                # keyswitch of extra noise on that group only)
                keys = [(ctx.identity_ksk() if g == 1 else
                         ctx.galois_keys[g]) for g in gs]
                if self.full_key_stacks:
                    kb = [k.b for k in keys]
                    ka = [k.a for k in keys]
                else:
                    kb, ka = zip(*(ctx.select_key(k, l) for k in keys))
                kbs, kas = stk(list(kb), list(ka))
                return (jnp.asarray(perms), kbs, kas)

            xs = stack_keys(self.baby_steps) + stack_keys(self.giant_steps)
            jax.block_until_ready(xs[1])
            if os.environ.get("FHE_XS_LOG") == "1":
                jax.block_until_ready(xs[1])
                print(f"  [xs] level-{l} key-stack gather: "
                      f"{_time.perf_counter() - t_xs0:.3f}s",
                      file=sys.stderr, flush=True)
            self._xs_cache[l] = xs
        return self._xs_cache[l]

    @functools.lru_cache(maxsize=None)
    def _kernel_raw(self, l: int, i32: bool = False, wide: bool = False):
        """kernel(c, pt, bp, bkb, bka, gp, gkb, gka) — all data as args.

        i32=True: pt arrives as int32 coefficient encodings [B, G, N] and
        giant groups are RNS-expanded to residues INSIDE the kernel in
        chunks — a bounded transient regardless of B or l, which is what
        lets deep chains (l ~ 60) and 24-resident-block models run without
        materializing [B, G, l, N].

        wide=True (implies staged coefficients): pt is the two-plane
        int64-split format [B, G, 2, N] of `encode_wide`, expanded with
        rns_expand_wide — the composite-scale width-2 staging.

        Layout strategy (measured on v5e, docs/NOTES_r3.md): the G-1 baby
        keyswitches are independent, and the B-1 giant groups only share
        the final accumulation — both were originally lax.scan loops (one
        small tensor per step, latency-bound).  The babies are evaluated
        as ONE batched keyswitch (vmap), and the giants in chunks of
        FHE_GIANT_CHUNK groups: each chunk batches its diagonal expansion
        (one [chunk*G*l, N]-row NTT), its contraction, and its keyswitch,
        trading a ~chunk*G-ciphertext transient for VPU/MXU-sized ops."""
        import os

        ctx = self.ctx
        p, _ = ctx._p(l)
        chunk = max(1, int(os.environ.get("FHE_GIANT_CHUNK", "8")))
        if wide:
            expand = lambda ptg: rns_expand_wide(ctx, ptg, l)
        elif i32:
            expand = lambda ptg: rns_expand(ctx, ptg, l)
        else:
            expand = lambda ptg: ptg

        def rotate_with(c, D1, perm, kb, ka):
            """Rotate ct (given its hoisted digits D1) by one stacked key."""
            Dg = jnp.take(D1, perm, axis=-1)
            ks = ctx._mod_down(ctx._apply_ksk(Dg, kb, ka, l), l)
            c0 = add_mod(jnp.take(c[..., 0, :, :], perm, axis=-1),
                         ks[..., 0, :, :], p)
            return jnp.stack([c0, ks[..., 1, :, :]], axis=-3)

        # contraction layout (FHE_CONTRACT_LAYOUT): "fused" multiplies the
        # full [.., G, 2, l, N] tensor (fastest — measured 9.3 vs 11.1
        # s/token on the device-client path); "lead" moves the 2-component
        # axis to the front first, avoiding XLA's 8-wide padding of the
        # 2-axis when it lands in a tiled layout position — a 2.8x HBM
        # blowup that OOM'd the N=16384 bootstrap chain (docs/NOTES_r4.md).
        # Use "lead" for memory-bound deep-chain configs.
        lead = os.environ.get("FHE_CONTRACT_LAYOUT", "fused") == "lead"

        def contract(babies, ptg):
            """sum_b babies[b] * ptg[b]: [G, 2, l, N] x [G, l, N] -> [2, l, N]
            (or with a leading chunk axis on ptg)."""
            if lead:
                b2 = jnp.moveaxis(babies, -3, 0)      # [2, G, l, N]
                if ptg.ndim == 4:                     # [chunk, G, l, N]
                    b2 = b2[:, None]
                prod = mont_mul(b2, ptg, p, ctx.ntt.pinv[:l])
                while prod.shape[-3] > 1:
                    m = prod.shape[-3]
                    if m % 2:
                        head = prod[..., :1, :, :]
                        prod = prod[..., 1:, :, :]
                        first = add_mod(prod[..., 0, :, :],
                                        head[..., 0, :, :], p)
                        prod = prod.at[..., 0, :, :].set(first)
                        m -= 1
                    prod = add_mod(prod[..., : m // 2, :, :],
                                   prod[..., m // 2:, :, :], p)
                return jnp.moveaxis(prod[..., 0, :, :], 0, -3)
            prod = mont_mul(babies, ptg[..., :, None, :, :], p,
                            ctx.ntt.pinv[:l])
            while prod.shape[-4] > 1:
                m = prod.shape[-4]
                if m % 2:
                    head = prod[..., :1, :, :, :]
                    prod = prod[..., 1:, :, :, :]
                    first = add_mod(prod[..., 0, :, :, :],
                                    head[..., 0, :, :, :], p)
                    prod = prod.at[..., 0, :, :, :].set(first)
                    m -= 1
                prod = add_mod(prod[..., : m // 2, :, :, :],
                               prod[..., m // 2:, :, :, :], p)
            return prod[..., 0, :, :, :]

        def giant_chunk(babies, ptc, perms, kbs, kas):
            """One batched chunk of giant groups -> their rotated partial
            sums, tree-added to a single [2, l, N] contribution."""
            accs = contract(babies, expand(ptc))        # [chunk, 2, l, N]
            D2 = ctx._decompose(accs[..., 1, :, :], l)  # [chunk, d_l, T, N]
            rots = jax.vmap(rotate_with)(accs, D2, perms, kbs, kas)
            s = rots
            while s.shape[0] > 1:
                m = s.shape[0]
                if m % 2:
                    s = s.at[0].set(add_mod(s[0], s[m - 1], p))
                    s = s[: m - 1]
                    m -= 1
                s = add_mod(s[: m // 2], s[m // 2:], p)
            return s[0]

        # baby keyswitches run batched; at deep-chain parameters one batch
        # of G-1 digit tensors [G-1, d_l, l+K, N] is multiple GB, so the
        # batch is split into FHE_BABY_CHUNK-sized pieces (0 = one batch)
        nb_steps = len(self.baby_steps)
        bchunk = int(os.environ.get("FHE_BABY_CHUNK", "0")) or max(
            1, nb_steps)

        # with full_key_stacks (incl. key_sharding), stacks arrive as FULL
        # (possibly padded) keys [S, dnum, LK(pad), N]; select the level's
        # digits/targets inside the kernel — an HBM-local gather (and one
        # XLA partitions along the sharded limb axis when sharded)
        full_keys = self.full_key_stacks
        d_l = ctx.num_digits(l)
        tgt_idx = np.asarray(ctx.targets(l), dtype=np.int32)

        def ksel(k):
            return k[:, :d_l][:, :, tgt_idx] if full_keys else k

        def kernel(c, pt, bp, bkb, bka, gp, gkb, gka):
            bkb, bka, gkb, gka = ksel(bkb), ksel(bka), ksel(gkb), ksel(gka)
            # hoisted baby rotations — batched keyswitch over G-1 keys
            D1 = ctx._decompose(c[..., 1, :, :], l)
            if self.baby_steps:
                rots = [jax.vmap(
                    lambda perm, kb, ka: rotate_with(c, D1, perm, kb, ka)
                )(bp[c0: c0 + bchunk], bkb[c0: c0 + bchunk],
                  bka[c0: c0 + bchunk])
                    for c0 in range(0, nb_steps, bchunk)]
                babies = jnp.concatenate([c[None]] + rots)      # [G, 2, l, N]
            else:
                babies = c[None]
            # giant group 0 (no rotation)
            y = contract(babies, expand(pt[0]))
            ng = len(self.giant_steps)
            if ng:
                nmain = (ng // chunk) * chunk
                if nmain:
                    ptm = pt[1: 1 + nmain].reshape((nmain // chunk, chunk)
                                                   + pt.shape[1:])
                    gpm = gp[:nmain].reshape(nmain // chunk, chunk, -1)
                    kbm = gkb[:nmain].reshape((nmain // chunk, chunk)
                                              + gkb.shape[1:])
                    kam = gka[:nmain].reshape((nmain // chunk, chunk)
                                              + gka.shape[1:])

                    def chunk_body(y, xs):
                        return add_mod(y, giant_chunk(babies, *xs), p), None
                    y, _ = lax.scan(chunk_body, y, (ptm, gpm, kbm, kam))
                if ng > nmain:                       # remainder, one batch
                    y = add_mod(y, giant_chunk(
                        babies, pt[1 + nmain:], gp[nmain:], gkb[nmain:],
                        gka[nmain:]), p)
            return ctx._rescale_core(y, l)
        return kernel

    @functools.lru_cache(maxsize=None)
    def _kernel(self, l: int):
        """Convenience single-ct kernel: (c, pt) with keys bound as args."""
        jitted = jax.jit(self._kernel_raw(l))
        return lambda c, pt: jitted(c, pt, *self._xs(l))

    def _kernel_raw_i32(self, l: int):
        """int32-staged variant: diagonals arrive as [B, G, N] int32 and
        are expanded per giant group inside the scan (see _kernel_raw)."""
        return self._kernel_raw(l, i32=True)


class DiagonalMatvec(BsgsMatvec):
    """Generalized BSGS over an arbitrary rotation-diagonal support.

    Evaluates y = sum_{o in offsets} diag_o * rot_o(x) for a sparse offset
    set (e.g. the collapsed-FFT bootstrap stages of ckks/dft.py, whose
    offsets are the lattice {j*h : |j| < 2^radix}).  Offsets are factored
    as o = (g*G + b) * u on the lattice of their gcd u; baby rotations are
    u*[1..G), giant rotations g*G*u (g may be negative).  Same hoisted
    kernel, host staging, and 1-level cost as the square-matrix engine.
    """

    def __init__(self, ctx: CkksContext, offsets, key_sharding=None,
                 full_key_stacks: bool | None = None):
        import os

        self.ctx = ctx
        self.key_sharding = key_sharding
        if full_key_stacks is None:
            full_key_stacks = os.environ.get("FHE_FULL_KEY_STACKS",
                                             "0") == "1"
        self.full_key_stacks = bool(full_key_stacks) or (
            key_sharding is not None)
        s = ctx.slots
        signed = sorted({((o % s) + s // 2) % s - s // 2 for o in offsets})
        self.d = s
        u = 0
        for o in signed:
            u = math.gcd(u, abs(o))
        self.unit = u = max(u, 1)
        js = [o // u for o in signed]
        self.G = max(1, math.isqrt(len(js)))
        if self.G * self.G < len(js):
            self.G += 1
        gset = {j // self.G for j in js} | {0}
        self._g_list = [0] + sorted(g for g in gset if g != 0)
        self._g_row = {g: i for i, g in enumerate(self._g_list)}
        self.B = len(self._g_list)
        self.baby_steps = tuple(u * b for b in range(1, self.G))
        self.giant_steps = tuple(g * self.G * u for g in self._g_list[1:])
        ctx.ensure_galois(self.baby_steps + self.giant_steps)
        self._xs_cache: dict = {}

    def slot_table(self, diags: dict[int, np.ndarray]) -> np.ndarray:
        """{offset: diagonal[slots]} -> the [B, G, slots] complex layout
        (group g's diagonals pre-rotated by +g*G*u for post-rotation)."""
        s = self.ctx.slots
        tbl = np.zeros((self.B, self.G, s), dtype=np.complex128)
        for o, v in diags.items():
            o_s = ((o % s) + s // 2) % s - s // 2
            j = o_s // self.unit
            assert j * self.unit == o_s, (o, self.unit)
            b = j % self.G
            g = (j - b) // self.G
            tbl[self._g_row[g], b] = np.roll(v, g * self.G * self.unit)
        return tbl

    def encode_table(self, diags: dict[int, np.ndarray],
                     scale: float | None = None) -> EncodedDiagonals:
        ctx = self.ctx
        scale = ctx.scale if scale is None else scale
        coeffs = _encode_slot_array(ctx, self.slot_table(diags), scale)
        return EncodedDiagonals(coeffs, scale, ctx.slots)


def _encode_slot_array(ctx: CkksContext, arr: np.ndarray, scale: float
                       ) -> np.ndarray:
    """Encode a [..., slots] complex slot array to int32 coefficients via
    the native C++/OpenMP batch encoder (N1 parity) when available, numpy
    canonical embedding otherwise."""
    from ..native import batch_encode

    enc = ctx.encoder
    coeffs = batch_encode(np.asarray(arr, dtype=np.complex128), scale,
                          enc._t_slot, enc._t_conj, ctx.n)
    if coeffs is None:
        coeffs = enc.encode(arr, scale).astype(np.int32)
    return coeffs


def rns_expand(ctx: CkksContext, coeffs: jnp.ndarray, level: int
               ) -> jnp.ndarray:
    """Signed int32 coefficient encodings [..., N] -> NTT/Mont residues
    [..., l, N] (device-side RNS expansion; also the fused-encrypt core)."""
    rows = tuple(range(level))
    ntt = ctx.ntt
    p = _sel(ntt.p, rows)
    mu = _sel(ctx.mu, rows)
    x = coeffs.astype(jnp.uint32)[..., None, :]       # wraps negatives mod 2^32
    r = barrett_reduce(x, p, mu)
    # fix wrap-around: subtract 2^32 mod p where the source was negative
    t32 = jnp.asarray((((1 << 32) % ctx.q_np[list(rows)])[:, None])
                      .astype(np.uint32))
    r = jnp.where(coeffs[..., None, :] < 0, sub_mod(r, t32, p), r)
    return ntt.to_mont(ntt.ntt(r, rows), rows)


def rns_expand_wide(ctx: CkksContext, planes: jnp.ndarray, level: int
                    ) -> jnp.ndarray:
    """Two-plane int64-split coefficient encodings [..., 2, N] -> NTT/Mont
    residues [..., l, N].

    Plane 0 (lo) holds the low 31 bits (non-negative), plane 1 (hi) the
    signed high part: value = hi * 2^31 + lo, |value| < 2^62 — the wide
    staging word for composite-scale (width-2, ~2^56) diagonal encodes
    that the int32 format of `rns_expand` cannot carry (VERDICT r4 #4).
    Same bounded-transient property: [..., 2, N] int32 resident, expanded
    per giant group in-kernel."""
    rows = tuple(range(level))
    ntt = ctx.ntt
    p = _sel(ntt.p, rows)
    mu = _sel(ctx.mu, rows)
    pinv = _sel(ntt.pinv, rows)
    lo = planes[..., 0, :]
    hi = planes[..., 1, :]
    r_lo = barrett_reduce(lo.astype(jnp.uint32)[..., None, :], p, mu)
    r_hi = barrett_reduce(hi.astype(jnp.uint32)[..., None, :], p, mu)
    t32 = jnp.asarray((((1 << 32) % ctx.q_np[list(rows)])[:, None])
                      .astype(np.uint32))
    r_hi = jnp.where(hi[..., None, :] < 0, sub_mod(r_hi, t32, p), r_hi)
    # hi * 2^31 mod p via one Montgomery multiply: mont_mul(a, b) =
    # a*b*2^-32, so b = (2^63 mod p) yields a*2^31 exactly
    c63 = jnp.asarray(((np.uint64(1) << np.uint64(63))
                       % ctx.q_np[list(rows)].astype(np.uint64)
                       ).astype(np.uint32)[:, None])
    r = add_mod(mont_mul(r_hi, c63, p, pinv), r_lo, p)
    return ntt.to_mont(ntt.ntt(r, rows), rows)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _load_coeffs(ctx: CkksContext, coeffs: jnp.ndarray, level: int
                 ) -> jnp.ndarray:
    return rns_expand(ctx, coeffs, level)
