"""Fully-encrypted FFN inference: no intermediate decryption (SURVEY.md C11,
/root/reference/test_fully_enc_bsgs.py).

Per block (plaintext oracle: x + (x @ W_key)^2 @ W_val, exactly 3 levels):
  1. key projection D->F: ceil(F/D) real BSGS chunk matvecs, baby rotations
     shared — here one vmapped kernel with the input held constant  [1 level]
  2. CT-CT square per chunk (one batched multiply+relin+rescale)    [1 level]
  3. value projection F->D: per-chunk BSGS batched over chunks,
     partials summed level-aligned                                  [1 level]
  4. residual: mod-switch x down 3 limbs + set_scale + add          [0 levels]

Magnitude control: per-block constant alpha/|fv|_inf folded into W_val
from one calibration input (test_fully_enc_bsgs.py:182-196) keeps every
intermediate near unit magnitude through arbitrarily many blocks.

Bootstrap integration: run_fully_encrypted refreshes the ciphertext when
fewer than 4 limbs remain, via a caller-provided bootstrap function
(ckks/bootstrap when available).
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ckks.context import CkksContext
from ..ckks.ciphertext import Ciphertext
from ..ops.bsgs import BsgsMatvec, _load_coeffs
from ..core.modops import add_mod

__all__ = ["FullyEncryptedFfn", "calibrate_magnitude", "run_fully_encrypted",
           "pre_encode_blocks", "plaintext_ffn_block", "full_vocab_head",
           "generate_fully_encrypted_token"]


def plaintext_ffn_block(x, w_key, w_val):
    return x + (x @ w_key) ** 2 @ w_val


def calibrate_magnitude(w_keys, w_vals, x_cal, target_mag=1.0):
    """Two-stage magnitude control from one calibration pass.

    The reference folds target/|fv|_inf into W_val alone
    (test_fully_enc_bsgs.py:182-196); with 59-bit primes that constant
    (often ~1e4) fits, but a 28-bit-scale encoding would overflow.  Here
    the key matrix is scaled by a = target/|fk|_inf and the value matrix
    by b = (target/|fv|_inf)/a^2, which computes the same calibrated chain
    (a^2*b * fk^2 @ W_val) while keeping every encoded matrix — and the
    squared intermediate — near unit magnitude.  Better for CKKS noise on
    any backend.  Returns (w_keys_scaled, w_vals_scaled).
    """
    ks, vs = [], []
    x = np.asarray(x_cal, dtype=np.float64).copy()
    for wk, wv in zip(w_keys, w_vals):
        fk = x @ wk
        a = target_mag / (np.max(np.abs(fk)) + 1e-12)
        fv = fk ** 2 @ wv
        ms = target_mag / (np.max(np.abs(fv)) + 1e-12)
        b = ms / (a * a)
        ks.append(wk * a)
        vs.append(wv * b)
        x = x + fv * ms
    return ks, vs


class FullyEncryptedFfn:
    """Fully-encrypted FFN block evaluator for fixed (ctx, D, F)."""

    def __init__(self, ctx: CkksContext, d: int, f: int,
                 seq_chunks: bool = False, stage_mode: str = "expanded",
                 key_sharding=None, width: int = 1):
        """seq_chunks: evaluate the F/D chunk axis with `lax.map`
        (sequential, one transient chunk live) instead of vmap — the
        memory-bounding analogue of the reference's batch-1024 full-scale
        FFN loop (fhe_rwkv_inference.py:623-725).  Same results; use for
        full-vocab/full-F models where 2*n_chunks resident intermediates
        would exceed HBM.

        stage_mode: "expanded" stages diagonals as NTT/Mont residues
        [B, G, l, N] (fastest, but l-proportional HBM); "i32" stages them
        as int32 coefficients [B, G, N] and RNS-expands per giant group
        inside the kernel — mandatory for deep chains (l ~ 60 at
        reference scale D=2048/F=8192/19 blocks, where expanded staging
        would need ~3 TB).

        key_sharding: optional NamedSharding partitioning the LIMB axis of
        the rotation-key stacks across a device mesh (the BASELINE.json
        RNS-limb axis; see CkksContext.shard_eval_keys).  This is what
        lets the N=16384/L=59 reference-scale chain — whose keys + one
        level stack alone exceed a single v5e's HBM (docs/NOTES_r3.md
        postmortem) — run across 2+ chips; results are bitwise identical
        to the single-chip kernel.

        width: working-scale width in limbs.  width=2 runs the chain at a
        COMPOSITE scale Delta_2 ~ 2^56 (two rescales per stage, 6
        limbs/block instead of 3): every noise source that is absolute in
        integer units — plaintext-encode rounding, keyswitch/mod-down
        noise, rescale rounding — drops by ~2^28 relative, closing the
        absolute-error gap to the reference's 59-bit-prime backend
        (9.3e-9 over 19 blocks, paper/main.tex:1130; VERDICT r4 #4).
        Diagonals use the two-plane int64-split staging (encode_wide),
        the input is encrypted at ctx.scale**2, and decryption uses the
        3-limb CRT path.  Requires exact (level-scheduled) pre-encodes."""
        if width not in (1, 2):
            raise ValueError(f"width must be 1 or 2, got {width}")
        self.width = width
        self.ctx = ctx
        self.d, self.f = d, f
        # deep chains walk ~40 distinct levels; per-level key-stack
        # gathers cost ~9-23 s each through the tunnel (docs/NOTES_r4.md)
        # -> opt in to level-independent full key stacks here (the
        # class default is off for shallow/single-level engines)
        fks = os.environ.get("FHE_FULL_KEY_STACKS")
        self.eng = BsgsMatvec(ctx, d, key_sharding=key_sharding,
                              full_key_stacks=(fks != "0"))
        self.n_chunks = -(-f // d)
        self.seq_chunks = seq_chunks
        self.stage_mode = stage_mode

    def diag_scales(self, level: int) -> tuple[float, float]:
        """Exact scale management (the 28-bit-prime analogue of the
        reference's free 59-bit scale slack): encoding the key diagonals at
        s_key = q[l-1] and the value diagonals at s_val = q[l-2]*q[l-3]/Delta
        makes the block's output scale equal its input scale EXACTLY
        (s_fk = s_x, s_sq = s_x^2/q[l-2], s_fv = s_x^2/Delta = s_x for
        s_x = Delta), so the residual add needs no scale relabel.  With
        level-agnostic Delta encodes, the relabel injects a
        signal-proportional ~|q_i/Delta - 1| ~ 3e-2 error per block — the
        round-3 fe19 numerics gap (docs/NOTES_r3.md).

        width=2: the chain invariant is s_x = Delta_2 = ctx.scale^2; key
        diagonals at s_key = q[l-1]*q[l-2] (two rescales -> s_fk = s_x),
        value diagonals at s_val = q[l-3]*q[l-4]*q[l-5]*q[l-6]/Delta_2
        (s_fv = s_sq*s_val/(q[l-5]q[l-6]) = s_x exactly)."""
        q = self.ctx.q_np
        if self.width == 2:
            assert level >= 7, f"width-2 consume level must be >= 7, got {level}"
            s_key = float(q[level - 1]) * float(q[level - 2])
            s_val = (float(q[level - 3]) * float(q[level - 4])
                     * float(q[level - 5]) * float(q[level - 6])
                     / self.ctx.scale ** 2)
            return s_key, s_val
        assert level >= 4, f"consume level must be >= 4, got {level}"
        s_key = float(q[level - 1])
        s_val = float(q[level - 2]) * float(q[level - 3]) / self.ctx.scale
        return s_key, s_val

    def encode_block(self, w_key: np.ndarray, w_val: np.ndarray,
                     level: int | None = None) -> dict:
        """Host pre-encode: chunked key/value diagonal stacks (int32).

        With `level` (the level this block will be CONSUMED at), diagonals
        are encoded at the exact-alignment scales of `diag_scales`;
        without, at Delta (legacy, relabel error ~3e-2/block).  width=2
        requires `level` (composite scales are level-specific by nature)
        and produces two-plane int64-split stacks [k, B, G, 2, N]."""
        d = self.d
        if self.width == 2:
            assert level is not None, "width-2 encodes require a level"
            enc = self.eng.encode_wide
        else:
            enc = self.eng.encode
        s_key = s_val = None
        if level is not None:
            s_key, s_val = self.diag_scales(level)
        key_mats, val_mats = [], []
        for c in range(self.n_chunks):
            mk = np.zeros((d, d))
            cols = w_key[:, c * d: (c + 1) * d].T
            mk[: cols.shape[0]] = cols
            key_mats.append(enc(mk, s_key).coeffs)
            mv = np.zeros((d, d))
            rows = w_val[c * d: (c + 1) * d, :].T
            mv[:, : rows.shape[1]] = rows
            val_mats.append(enc(mv, s_val).coeffs)
        out = {"key": np.stack(key_mats), "val": np.stack(val_mats)}
        if level is not None:
            out["level"] = level
        return out

    def load_block(self, host: dict, level: int) -> dict:
        """Stage one block's diagonals at the levels they are consumed:
        key at `level`, val at `level - 2` (i32 mode: device-put the int32
        coefficients unchanged; kernels expand per giant group)."""
        ctx = self.ctx
        if self.stage_mode == "i32" or self.width == 2:
            # width-2 planes stay int32 regardless of stage_mode — the
            # wide expansion happens in-kernel (rns_expand_wide)
            out = {"key": jnp.asarray(host["key"]),
                   "val": jnp.asarray(host["val"])}
        else:
            out = {"key": _load_coeffs(ctx, jnp.asarray(host["key"]), level),
                   "val": _load_coeffs(ctx, jnp.asarray(host["val"]),
                                       level - 2)}
        if "level" in host:
            out["level"] = int(host["level"])
        return out

    def __call__(self, ct_x: Ciphertext, staged: dict) -> Ciphertext:
        """One fully-encrypted block; level l -> l-3 (width 2: l -> l-6)."""
        if self.width == 2:
            return self._call_wide(ct_x, staged)
        ctx, l = self.ctx, ct_x.level
        assert l >= 4, f"need >= 4 limbs, have {l} (bootstrap first)"
        q = ctx.q_np
        exact = "level" in staged
        if exact:
            assert staged["level"] == l, (
                f"block diagonals encoded for level {staged['level']} but "
                f"consumed at level {l} — re-encode (exact scale management)")
            s_key, s_val = self.diag_scales(l)
        else:
            s_key = s_val = ctx.scale
        # 1. key projection (shared input, batched chunks)
        fk = self._shared(l)(ct_x.c, staged["key"])          # [k, 2, l-1, N]
        s_fk = ct_x.scale * s_key / float(q[l - 1])
        # 2. square (batched multiply + relin + rescale)
        sq = Ciphertext(fk, s_fk)
        sq = ctx.rescale(ctx.multiply(sq, sq))               # [k, 2, l-2, N]
        # 3. value projection (batched chunks) + modular tree-sum
        fv = self._batched(l - 2)(sq.c, staged["val"])       # [k, 2, l-3, N]
        s_fv = sq.scale * s_val / float(q[l - 3])
        v = self._sum_chunks(l - 3)(fv)
        # 4. residual: align level + scale, add.  In exact mode the true
        # scales are EQUAL by construction (s_fv = s_x^2/Delta = s_x under
        # the chain invariant s_x = Delta; after a bootstrap retag the gap
        # is the retag fuzz <= 1e-4, once) — set_scale only unifies float
        # bookkeeping.  In legacy mode it relabels a genuinely different
        # scale: ~3e-2 signal-proportional error per block.
        x_al = ctx.mod_drop(ct_x, 3)
        tgt = s_fv if exact else x_al.scale
        v_ct = ctx.set_scale(Ciphertext(v, s_fv), tgt)
        x_sc = x_al if x_al.scale == tgt else ctx.set_scale(x_al, tgt)
        return ctx.add(x_sc, v_ct)

    def _call_wide(self, ct_x: Ciphertext, staged: dict) -> Ciphertext:
        """width-2 block at the composite scale Delta_2; level l -> l-6.
        Each stage rescales twice (once inside the matvec kernel, once
        after), so every absolute noise source is ~2^-56 relative."""
        ctx, l = self.ctx, ct_x.level
        assert l >= 7, f"width-2 needs >= 7 limbs, have {l} (bootstrap first)"
        q = ctx.q_np
        assert "level" in staged and staged["level"] == l, (
            f"width-2 diagonals encoded for level {staged.get('level')} "
            f"but consumed at level {l} — re-encode")
        s_key, s_val = self.diag_scales(l)
        # 1. key projection + second rescale: l -> l-2, s_fk = s_x
        fk = self._shared(l)(ct_x.c, staged["key"])          # [k, 2, l-1, N]
        fk_ct = ctx.rescale(
            Ciphertext(fk, ct_x.scale * s_key / float(q[l - 1])))
        # 2. square + two rescales: l-2 -> l-4
        sq = ctx.rescale(ctx.rescale(ctx.multiply(fk_ct, fk_ct)))
        # 3. value projection, chunk-sum at l-5, second rescale: -> l-6
        fv = self._batched(l - 4)(sq.c, staged["val"])       # [k, 2, l-5, N]
        v = self._sum_chunks(l - 5)(fv)
        v_ct = ctx.rescale(
            Ciphertext(v, sq.scale * s_val / float(q[l - 5])))
        # 4. residual: scales equal by construction (s_fv = s_x^2/Delta_2
        # = s_x under the invariant s_x = Delta_2); set_scale unifies the
        # float tags only
        x_al = ctx.mod_drop(ct_x, 6)
        x_sc = (x_al if x_al.scale == v_ct.scale
                else ctx.set_scale(x_al, v_ct.scale))
        return ctx.add(x_sc, v_ct)

    @functools.lru_cache(maxsize=None)
    def _shared(self, l):
        raw = self.eng._kernel_raw(l, i32=self.stage_mode == "i32",
                                   wide=self.width == 2)
        if self.seq_chunks:
            j = jax.jit(lambda c, pt, *xs:
                        jax.lax.map(lambda p: raw(c, p, *xs), pt))
        else:
            j = jax.jit(jax.vmap(raw, in_axes=(None, 0) + (None,) * 6))
        return lambda c, pt: j(c, pt, *self.eng._xs(l))

    @functools.lru_cache(maxsize=None)
    def _batched(self, l):
        raw = self.eng._kernel_raw(l, i32=self.stage_mode == "i32",
                                   wide=self.width == 2)
        if self.seq_chunks:
            j = jax.jit(lambda c, pt, *xs:
                        jax.lax.map(lambda cp: raw(cp[0], cp[1], *xs),
                                    (c, pt)))
        else:
            j = jax.jit(jax.vmap(raw, in_axes=(0, 0) + (None,) * 6))
        return lambda c, pt: j(c, pt, *self.eng._xs(l))

    @functools.lru_cache(maxsize=None)
    def _sum_chunks(self, l):
        p = self.ctx.ntt.p[:l]

        def f(x):
            while x.shape[0] > 1:
                m = x.shape[0]
                if m % 2:
                    head, x = x[:1], x[1:]
                    x = x.at[0].set(add_mod(x[0], head[0], p))
                    m -= 1
                x = add_mod(x[: m // 2], x[m // 2:], p)
            return x[0]
        return jax.jit(f)


def fe_level_schedule(start_level: int, n_blocks: int,
                      min_levels: int | None = None,
                      boot_level: int | None = None,
                      width: int = 1) -> list[int | None]:
    """Per-block CONSUME levels for a chain starting at `start_level`
    (3*width limbs/block; refresh to `boot_level` when fewer than
    `min_levels`+1 remain).  Use to pre-encode blocks at exact-alignment
    scales.  Without boot_level, blocks past exhaustion get None (never
    reached).  min_levels defaults to 4 (width 1) / 8 (width 2 — the
    output level stays >= 3 so the 3-limb composite-scale decrypt always
    has its limbs)."""
    if min_levels is None:
        min_levels = 4 if width == 1 else 8
    lv, out = start_level, []
    for _ in range(n_blocks):
        if lv - 1 < min_levels:
            if boot_level is None:
                out.append(None)
                continue
            lv = boot_level
        out.append(lv)
        lv -= 3 * width
    return out


def pre_encode_blocks(eng: "FullyEncryptedFfn", w_keys, w_vals,
                      cache_dir: str | None = None, log_fn=None,
                      levels: list | None = None):
    """Host pre-encode of every block's diagonal plaintexts (the
    reference's pre_encode_block + CPU offload, SURVEY.md C8;
    scripts/bootstrap_generation.py:265-358).  With cache_dir set, each
    block is persisted as raw mmap-able .npy files (npz CRC passes are
    disk-bound on this host — docs/NOTES_r1.md).

    levels: per-block consume levels (fe_level_schedule) — encodes at the
    exact-alignment scales of FullyEncryptedFfn.diag_scales; entries of
    None fall back to level-agnostic Delta encodes."""
    import os

    hosts = []
    for b, (wk, wv) in enumerate(zip(w_keys, w_vals)):
        lv = levels[b] if levels is not None else None
        tag = f"block{b:03d}" + (f"_l{lv}" if lv is not None else "")
        if cache_dir:
            bdir = os.path.join(cache_dir, tag)
            kf, vf = (os.path.join(bdir, "key.npy"),
                      os.path.join(bdir, "val.npy"))
            if os.path.exists(kf) and os.path.exists(vf):
                host = {"key": np.load(kf, mmap_mode="r"),
                        "val": np.load(vf, mmap_mode="r")}
                if lv is not None:
                    host["level"] = lv
                hosts.append(host)
                continue
        t0 = time.perf_counter()
        host = eng.encode_block(np.asarray(wk), np.asarray(wv), level=lv)
        if cache_dir:
            bdir = os.path.join(cache_dir, tag)
            os.makedirs(bdir, exist_ok=True)
            np.save(os.path.join(bdir, "key.npy"), host["key"])
            np.save(os.path.join(bdir, "val.npy"), host["val"])
        if log_fn:
            log_fn(f"  pre-encode block {b}: {time.perf_counter() - t0:.1f}s")
        hosts.append(host)
    return hosts


def run_fully_encrypted(ctx: CkksContext, w_keys, w_vals, x0,
                        bootstrap_fn=None, min_levels: int | None = None,
                        verbose: bool = True, return_ct: bool = False,
                        seq_chunks: bool = False, stage_mode: str = "expanded",
                        pre_encoded: list | None = None, eng=None,
                        log_fn=None, calibrated: bool = False,
                        cache_dir: str | None = None, width: int = 1):
    """Chain blocks with per-block plaintext verification (the reference's
    main loop, test_fully_enc_bsgs.py:238-298).  Returns per-block stats;
    with return_ct=True returns (stats, final_ciphertext) so a client-side
    head can consume the encrypted result.

    pre_encoded: optional pre_encode_blocks output — when given (with
    calibrated=True weights) encoding stays out of the per-block timing,
    mirroring the reference's --preencoded mode.

    cache_dir: the pre_encode_blocks cache directory — re-encodes forced
    by an off-schedule bootstrap level are persisted back so future
    processes don't re-pay the host encode inside the timed loop
    (ADVICE r3 #2)."""
    d, f = np.asarray(w_keys[0]).shape
    if eng is None:
        eng = FullyEncryptedFfn(ctx, d, f, seq_chunks=seq_chunks,
                                stage_mode=stage_mode, width=width)
    width = eng.width
    if min_levels is None:
        min_levels = 4 if width == 1 else 8
    if width == 2 and bootstrap_fn is not None:
        raise NotImplementedError(
            "width-2 chains refresh to ctx.scale, not Delta_2; bootstrap "
            "integration needs a post-refresh scale-raise (future work)")
    if not calibrated:
        w_keys, w_vals = calibrate_magnitude(w_keys, w_vals, x0)

    x_ref = np.asarray(x0, dtype=np.float64).copy()
    refs = [x_ref.copy()]
    for wk, wv in zip(w_keys, w_vals):
        x_ref = plaintext_ffn_block(x_ref, wk, wv)
        refs.append(x_ref.copy())

    ct = ctx.encrypt_replicated(
        x0, scale=ctx.scale ** 2 if width == 2 else None)
    stats = []
    n_boot = 0
    say = log_fn if log_fn else (print if verbose else None)
    _pf: dict = {"thread": None, "staged": None}   # one-slot prefetcher
    for b, (wk, wv) in enumerate(zip(w_keys, w_vals)):
        if ct.level - 1 < min_levels:
            if bootstrap_fn is None:
                if say:
                    say(f"  out of levels at block {b} (level={ct.level})")
                break
            t0 = time.perf_counter()
            from ..utils.retry import retry_transient

            ct = retry_transient(bootstrap_fn, ct, log_fn=say)
            # exact-mode blocks assume tag == true scale == ctx.scale; a
            # refresh landing off-scale must be adjusted exactly (a retag
            # deviation compounds through each block's CT-CT square —
            # ADVICE r3 #1).  Within float-ulp, just clean the tag.
            if abs(ct.scale - ctx.scale) > 1e-9 * ctx.scale:
                ct = ctx.scale_to(ct, ctx.scale, exact=True)
            else:
                ct = ctx.set_scale(ct, ctx.scale)
            n_boot += 1
            if say:
                say(f"  bootstrap before block {b}: "
                    f"{time.perf_counter() - t0:.2f}s -> level {ct.level}")
        t0 = time.perf_counter()
        if pre_encoded is not None:
            host = pre_encoded[b]
            if host.get("level") != ct.level:
                # encoded for a different (or no) consume level — e.g. a
                # bootstrap landed at an unplanned level.  Load a persisted
                # re-encode if a previous process already paid for it, else
                # re-encode at the exact scales; stash both in memory and
                # (cache_dir) on disk so later passes/processes hit steady
                # state (ADVICE r3 #2).
                import os

                bdir = (os.path.join(cache_dir, f"block{b:03d}_l{ct.level}")
                        if cache_dir else None)
                if bdir and os.path.exists(os.path.join(bdir, "key.npy")):
                    host = {"key": np.load(os.path.join(bdir, "key.npy"),
                                           mmap_mode="r"),
                            "val": np.load(os.path.join(bdir, "val.npy"),
                                           mmap_mode="r"),
                            "level": ct.level}
                else:
                    if say:
                        say(f"  block {b}: re-encode for level {ct.level} "
                            f"(pre-encoded for {host.get('level')})")
                    host = eng.encode_block(np.asarray(w_keys[b]),
                                            np.asarray(w_vals[b]),
                                            level=ct.level)
                    if bdir:
                        os.makedirs(bdir, exist_ok=True)
                        np.save(os.path.join(bdir, "key.npy"), host["key"])
                        np.save(os.path.join(bdir, "val.npy"), host["val"])
                pre_encoded[b] = host
        else:
            host = eng.encode_block(np.asarray(wk), np.asarray(wv),
                                    level=ct.level)
        from ..utils.retry import retry_transient

        # consume a prefetched staging if it matches this block+level
        staged = None
        if _pf["thread"] is not None:
            _pf["thread"].join()
            _pf["thread"] = None
            if _pf.get("block") == b and _pf.get("level") == ct.level:
                staged = _pf.get("staged")
            _pf["staged"] = None
        if staged is None:
            staged = eng.load_block(host, ct.level)

        # prefetch block b+1's staging on a thread while this block
        # computes: the ~543 MB/block i32 diagonal transfer through the
        # tunnel relay is ~half the steady s/block (BENCH_LOCAL_r5_fe19);
        # H2D DMA overlaps TPU compute
        # FHE_PREFETCH=0 disables the overlap (the prefetched block is a
        # second ~0.5-2 GB staging resident — too much for HBM-saturated
        # configs like the N=16384 bootstrap chain)
        if (pre_encoded is not None and b + 1 < len(pre_encoded)
                and os.environ.get("FHE_PREFETCH", "1") == "1"):
            nh = pre_encoded[b + 1]
            nl = nh.get("level")
            if nl is not None and nl == ct.level - 3 * eng.width:
                import threading

                def _pre(nh=nh, nl=nl, nb=b + 1):
                    try:
                        _pf["staged"] = eng.load_block(nh, nl)
                        _pf["block"], _pf["level"] = nb, nl
                    except Exception:
                        _pf["staged"] = None
                _pf["thread"] = threading.Thread(target=_pre, daemon=True)
                _pf["thread"].start()

        def _block_step():
            out = eng(ct, staged)
            jax.block_until_ready(out.c)
            return out
        ct = retry_transient(_block_step, log_fn=say)
        dt = time.perf_counter() - t0
        dec = ctx.decrypt_vec(ct, d)
        corr = float(np.corrcoef(dec, refs[b + 1])[0, 1])
        err = float(np.max(np.abs(dec - refs[b + 1])))
        stats.append({"block": b, "corr": corr, "max_err": err, "sec": dt,
                      "level": ct.level, "bootstraps": n_boot})
        if say:
            say(f"  block {b}: corr={corr:.10f} max_err={err:.2e} "
                f"level={ct.level} {dt:.2f}s")
    return (stats, ct) if return_ct else stats


def full_vocab_head(x: np.ndarray, w_head: np.ndarray,
                    ln_w=None, ln_b=None):
    """Client-side full-vocabulary head: LN(x) @ W_head -> logits, argmax.

    The reference computes the head in plaintext on the client after the
    encrypted trunk (scripts/bootstrap_generation.py:1008-1010 and the
    full-vocab run of fhe_rwkv_inference.py:623-725); only the D-dim
    hidden state crosses the wire, never vocab-sized data.  Returns
    (token_id, logits) for the full vocab in one numpy matmul.
    """
    x = np.asarray(x, dtype=np.float64)
    h = (x - x.mean()) / np.sqrt(x.var() + 1e-5)
    if ln_w is not None:
        h = h * np.asarray(ln_w, dtype=np.float64)
    if ln_b is not None:
        h = h + np.asarray(ln_b, dtype=np.float64)
    logits = h @ np.asarray(w_head, dtype=np.float64)
    return int(np.argmax(logits)), logits


def generate_fully_encrypted_token(ctx: CkksContext, w_keys, w_vals,
                                   w_head, x0, bootstrap_fn=None,
                                   min_levels: int = 4,
                                   seq_chunks: bool = False,
                                   ln_w=None, ln_b=None):
    """Full-vocab generation step: fully-encrypted FFN trunk + client-side
    head over the whole vocabulary (C5 tail — the reference's full-scale
    path, fhe_rwkv_inference.py:592-725).

    Returns (token_id, logits, stats).  `w_head` is [D, vocab]; any vocab
    size works since the head is a single plaintext matmul client-side.
    """
    stats, ct = run_fully_encrypted(
        ctx, w_keys, w_vals, x0, bootstrap_fn=bootstrap_fn,
        min_levels=min_levels, verbose=False, return_ct=True,
        seq_chunks=seq_chunks)
    d = np.asarray(w_keys[0]).shape[0]
    dec = ctx.decrypt_vec(ct, d)
    token, logits = full_vocab_head(dec, w_head, ln_w, ln_b)
    return token, logits, stats


class FullyEncryptedTimeMix:
    """Fully-encrypted time-mix block (SURVEY.md C5 tail,
    /root/reference/fhe_rwkv_inference.py:728-887): the sigmoid gate is the
    linear surrogate 0.25x + 0.5 with the 0.25 folded into W_r, then the
    (r * k) * v CT-CT chain with level-aligned accumulation and the W_o
    output projection + residual.  ~6 levels/block (reference: 7 —
    BSGS matvecs here are 1 level each vs the reference's naive dots).

    Oracle: x + W_o @ (((0.25*(W_r x)+0.5) * (W_k x)) * (W_v x)).
    """

    def __init__(self, ctx: CkksContext, d: int):
        self.ctx = ctx
        self.d = d
        self.eng = BsgsMatvec(ctx, d)

    @staticmethod
    def oracle(x, w_r, w_k, w_v, w_o):
        r = 0.25 * (x @ w_r) + 0.5
        return x + ((r * (x @ w_k)) * (x @ w_v)) @ w_o

    def diag_scales(self, level: int) -> tuple[float, float]:
        """Exact scale management (see FullyEncryptedFfn.diag_scales): with
        s_rkv = q[l-1] and s_o = q[l-2]*q[l-3]*q[l-4]/Delta^2 the output
        scale equals the input scale exactly (out = s_x^4/Delta^3 = s_x at
        the chain invariant s_x = Delta) — no relabel error."""
        assert level >= 5, f"consume level must be >= 5, got {level}"
        q = self.ctx.q_np
        s_rkv = float(q[level - 1])
        s_o = (float(q[level - 2]) * float(q[level - 3]) *
               float(q[level - 4]) / (self.ctx.scale * self.ctx.scale))
        return s_rkv, s_o

    def encode_block(self, w_r, w_k, w_v, w_o, level: int | None = None):
        enc = self.eng.encode
        s_rkv, s_o = ((None, None) if level is None
                      else self.diag_scales(level))
        out = {"rkv": np.stack([enc(0.25 * w_r.T, s_rkv).coeffs,
                                enc(w_k.T, s_rkv).coeffs,
                                enc(w_v.T, s_rkv).coeffs]),
               "o": enc(w_o.T, s_o).coeffs}
        if level is not None:
            out["level"] = level
        return out

    def __call__(self, ct_x: Ciphertext, host: dict) -> Ciphertext:
        ctx, l = self.ctx, ct_x.level
        assert l >= 5, f"need >= 5 limbs, have {l}"
        q = ctx.q_np
        exact = "level" in host
        if exact:
            assert host["level"] == l, (host["level"], l)
            s_rkv, s_o = self.diag_scales(l)
        else:
            s_rkv = s_o = ctx.scale
        pt3 = _load_coeffs(ctx, jnp.asarray(host["rkv"]), l)
        raw = self.eng._kernel_raw(l)
        kern = jax.jit(jax.vmap(raw, in_axes=(None, 0) + (None,) * 6))
        rkv = kern(ct_x.c, pt3, *self.eng._xs(l))       # [3, 2, l-1, N]
        s1 = ct_x.scale * s_rkv / float(q[l - 1])
        r = Ciphertext(rkv[0], s1)
        k = Ciphertext(rkv[1], s1)
        v = Ciphertext(rkv[2], s1)
        # r~ = 0.25 Wr x + 0.5 (the 0.25 is already folded into the diags)
        half = ctx.encode(np.full(ctx.slots, 0.5), level=r.level,
                          scale=r.scale)
        r = ctx.add_plain(r, half)
        rk = ctx.rescale(ctx.multiply(r, k))            # l-2
        rkv_ct = ctx.rescale(ctx.multiply(rk, ctx.mod_switch_to(v, rk.level)))
        # W_o projection at l-3 -> l-4
        pto = _load_coeffs(ctx, jnp.asarray(host["o"]), rkv_ct.level)
        out = self.eng(rkv_ct, pto, pt_scale=s_o)
        x_al = ctx.mod_switch_to(ct_x, out.level)
        tgt = out.scale if exact else x_al.scale
        return ctx.add(ctx.set_scale(x_al, tgt), ctx.set_scale(out, tgt))
