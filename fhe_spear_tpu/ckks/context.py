"""CKKS context: parameters, keys, and all homomorphic operations.

TPU-native re-design of the reference's CKKS engine (PhantomFHE CUDA fork +
pybind11 surface, /root/reference/gpu/phantom_binding.cu, and the three
Python context wrappers of SURVEY.md C1).  Differences driven by the
hardware:

  * Device word is uint32 (TPU VPU has 32-bit lanes, no 64-bit multiply),
    so RNS limbs are ~28-bit primes with a ~2^28 scale instead of the
    reference's 40-60-bit primes at 2^40.  Depth budgets count limbs.
  * Every residue tensor is [.., limb, N] in NTT domain + Montgomery form;
    ops are pure jnp functions jitted with the context static, so the same
    code runs on CPU (tests), single TPU chip, and under shard_map over a
    mesh (limb axis = natural sharding axis).
  * Keyswitching is GHS/hybrid with single-limb digits and K special
    primes: the same key tensor works at every level (digit j only touches
    limb j), decomposition is a batched Barrett re-reduction, and the whole
    digit * key contraction is one fused multiply-accumulate over the digit
    axis.
  * Decryption never needs multiprecision CRT: the message magnitude is
    kept below q0/2 (the 31-bit headroom prime), so limb 0 of c0 + c1*s
    alone determines the value exactly.

Key identities (decrypt = c0 + c1*s):
  symmetric encrypt:  c1 = a (uniform),  c0 = -a*s + m + e
  keyswitch digit j:  ksk_j = (-a_j*s + e_j + P*g_j*s', a_j) over Q*P,
      where g_j is the CRT basis element of q_j: per-limb it is just
      delta_{ij} * (P mod q_j), so key limbs for specials hold no message.
  switched ct adds (sum_j D_j * ksk_j) / P  with D_j the centered
      re-reductions of the source polynomial's limb-j coefficients.

Montgomery form bookkeeping: ciphertexts/plaintexts are Mont-form (x*R).
Keyswitch keys are stored in R^2 form so that mont_mul(plain_digit, key)
lands back in Mont form with no extra conversion; scalar constants that
multiply Mont values (P^-1, q_l^-1) are stored in Mont form (c*R).
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from ..core.primes import find_ntt_primes, Prime
from ..core.ntt import NttContext, automorphism_perm
from ..core.modops import (
    mont_mul,
    mul_hi_u32,
    add_mod,
    sub_mod,
    neg_mod,
    cond_sub,
    barrett_reduce,
)
from .encoding import SlotEncoder
from .ciphertext import Ciphertext, Plaintext

__all__ = ["CkksParams", "CkksContext", "KeySwitchKey"]


@dataclass(frozen=True)
class CkksParams:
    """CKKS parameter preset.

    n:            ring dimension (power of two; n/2 complex slots).
    num_limbs:    total scale limbs L (q0 plus L-1 rescale primes);
                  fresh ciphertexts start at level L.  Plays the role of
                  the reference's L0 (scripts/bootstrap_generation.py:65).
    num_special:  K special (keyswitch) primes, the reference's P
                  (README.md:60-61) — here any K works at any L.
    scale_bits:   log2 of the default scale (rescale primes sit near it).
    """

    n: int
    num_limbs: int
    num_special: int = 1
    scale_bits: int = 28
    first_bits: int = 31
    noise_sigma: float = 3.2
    # sparse ternary secret (Hamming weight); None = dense ternary.
    # Bootstrap contexts need sparse secrets to bound the ModRaise integer
    # |I| <= O(sqrt(h)) (HEAAN-style, h=64 default in ckks/bootstrap.py).
    secret_hamming_weight: int | None = None
    # hybrid-keyswitch digit count: decompose into dnum groups of limbs
    # instead of one digit per limb.  Keys shrink by L/dnum and the
    # keyswitch does dnum (not l) digit NTT-extensions/inner products; the
    # price is num_special large enough that P = prod(special primes)
    # covers each group product (checked at context build).  None = one
    # digit per limb (exact centered extension, minimal-noise mode for
    # shallow chains where keys are small anyway).
    dnum: int | None = None
    # NTT transform backend: "stockham" (VPU butterfly chain), "pallas"
    # (same transform fused in VMEM via one Pallas kernel — bitwise- and
    # bin-order-compatible with "stockham"), or "mxu" (four-step int8-limb
    # systolic matmuls, natural bin order — see
    # parallel/ntt_fourstep.FourStepBackend).  Contexts on different bin
    # orders are functionally equivalent but not binary-compatible;
    # limb-sharded keyswitch requires bitrev ("stockham"/"pallas") order.
    ntt_backend: str = "stockham"

    @property
    def scale(self) -> float:
        return float(2.0 ** self.scale_bits)

    # -- security accounting ----------------------------------------------
    #
    # Max log2(Q*P) for 128-bit classical security with a ternary secret,
    # per the homomorphicencryption.org standard tables.  A preset whose
    # modulus exceeds this ceiling at its ring dimension does NOT provide
    # 128-bit security and is classified research-grade below.
    _LOGQP_128BIT = {1024: 27, 2048: 54, 4096: 109, 8192: 218,
                     16384: 438, 32768: 881}

    @property
    def log_qp(self) -> int:
        """Approximate total modulus bits log2(Q*P): q0 (~first_bits) +
        (L-1) scale primes (~scale_bits) + K special primes (~31 bits,
        core/primes.py:90-99)."""
        return (self.first_bits + (self.num_limbs - 1) * self.scale_bits
                + 31 * self.num_special)

    def security_statement(self) -> str:
        """Honest security classification of this parameter set.

        "standard-128": log2(QP) is within the 128-bit ceiling for this N
        (dense ternary secret assumed — a sparse secret_hamming_weight
        weakens this and is flagged).  "research-grade": the modulus
        chain exceeds every standard ceiling — these deep chains mirror
        the reference's own parameter philosophy (its N=16384 36x54-bit
        bootstrap config is equally outside the tables,
        test_fully_enc_bsgs.py:238-267) and exist to measure FHE compute,
        not to deploy as-is."""
        ceiling = self._LOGQP_128BIT.get(self.n)
        lqp = self.log_qp
        if ceiling is not None and lqp <= ceiling \
                and self.secret_hamming_weight is None:
            return (f"standard-128: log2(QP)~{lqp} <= {ceiling} "
                    f"(128-bit ceiling at N={self.n}, dense ternary secret)")
        reasons = []
        if ceiling is None or lqp > ceiling:
            reasons.append(f"log2(QP)~{lqp} > {ceiling} "
                           f"(128-bit ceiling at N={self.n})")
        if self.secret_hamming_weight is not None:
            reasons.append(f"sparse secret h={self.secret_hamming_weight} "
                           "(below dense-ternary table assumptions)")
        return "research-grade: " + "; ".join(reasons)

    # -- presets mirroring the reference's three context regimes (C1) -----

    @classmethod
    def retrieval(cls, n: int = 8192) -> "CkksParams":
        """CT-PT/CT-CT retrieval: one multiply + rescale
        (fhe_common.py:84-96: N=8192, [60,40,40,60]).

        Security: standard-128 at the default N=8192 (log2(QP)~118 of a
        218-bit ceiling); see security_statement()."""
        return cls(n=n, num_limbs=3, num_special=1)

    @classmethod
    def client_aided(cls, n: int = 8192) -> "CkksParams":
        """1-level BSGS round trips (the reference's A100 headline
        config N=8192, L0=3, P=1 — scripts/bootstrap_generation.py:1654).

        Security: standard-128 at the default N=8192 (log2(QP)~118 of
        218); see security_statement()."""
        return cls(n=n, num_limbs=3, num_special=1)

    @classmethod
    def deep(cls, n: int, depth: int, num_special: int = 1) -> "CkksParams":
        """Fully-encrypted chains: depth limbs + q0
        (fhe_rwkv_inference.py:30-44; CKKSBootstrapContext L0).

        Security: research-grade at production depths — a 59-limb 28-bit
        chain at N=8192 has log2(QP)~1900, far beyond any standard
        128-bit table (the reference's N=16384 deep configs are equally
        outside); see security_statement()."""
        return cls(n=n, num_limbs=depth + 1, num_special=num_special)

    @classmethod
    def bootstrap(cls, n: int, num_limbs: int = 22, num_special: int = 2,
                  hamming: int = 64, dnum: int | None = None) -> "CkksParams":
        """Bootstrappable: sparse secret + deep chain
        (CKKSBootstrapContext with bootstrapper, bootstrap_generation.py:61).
        At production ring sizes pass dnum (e.g. 6) + num_special ~ 4 so
        the ~126 C2S/S2C rotation keys fit in memory.

        Security: research-grade — deep modulus chain plus a sparse
        secret (h=64), both outside standard 128-bit table assumptions;
        see security_statement()."""
        return cls(n=n, num_limbs=num_limbs, num_special=num_special,
                   secret_hamming_weight=hamming, dnum=dnum)


class KeySwitchKey:
    """b, a: [dnum, L+K, N] uint32, NTT domain, R^2 form
    (digit, limb, coeff); dnum = L when digits are single limbs."""

    def __init__(self, b: jnp.ndarray, a: jnp.ndarray):
        self.b = b
        self.a = a


class CkksContext:
    """Keys + tables + homomorphic ops for one parameter set.

    Mirrors the API surface of the reference's context wrappers
    (fhe_common.py:83-216, scripts/bootstrap_generation.py:61-154):
    encrypt / encrypt_replicated / encrypt_replicated_complex /
    decrypt_vec / decrypt_vec_complex / decrypt_slot0, plus the op set of
    the pybind11 binding (add / sub / negate / multiply / multiply_plain /
    relinearize / rescale_to_next / mod_switch_to_next / rotate /
    conjugate / hoisted rotations).
    """

    def __init__(self, params: CkksParams, seed: int | None = None,
                 sk_coeff: np.ndarray | None = None):
        """seed=None (the default) draws all key/noise randomness from OS
        entropy (os.urandom via SeedSequence): every context gets a fresh
        secret key and unpredictable encryption randomness.  Pass an
        explicit integer seed ONLY for reproducible tests/benchmarks — a
        seeded context is deterministic and therefore NOT confidential
        (two contexts with the same seed share the same secret key).

        sk_coeff restores a saved secret key (see utils.serialization);
        the relinearization key is regenerated from it.
        """
        self.params = params
        self.n = params.n
        self.slots = params.n // 2
        self.L = params.num_limbs
        self.K = params.num_special
        self.scale = params.scale
        self.primes: tuple[Prime, ...] = find_ntt_primes(
            params.n, params.num_limbs, params.scale_bits, params.first_bits,
            params.num_special,
        )
        self.ntt = NttContext.build(params.n, self.primes)
        if params.ntt_backend == "mxu":
            from ..parallel.ntt_fourstep import FourStepBackend
            self.ntt = FourStepBackend(self.ntt)
        elif params.ntt_backend == "pallas":
            from ..core.ntt_pallas import PallasBackend
            self.ntt = PallasBackend(self.ntt)
        self.encoder = SlotEncoder(params.n)
        # legacy RandomState: the PCG64 Generator is pathologically slow
        # in some numpy builds (50x); MT19937 bulk sampling is not.
        # MT19937 is not itself a CSPRNG; with an os.urandom seed (128 bits
        # of entropy) its outputs are unpredictable to parties that never
        # observe raw stream values — and key/noise samples are never
        # revealed.  Deterministic mode (explicit seed) is for benchmarks.
        if seed is None:
            ss = np.random.SeedSequence(
                int.from_bytes(os.urandom(16), "little"))
            self.rng = np.random.RandomState(np.random.MT19937(ss))
        else:
            self.rng = np.random.RandomState(seed)
        self.seeded = seed is not None

        LK = self.L + self.K
        q = np.array([pr.p for pr in self.primes], dtype=np.uint64)
        self.q_np = q
        P = 1
        for pr in self.primes[self.L:]:
            P *= pr.p
        self.P_int = P

        # hybrid-keyswitch digit grouping: group size g limbs per digit
        self.dnum = params.dnum if params.dnum else self.L
        assert 1 <= self.dnum <= self.L, (self.dnum, self.L)
        self.gsize = -(-self.L // self.dnum)
        self.digit_of_limb = np.arange(self.L) // self.gsize
        self.dnum = int(self.digit_of_limb[-1]) + 1  # actual digit count
        if self.gsize > 1:
            # keyswitch noise ~ sigma*sqrt(dnum*N)*Q_j/P: require P >= Q_j
            for j in range(self.dnum):
                qj = 1
                for i in range(j * self.gsize,
                               min((j + 1) * self.gsize, self.L)):
                    qj *= int(q[i])
                assert P >= qj, (
                    f"digit group {j} product ({qj.bit_length()} bits) "
                    f"exceeds P ({P.bit_length()} bits): raise num_special "
                    f"or dnum")

        u32 = lambda x: jnp.asarray(np.asarray(x, dtype=np.uint32))
        r_of = lambda i: self.primes[i].mont_r

        # Barrett magic per prime: floor(2^32 / p)
        self.mu = u32(((1 << 32) // q)[:, None])
        # centered-extension tables: q_s mod q_t and (q_s+1)//2
        qmod = np.zeros((LK, LK), dtype=np.uint64)
        for s in range(LK):
            qmod[s] = q[s] % q
        self.q_mod = u32(qmod[:, :, None])            # [S, T, 1]
        self.q_half = u32(((q + 1) // 2)[:, None, None])  # [S, 1, 1]

        # keyswitch mod-down constants
        self.Pinv_mont = u32(
            [pow(P % int(q[i]), -1, int(q[i])) * r_of(i) % int(q[i])
             for i in range(self.L)]
        )[:, None]
        self.Pmod_mont = u32(
            [P % int(q[j]) * r_of(j) % int(q[j]) for j in range(self.L)]
        )[:, None]
        if self.K > 1:
            phat = [P // int(q[self.L + k]) for k in range(self.K)]
            self.phat_inv_mont = u32(
                [pow(phat[k] % int(q[self.L + k]), -1, int(q[self.L + k]))
                 * r_of(self.L + k) % int(q[self.L + k])
                 for k in range(self.K)]
            )[:, None]
            self.phat_mod_mont = u32(
                [[phat[k] % int(q[i]) * r_of(i) % int(q[i])
                  for i in range(self.L)] for k in range(self.K)]
            )[:, :, None]
            # centered-CRT fixed-point constants for the keyswitch
            # mod-down: v = round(sum_k y_k / p_k) via u_k ~ y_k*2^32/p_k
            # (same scheme as _digit_tables' muA/B64)
            self._sp_muA = u32(
                [(1 << 32) // int(q[self.L + k]) for k in range(self.K)]
            )[:, None]
            self._sp_B64 = u32(
                [((1 << 64) // int(q[self.L + k])) & 0xFFFFFFFF
                 for k in range(self.K)]
            )[:, None]

        # rescale constants: (q_l^-1 mod q_i) * R, lower-triangular [L, L]
        qlinv = np.zeros((self.L, self.L), dtype=np.uint64)
        for l in range(1, self.L):
            for i in range(l):
                qlinv[l, i] = pow(int(q[l]), -1, int(q[i])) * r_of(i) % int(q[i])
        self._qlinv = qlinv

        # --- keys ---
        h = params.secret_hamming_weight
        if sk_coeff is not None:
            self._sk_coeff = np.asarray(sk_coeff, dtype=np.int64)
            assert self._sk_coeff.shape == (self.n,)
        elif h is None:
            self._sk_coeff = self.rng.randint(-1, 2, size=self.n
                                              ).astype(np.int64)
        else:
            self._sk_coeff = np.zeros(self.n, dtype=np.int64)
            pos = self.rng.choice(self.n, size=h, replace=False)
            self._sk_coeff[pos] = self.rng.choice([-1, 1], size=h)
        self.s_eval = self._to_eval_mont(self._sk_coeff, tuple(range(LK)))
        self.relin_key: KeySwitchKey = self._make_ksk(
            mont_mul(self.s_eval, self.s_eval, self.ntt.p, self.ntt.pinv))
        self.galois_keys: dict[int, KeySwitchKey] = {}

    def set_secret_key(self, sk_coeff: np.ndarray) -> None:
        """Install a restored secret key on a (possibly warm) context.

        Every cached jitted kernel that baked the old key material in as a
        traced constant is dropped (encrypt/decrypt/multiply/rotate/
        hoisting and the keygen builders), the relinearization key is
        regenerated from the new secret, and galois keys are cleared
        (callers re-run ensure_galois).  Prefer constructing a fresh
        context via CkksContext(params, sk_coeff=...) when possible.
        """
        self._sk_coeff = np.asarray(sk_coeff, dtype=np.int64)
        assert self._sk_coeff.shape == (self.n,)
        LK = self.L + self.K
        self.s_eval = self._to_eval_mont(self._sk_coeff, tuple(range(LK)))
        # cached_property keygen builders close over the old s_eval
        self.__dict__.pop("_j_make_ksk", None)
        self.__dict__.pop("_j_make_ksk_batch", None)
        # lru_cache'd kernels (class-level caches keyed by self; clearing
        # drops other live contexts' entries too, which is merely a
        # re-trace cost, never a correctness issue)
        for name in ("_j_encrypt", "_j_dec_cached", "_j_mul", "_j_rotate",
                     "_j_hoisted"):
            getattr(type(self), name).cache_clear()
        self.galois_keys.clear()
        self.relin_key = self._make_ksk(
            mont_mul(self.s_eval, self.s_eval, self.ntt.p, self.ntt.pinv))

    # ------------------------------------------------------------------
    # small host/device helpers
    # ------------------------------------------------------------------

    def _reduce_rows(self, coeffs: np.ndarray, rows) -> np.ndarray:
        """Centered int64 coefficients [..., N] -> uint32 residues [..., R, N]."""
        q = self.q_np[list(rows)].astype(np.int64)
        out = coeffs[..., None, :] % q[:, None]
        return out.astype(np.uint32)

    def _to_eval_mont(self, coeffs: np.ndarray, rows: tuple) -> jnp.ndarray:
        """Centered integer coefficients -> device eval/Mont tensor [R, N]."""
        res = jnp.asarray(self._reduce_rows(coeffs, rows))
        return self._j_to_eval_mont(rows)(res)

    @functools.lru_cache(maxsize=None)
    def _j_to_eval_mont(self, rows):
        return jax.jit(lambda x: self.ntt.to_mont(self.ntt.ntt(x, rows), rows))

    def _uniform(self, shape_rows, rows) -> np.ndarray:
        """Uniform residues mod q_rows, shape [..., R, N] (R = len(rows))."""
        q = self.q_np[list(rows)]
        return self.rng.randint(
            0, q[:, None], size=shape_rows + (len(rows), self.n)
        ).astype(np.uint32)

    def _gauss(self, shape=()) -> np.ndarray:
        return np.round(
            self.rng.normal(0.0, self.params.noise_sigma, shape + (self.n,))
        ).astype(np.int64)

    def targets(self, l: int) -> tuple:
        """Active limb rows during keyswitch at level l: scale limbs + specials."""
        return tuple(range(l)) + tuple(range(self.L, self.L + self.K))

    # ------------------------------------------------------------------
    # key generation
    # ------------------------------------------------------------------

    def num_digits(self, l: int) -> int:
        """Active keyswitch digits at level l (= l for single-limb digits)."""
        return -(-l // self.gsize)

    def drop_galois_keys(self, drop=None, keep=()) -> int:
        """Free raw per-element Galois keys (the HBM price of a deep
        bootstrap config: at N=16384/L=46/dnum=6 the ~200 raw keys are
        ~9 GB, resident NEXT TO their stacked engine copies — the 17.2 GB
        that kept fe24boot off one v5e, docs/NOTES_r4.md).  Call after
        every engine's warm_stacks(); kernels evaluate from the stacks
        only.  The conjugation key (element 2n-1) is always kept —
        ctx.conjugate reads it directly at runtime — plus anything in
        `keep`.  drop=None drops everything else; otherwise only the
        given elements.  A later ensure_galois for a dropped element
        regenerates it (fresh randomness: functionally equivalent, not
        bitwise).  Returns the number of keys dropped."""
        always_keep = set(keep) | {2 * self.n - 1}
        elts = list(self.galois_keys.keys()) if drop is None else list(drop)
        n_drop = 0
        for g in elts:
            if g in always_keep or g not in self.galois_keys:
                continue
            del self.galois_keys[g]
            n_drop += 1
        # cached jitted rotate/hoisted closures bake key tensors in as
        # constants; drop them so the arrays can actually be freed
        for name in ("_j_rotate", "_j_hoisted"):
            getattr(type(self), name).cache_clear()
        return n_drop

    def identity_ksk(self) -> KeySwitchKey:
        """Keyswitch key for s -> s (the identity rotation).  Used where a
        stacked-rotation kernel meets a step whose Galois element is 1
        (rotation ≡ 0 mod slots) so every lane runs the same keyswitch
        code; also keeps the sharded BSGS body uniform across devices."""
        if not hasattr(self, "_identity_ksk"):
            ksk = self._make_ksk(self.s_eval)
            # a lazily-created identity key after shard_eval_keys() must
            # get the same limb padding + placement as every other eval
            # key, or a later jnp.stack with padded rotation keys fails
            # on shape mismatch (ADVICE r4 #3; mirrors the ensure_galois
            # hook above)
            if getattr(self, "_eval_key_sharding", None) is not None:
                ksk = KeySwitchKey(*self._eval_key_put(ksk.b, ksk.a))
            self._identity_ksk = ksk
        return self._identity_ksk

    def _make_ksk(self, sprime_eval: jnp.ndarray) -> KeySwitchKey:
        """Keyswitch key for s' -> s.  sprime_eval: [L+K, N] eval/Mont."""
        LK = self.L + self.K
        all_rows = tuple(range(LK))
        a = jnp.asarray(self._uniform((self.dnum,), all_rows))  # Mont by fiat
        e = jnp.asarray(self._reduce_rows(self._gauss((self.dnum,)), all_rows))
        return self._j_make_ksk(a, e, sprime_eval)

    def _ksk_add_msg(self, b: jnp.ndarray, sprime_eval: jnp.ndarray
                     ) -> jnp.ndarray:
        """Add the digit messages to b [dnum, L+K, N]: digit j carries
        (P mod q_i) * s' on every limb i of group j (zero on other limbs
        and on specials, since P | P*g_j there) — level-independent."""
        ntt = self.ntt
        msg = mont_mul(sprime_eval[: self.L], self.Pmod_mont,
                       ntt.p[: self.L], ntt.pinv[: self.L])        # [L, N]
        dof = jnp.asarray(self.digit_of_limb.astype(np.int32))
        limb = jnp.arange(self.L)
        return b.at[dof, limb].set(
            add_mod(b[dof, limb], msg, ntt.p[: self.L, 0][:, None]))

    @functools.cached_property
    def _j_make_ksk(self):
        LK = self.L + self.K
        all_rows = tuple(range(LK))

        def build(a, e, sprime_eval):
            ntt = self.ntt
            e_ev = ntt.to_mont(ntt.ntt(e, all_rows), all_rows)
            b = add_mod(
                neg_mod(mont_mul(a, self.s_eval, ntt.p, ntt.pinv), ntt.p),
                e_ev, ntt.p)
            b = self._ksk_add_msg(b, sprime_eval)
            # store in R^2 form
            return (ntt.to_mont(b, all_rows), ntt.to_mont(a, all_rows))

        jb = jax.jit(build)
        def make(a, e, sp):
            b2, a2 = jb(a, e, sp)
            return KeySwitchKey(b2, a2)
        return make

    def shard_eval_keys(self, sharding) -> None:
        """Re-place every evaluation key (relin + galois + identity) with
        `sharding` — a NamedSharding partitioning the LIMB axis (axis 1 of
        the [dnum, L+K, N] key tensors), e.g.
        NamedSharding(mesh, PartitionSpec(None, "limb", None)).

        This is the RNS-limb sharding axis of BASELINE.json applied to the
        dominant HBM residents: at N=16384/L=59 the 89-key rotation set is
        ~6.3 GB and each level's gathered key stack ~6 GB (docs/NOTES_r3.md
        postmortem) — sharded over d devices both divide by d.  Downstream
        kernels need no code changes: jit propagates the committed input
        shardings and the XLA SPMD partitioner splits the keyswitch
        contraction over limb rows, inserting collectives only at the
        digit-extension boundary (the one cross-limb step).  Explicit
        shardings require the limb dimension divisible by the mesh, so the
        row axis is zero-padded to the next multiple — pad rows are never
        selected by targets(l), and values are unchanged, so results stay
        bitwise identical to the single-device kernel."""
        import numpy as _np

        axis1 = sharding.spec[1]
        div = int(_np.prod([sharding.mesh.shape[a] for a in
                            ((axis1,) if isinstance(axis1, str) else axis1)]))
        LK = self.L + self.K
        pad = (-LK) % div

        def padded(x):
            return jnp.pad(x, ((0, 0), (0, pad), (0, 0))) if pad else x

        put = jax.jit(lambda b, a: (padded(b), padded(a)),
                      out_shardings=(sharding, sharding))
        self.relin_key = KeySwitchKey(*put(self.relin_key.b,
                                           self.relin_key.a))
        for g, k in list(self.galois_keys.items()):
            self.galois_keys[g] = KeySwitchKey(*put(k.b, k.a))
        if hasattr(self, "_identity_ksk"):
            self._identity_ksk = KeySwitchKey(*put(self._identity_ksk.b,
                                                   self._identity_ksk.a))
        self._eval_key_sharding = sharding
        self._eval_key_pad = pad
        self._eval_key_put = put

    def galois_element(self, steps: int) -> int:
        """Galois element for a cyclic slot rotation by `steps` (left).

        Mirrors compute_rotation_galois_elements of the reference
        (scripts/bootstrap_generation.py:18-33): 5^steps mod 2N; the
        conjugation element is 2N-1.
        """
        return pow(5, steps % (self.n // 2), 2 * self.n)

    CONJ = "conj"

    def ensure_galois(self, steps_list, conj: bool = False) -> None:
        """Generate (once) the rotation keys for the given step set.

        All missing keys are generated in ONE batched jitted call — with a
        remote device every per-key dispatch is a round trip, so batching
        turns O(keys) round trips into O(1)."""
        gs = [self.galois_element(s) for s in steps_list]
        if conj:
            gs.append(2 * self.n - 1)
        gs = sorted({g for g in gs if g not in self.galois_keys and g != 1})
        if not gs:
            return
        LK = self.L + self.K
        all_rows = tuple(range(LK))
        m = len(gs)
        # chunked batches: one full-width batch holds 2x [m, dnum, LK, N]
        # inputs + outputs live at once — at deep-chain parameters
        # (L ~ 60, N = 16384) that is ~19 GB of transients on a 16 GB
        # chip.  16 keys per batch keeps the keygen transient ~1 GB while
        # preserving the seeded RNG stream (draws happen in the same
        # order).  Only the final per-key buffers stay resident.
        ch = 16
        for c0 in range(0, m, ch):
            sub = gs[c0: c0 + ch]
            perms = np.stack([self.ntt.autoperm(g) for g in sub])
            a = jnp.asarray(self._uniform((len(sub), self.dnum), all_rows))
            e = jnp.asarray(self._reduce_rows(
                self._gauss((len(sub), self.dnum)), all_rows))
            b2, a2 = self._j_make_ksk_batch(jnp.asarray(perms), a, e)
            del a, e
            for i, g in enumerate(sub):
                self.galois_keys[g] = KeySwitchKey(b2[i], a2[i])
            del b2, a2
        if getattr(self, "_eval_key_sharding", None) is not None:
            for g in gs:
                k = self.galois_keys[g]
                self.galois_keys[g] = KeySwitchKey(
                    *self._eval_key_put(k.b, k.a))

    @functools.cached_property
    def _j_make_ksk_batch(self):
        LK = self.L + self.K
        all_rows = tuple(range(LK))

        def build_one(perm, a, e):
            ntt = self.ntt
            sprime = jnp.take(self.s_eval, perm, axis=-1)
            e_ev = ntt.to_mont(ntt.ntt(e, all_rows), all_rows)
            b = add_mod(
                neg_mod(mont_mul(a, self.s_eval, ntt.p, ntt.pinv), ntt.p),
                e_ev, ntt.p)
            b = self._ksk_add_msg(b, sprime)
            return ntt.to_mont(b, all_rows), ntt.to_mont(a, all_rows)

        return jax.jit(jax.vmap(build_one))

    # ------------------------------------------------------------------
    # encode / encrypt / decrypt
    # ------------------------------------------------------------------

    def encode(self, vec, level: int | None = None, scale: float | None = None
               ) -> Plaintext:
        """Encode complex/real slots into an NTT-domain plaintext."""
        level = self.L if level is None else level
        scale = self.scale if scale is None else scale
        coeffs = self.encoder.encode(np.asarray(vec), scale,
                                     wide=scale > 2.0 ** 31)
        rows = tuple(range(level))
        return Plaintext(self._to_eval_mont(coeffs, rows), scale)

    def encode_const(self, c: complex, level: int | None = None,
                     scale: float | None = None) -> Plaintext:
        """Exact constant plaintext at ANY scale (beyond the encoder's
        2^31 coefficient limit): the constant c occupies coefficient 0
        (Re) and coefficient N/2 (Im) only — X^(N/2) evaluates to i in
        every slot since 5^j = 1 mod 4 — and the residues are reduced
        with python ints, so wide scales (e.g. Delta^2 ~ 2^56 in the
        wide-EvalMod bootstrap) stay exact."""
        level = self.L if level is None else level
        scale = self.scale if scale is None else scale
        c = complex(c)
        vre = int(round(c.real * scale))
        vim = int(round(c.imag * scale))
        res = np.zeros((level, self.n), dtype=np.uint32)
        for i in range(level):
            q = int(self.q_np[i])
            res[i, 0] = vre % q
            res[i, self.n // 2] = vim % q
        rows = tuple(range(level))
        p = self._j_to_eval_mont(rows)(jnp.asarray(res))
        return Plaintext(p, scale)

    def encrypt(self, vec, level: int | None = None, scale: float | None = None
                ) -> Ciphertext:
        """Symmetric encryption (the reference encrypts symmetrically too,
        scripts/bootstrap_generation.py:122-133)."""
        level = self.L if level is None else level
        scale = self.scale if scale is None else scale
        # composite (width-2) scales exceed the int32 encode word; the
        # reduce below is host-side int64-exact, so just widen the bound
        coeffs = self.encoder.encode(np.asarray(vec), scale,
                                     wide=scale > 2.0 ** 31)
        rows = tuple(range(level))
        lead = coeffs.shape[:-1]
        m = jnp.asarray(self._reduce_rows(coeffs, rows))
        a = jnp.asarray(self._uniform(lead, rows))
        e = jnp.asarray(self._reduce_rows(self._gauss(lead), rows))
        return Ciphertext(self._j_encrypt(rows)(m, a, e), scale)

    @functools.lru_cache(maxsize=None)
    def _j_encrypt(self, rows):
        def enc(m, a, e):
            ntt = self.ntt
            p, pinv = _sel(ntt.p, rows), _sel(ntt.pinv, rows)
            me = ntt.to_mont(ntt.ntt(add_mod(m, jnp.zeros_like(m), p), rows), rows)
            ee = ntt.to_mont(ntt.ntt(e, rows), rows)
            c0 = add_mod(
                add_mod(neg_mod(mont_mul(a, _sel(self.s_eval, rows), p, pinv), p),
                        me, p), ee, p)
            return jnp.stack([c0, a], axis=-3)
        return jax.jit(enc)

    def encrypt_replicated(self, x, level=None, scale=None) -> Ciphertext:
        """Encrypt x tiled across all slots (fhe_common.py / ckks.encrypt_replicated)."""
        x = np.asarray(x)
        reps = self.slots // x.shape[-1]
        return self.encrypt(np.tile(x, reps), level, scale)

    def encrypt_replicated_complex(self, z, level=None, scale=None) -> Ciphertext:
        z = np.asarray(z, dtype=np.complex128)
        reps = self.slots // z.shape[-1]
        return self.encrypt(np.tile(z, reps), level, scale)

    def decrypt_to_coeffs(self, ct: Ciphertext) -> np.ndarray:
        """Decrypt to centered integer coefficients.

        Uses the first min(2, level) limbs only: with one limb the value is
        exact while |v| < q0/2 (headroom ~8x the scale); at level >= 2 a
        two-limb uint64 CRT raises headroom to q0*q1/2 (~2^30 x the scale),
        enough for any RWKV activation or logit magnitude.  A ciphertext
        at a composite (width-2, ~2^56) scale carries ~2^56-2^58
        coefficients — past the 2-limb range — so those use a third limb
        (|v| < 2^62 int64-exact; see compose_coeffs).  No multiprecision
        arithmetic is ever needed.
        """
        nl = min(3 if ct.scale > 2.0 ** 40 else 2, ct.level)
        limbs = np.asarray(self._j_dec_cached(ct.level, nl)(ct.c))
        return self.compose_coeffs(limbs)

    def compose_coeffs(self, limbs: np.ndarray) -> np.ndarray:
        """uint32 residue limbs [..., nl, N] (nl = 1, 2 or 3, coefficient
        domain, plain) -> centered float64 coefficients via exact uint64
        CRT.  Shared by decrypt and the fused-round-trip client path.

        nl=3 (composite-scale decrypt): the 2-limb value v01 is lifted
        with a centered third-limb correction k = [(t2 - v01)/q0q1 mod q2]
        so v = v01 + q0*q1*k — exact in int64 while |v| < 2^62 (always
        true for well-formed width-2 ciphertexts: |coeff| <~ mag*2^56)."""
        limbs = limbs.astype(np.uint64)
        q0 = int(self.q_np[0])
        if limbs.shape[-2] == 1:
            c = limbs[..., 0, :].astype(np.int64)
            c[c > q0 // 2] -= q0
            return c.astype(np.float64)
        q1 = int(self.q_np[1])
        t0, t1 = limbs[..., 0, :], limbs[..., 1, :]
        q0inv = np.uint64(pow(q0, -1, q1))
        d = (t1 + np.uint64(q1) - t0 % np.uint64(q1)) % np.uint64(q1)
        m1 = d * q0inv % np.uint64(q1)
        v = t0 + np.uint64(q0) * m1          # exact: < q0*q1 < 2^62
        big = q0 * q1
        if limbs.shape[-2] == 2:
            out = v.astype(np.float64)
            out[v > big // 2] -= float(big)
            return out
        q2 = int(self.q_np[2])
        t2 = limbs[..., 2, :]
        q01inv = np.uint64(pow(big % q2, -1, q2))
        d2 = (t2 + np.uint64(q2) - v % np.uint64(q2)) % np.uint64(q2)
        k = (d2 * q01inv % np.uint64(q2)).astype(np.int64)
        k[k > q2 // 2] -= q2                 # centered: |k| small for
        #                                      well-formed values
        vi = v.astype(np.int64) + np.int64(big) * k
        return vi.astype(np.float64)

    @functools.lru_cache(maxsize=None)
    def _j_dec_cached(self, level, nl):
        rows = tuple(range(nl))

        def dec(c):
            ntt = self.ntt
            p, pinv = ntt.p[:nl], ntt.pinv[:nl]
            v = add_mod(c[..., 0, :nl, :],
                        mont_mul(c[..., 1, :nl, :], self.s_eval[:nl], p, pinv),
                        p)
            return ntt.from_mont(ntt.intt(v, rows), rows)
        return jax.jit(dec)

    def decrypt_vec_complex(self, ct: Ciphertext, length: int | None = None
                            ) -> np.ndarray:
        z = self.encoder.decode(self.decrypt_to_coeffs(ct), ct.scale)
        return z if length is None else z[:length]

    def decrypt_vec(self, ct: Ciphertext, length: int | None = None) -> np.ndarray:
        return self.decrypt_vec_complex(ct, length).real

    def decrypt_slot0(self, ct: Ciphertext) -> float:
        return float(self.decrypt_vec_complex(ct, 1)[0].real)

    # ------------------------------------------------------------------
    # arithmetic (thin wrappers around cached jitted kernels)
    # ------------------------------------------------------------------

    @functools.lru_cache(maxsize=None)
    def _p(self, l):
        # HOST numpy tables: an eager device-array slice is a dynamic_slice
        # dispatch the axon TPU tunnel cannot run (and _p is called eagerly
        # at kernel-build time); device arrays must not be cached either —
        # inside a shard_map trace they'd be trace-local tracers.  numpy
        # constants are valid in any trace and lifted at bind time.
        p = np.array([q.p for q in self.primes[:l]],
                     dtype=np.uint32)[:, None]
        pinv = np.array([q.mont_pinv for q in self.primes[:l]],
                        dtype=np.uint32)[:, None]
        return p, pinv

    def add(self, x: Ciphertext, y: Ciphertext) -> Ciphertext:
        assert x.level == y.level and _close(x.scale, y.scale), (x.scale, y.scale)
        return Ciphertext(self._j_add(x.level)(x.c, y.c), x.scale)

    @functools.lru_cache(maxsize=None)
    def _j_add(self, l):
        return jax.jit(lambda a, b: add_mod(a, b, self.ntt.p[:l]))

    def sub(self, x: Ciphertext, y: Ciphertext) -> Ciphertext:
        assert x.level == y.level and _close(x.scale, y.scale)
        return Ciphertext(self._j_sub(x.level)(x.c, y.c), x.scale)

    @functools.lru_cache(maxsize=None)
    def _j_sub(self, l):
        return jax.jit(lambda a, b: sub_mod(a, b, self.ntt.p[:l]))

    def negate(self, x: Ciphertext) -> Ciphertext:
        return Ciphertext(self._j_neg(x.level)(x.c), x.scale)

    @functools.lru_cache(maxsize=None)
    def _j_neg(self, l):
        return jax.jit(lambda a: neg_mod(a, self.ntt.p[:l]))

    def add_plain(self, x: Ciphertext, pt: Plaintext) -> Ciphertext:
        assert _close(x.scale, pt.scale) and x.level == pt.level
        return Ciphertext(self._j_addp(x.level)(x.c, pt.p), x.scale)

    @functools.lru_cache(maxsize=None)
    def _j_addp(self, l):
        def f(c, p):
            c0 = add_mod(c[..., 0, :, :], p, self.ntt.p[:l])
            return c.at[..., 0, :, :].set(c0)
        return jax.jit(f)

    def mul_plain(self, x: Ciphertext, pt: Plaintext) -> Ciphertext:
        assert x.level == pt.level, (x.level, pt.level)
        return Ciphertext(self._j_mulp(x.level)(x.c, pt.p), x.scale * pt.scale)

    @functools.lru_cache(maxsize=None)
    def _j_mulp(self, l):
        p, pinv = self._p(l)
        return jax.jit(lambda c, q: mont_mul(c, q, p, pinv))

    def mul_scalar(self, x: Ciphertext, value: float,
                   scale: float | None = None) -> Ciphertext:
        """Multiply by a plaintext scalar: a constant polynomial is constant
        across the evaluation domain, so this is one Montgomery multiply by
        a per-limb residue — no encoding, no NTT (the "direct RNS scalar
        mult" fast path of the reference fork, SURVEY.md N1).  Consumes
        scale like mul_plain; rescale afterwards as usual."""
        scale = self.scale if scale is None else scale
        v = int(round(value * scale))
        l = x.level
        r = np.array([v % int(self.q_np[i]) for i in range(l)],
                     dtype=np.uint64)
        r = r * np.array([self.primes[i].mont_r for i in range(l)],
                         dtype=object) % np.array(
                             [int(self.q_np[i]) for i in range(l)], dtype=object)
        const = jnp.asarray(np.asarray(r, dtype=np.uint64)
                            .astype(np.uint32)[:, None])
        return Ciphertext(self._j_mulc(l)(x.c, const), x.scale * scale)

    @functools.lru_cache(maxsize=None)
    def _j_mulc(self, l):
        p, pinv = self._p(l)
        return jax.jit(lambda c, k: mont_mul(c, k, p, pinv))

    def scale_to(self, x: Ciphertext, target: float | None = None,
                 exact: bool = False) -> Ciphertext:
        """Normalize x to scale exactly `target` (default ctx.scale) by one
        adjusting scalar multiply + as many rescales as needed.  Used at
        bootstrap stage boundaries where matrix/constant scales pile up.

        exact=True narrows the retag shortcut from 1e-4 to float-ulp: a
        1e-4 retag is one-shot fine, but a chain of CT-CT squares doubles
        the true-vs-tag deviation per block, so exact-scale consumers
        (the fully-encrypted chain's bootstrap boundary) must pay the
        adjust multiply instead (ADVICE r3 #1)."""
        target = self.scale if target is None else target
        tol = 1e-12 if exact else 1e-4
        if abs(x.scale - target) <= tol * target:
            # retag: value error bounded by the relative scale gap
            return Ciphertext(x.c, target)
        # pick k rescales so the adjusting factor is >= 2^20 (scalar
        # rounding error then <= 2^-21); works for x.scale below target
        # too (the adjusting multiply can exceed 1)
        prod, k = 1.0, 0
        while target * prod / x.scale < (1 << 20) and k < x.level - 1:
            k += 1
            prod *= float(self.q_np[x.level - k])
        adj = target * prod / x.scale
        assert adj >= 1.0, (x.scale, target, "scale gap too large to bridge")
        # split into factors < 2^31 (several scalar mults, no extra level)
        while adj > float(1 << 30):
            x = self.mul_scalar(x, 1.0, scale=float(1 << 24))
            adj /= float(1 << 24)
        x = self.mul_scalar(x, 1.0, scale=adj)
        for _ in range(k):
            x = self.rescale(x)
        return Ciphertext(x.c, target)  # kill float round-off in the tag

    def multiply(self, x: Ciphertext, y: Ciphertext, relin: bool = True
                 ) -> Ciphertext:
        """CT x CT multiply (+ relinearize)."""
        assert x.level == y.level
        c = self._j_mul(x.level, relin)(x.c, y.c)
        return Ciphertext(c, x.scale * y.scale)

    @functools.lru_cache(maxsize=None)
    def _j_mul(self, l, relin):
        p, pinv = self._p(l)
        rk = self.relin_key

        def f(x, y):
            x0, x1 = x[..., 0, :, :], x[..., 1, :, :]
            y0, y1 = y[..., 0, :, :], y[..., 1, :, :]
            d0 = mont_mul(x0, y0, p, pinv)
            d1 = add_mod(mont_mul(x0, y1, p, pinv),
                         mont_mul(x1, y0, p, pinv), p)
            d2 = mont_mul(x1, y1, p, pinv)
            if not relin:
                return jnp.stack([d0, d1, d2], axis=-3)
            D = self._decompose(d2, l)
            kb, ka = self.select_key(rk, l)
            ks = self._mod_down(self._apply_ksk(D, kb, ka, l), l)
            return jnp.stack([add_mod(d0, ks[..., 0, :, :], p),
                              add_mod(d1, ks[..., 1, :, :], p)], axis=-3)
        return jax.jit(f)

    def square(self, x: Ciphertext) -> Ciphertext:
        return self.multiply(x, x)

    def rescale(self, x: Ciphertext) -> Ciphertext:
        l = x.level
        assert l >= 2, "cannot rescale at level 1"
        return Ciphertext(self._j_rescale(l)(x.c),
                          x.scale / float(self.q_np[l - 1]))

    def _rescale_core(self, c, l):
        """[..., l, N] Mont eval -> [..., l-1, N]: exact divide by q_{l-1}."""
        ntt = self.ntt
        rows = tuple(range(l - 1))
        qlinv = jnp.asarray(self._qlinv[l - 1, : l - 1, None].astype(np.uint32))
        p, pinv = self._p(l - 1)
        last = ntt.from_mont(ntt.intt(c[..., l - 1:, :], (l - 1,)), (l - 1,))
        u = self._extend_centered(last, (l - 1,), rows)[..., 0, :, :]
        u = ntt.to_mont(ntt.ntt(u, rows), rows)
        return mont_mul(sub_mod(c[..., : l - 1, :], u, p), qlinv, p, pinv)

    @functools.lru_cache(maxsize=None)
    def _j_rescale(self, l):
        return jax.jit(lambda c: self._rescale_core(c, l))

    def mod_drop(self, x: Ciphertext, levels: int = 1) -> Ciphertext:
        """CKKS mod_switch_to_next^levels: drop trailing limb rows (exact)."""
        assert x.level - levels >= 1
        return Ciphertext(x.c[..., : x.level - levels, :], x.scale)

    def mod_switch_to(self, x: Ciphertext, level: int) -> Ciphertext:
        assert level <= x.level
        return self.mod_drop(x, x.level - level) if level < x.level else x

    def set_scale(self, x: Ciphertext, scale: float) -> Ciphertext:
        return Ciphertext(x.c, float(scale))

    # ------------------------------------------------------------------
    # keyswitch internals (called inside jitted kernels)
    # ------------------------------------------------------------------

    def _extend_centered(self, coeffs: jnp.ndarray, src_rows: tuple,
                         tgt_rows: tuple) -> jnp.ndarray:
        """Plain coefficients [..., S, N] (row s mod q_src[s]) ->
        [..., S, T, N]: centered lift re-reduced modulo each target prime."""
        src = np.asarray(src_rows, dtype=np.int32)
        tgt = np.asarray(tgt_rows, dtype=np.int32)
        c = coeffs[..., :, None, :]
        p_t = self.ntt.p[tgt][None, :, :]          # [1, T, 1]
        mu_t = self.mu[tgt][None, :, :]
        r = barrett_reduce(c, p_t, mu_t)
        fix = p_t - self.q_mod[src][:, tgt]        # [S, T, 1], in (0, p_t]
        r_neg = cond_sub(r + fix, p_t)
        return jnp.where(c >= self.q_half[src], r_neg, r)

    @functools.lru_cache(maxsize=None)
    def _digit_tables(self, l: int) -> dict:
        """Host-precomputed constants for the grouped fast base conversion
        at level l.  Group j's active members are limbs
        [j*g, min((j+1)*g, l)); ragged groups are zero-padded to g."""
        g, d_l = self.gsize, self.num_digits(l)
        tgt = self.targets(l)
        T = len(tgt)
        q = self.q_np
        r_of = lambda i: self.primes[i].mont_r

        limb_idx = np.zeros((d_l, g), dtype=np.int32)
        mask = np.zeros((d_l, g), dtype=bool)
        hatinv_r = np.zeros((d_l, g, 1), dtype=np.uint32)
        muA = np.zeros((d_l, g, 1), dtype=np.uint32)
        B64 = np.zeros((d_l, g, 1), dtype=np.uint32)
        qhat_r = np.zeros((d_l, g, T, 1), dtype=np.uint32)
        qj_r = np.zeros((d_l, T, 1), dtype=np.uint32)
        for j in range(d_l):
            mem = list(range(j * g, min((j + 1) * g, l)))
            qj = 1
            for i in mem:
                qj *= int(q[i])
            for t_i, t in enumerate(tgt):
                qj_r[j, t_i, 0] = qj % int(q[t]) * r_of(t) % int(q[t])
            for m_i, i in enumerate(mem):
                limb_idx[j, m_i] = i
                mask[j, m_i] = True
                qhat = qj // int(q[i])
                hatinv_r[j, m_i, 0] = (pow(qhat % int(q[i]), -1, int(q[i]))
                                       * r_of(i) % int(q[i]))
                muA[j, m_i, 0] = (1 << 32) // int(q[i])
                B64[j, m_i, 0] = ((1 << 64) // int(q[i])) & 0xFFFFFFFF
                for t_i, t in enumerate(tgt):
                    qhat_r[j, m_i, t_i, 0] = (qhat % int(q[t]) * r_of(t)
                                              % int(q[t]))
        li = np.clip(limb_idx, 0, l - 1)
        # cached as NUMPY (a jnp.asarray here could run inside a jit trace
        # and cache a leaked tracer); _fbc_digits converts at use site —
        # they are tiny constants folded into each compiled kernel
        return {
            "limb_idx": li,
            "hatinv_r": hatinv_r,
            "p_mem": np.asarray(self.ntt.p)[li],
            "pinv_mem": np.asarray(self.ntt.pinv)[li],
            "muA": muA, "B64": B64,
            "qhat_r": qhat_r, "qj_r": qj_r,
        }

    def _fbc_digits(self, coeffs: jnp.ndarray, l: int) -> jnp.ndarray:
        """Grouped digits via approximate-centered fast base conversion.

        coeffs: [..., l, N] plain coefficient-domain residues.  Returns
        [..., d_l, T, N]: for each group j, an integer representative of
        c mod Q_j extended to all target limbs.  The centering correction
        v = round(sum_i y_i / q_i) is computed in 32-bit fixed point with
        error <= 2g ulps of 2^-32 — an off-by-one v changes the
        representative by Q_j (correctness mod Q_j unaffected; only a
        rare, bounded noise increment since P >= Q_j).
        """
        tb = {k: jnp.asarray(v) for k, v in self._digit_tables(l).items()}
        tgt = self.targets(l)
        p_t, pinv_t = _sel(self.ntt.p, tgt), _sel(self.ntt.pinv, tgt)
        g = self.gsize
        # y_i = [c * Qhat_i^-1]_{q_i}, zero on padded members
        y = coeffs[..., tb["limb_idx"], :]                 # [..., d_l, g, N]
        y = mont_mul(y, tb["hatinv_r"], tb["p_mem"], tb["pinv_mem"])
        # v: fixed-point round(sum y_i / q_i); u_i ~ floor(y_i * 2^32 / q_i)
        u = y * tb["muA"] + mul_hi_u32(y, tb["B64"])       # wrapping low mul
        lo = u[..., 0, :]
        hi = jnp.zeros_like(lo)
        for i in range(1, g):
            t = u[..., i, :]
            lo2 = lo + t
            hi = hi + (lo2 < t).astype(jnp.uint32)
            lo = lo2
        v = hi + (lo >> 31)                                # [..., d_l, N]
        # D_j[t] = sum_i y_i * Qhat_i - v * Q_j  (mod q_t)
        prod = mont_mul(y[..., :, :, None, :], tb["qhat_r"], p_t, pinv_t)
        acc = prod[..., 0, :, :]
        for i in range(1, g):
            acc = add_mod(acc, prod[..., i, :, :], p_t)
        vq = mont_mul(v[..., :, None, :], tb["qj_r"], p_t, pinv_t)
        return sub_mod(acc, vq, p_t)

    def _decompose(self, c1: jnp.ndarray, l: int) -> jnp.ndarray:
        """[l, N] Mont eval -> extended digits [d_l, T, N], plain, eval
        (d_l = l for single-limb digits, ceil(l/gsize) when dnum is set)."""
        ntt = self.ntt
        rows = tuple(range(l))
        tgt = self.targets(l)
        coeffs = ntt.from_mont(ntt.intt(c1, rows), rows)
        if self.gsize == 1:
            D = self._extend_centered(coeffs, rows, tgt)
        else:
            D = self._fbc_digits(coeffs, l)
        return ntt.ntt(D, tgt)

    def select_key(self, ksk: KeySwitchKey, l: int):
        """Slice a keyswitch key down to the digits/rows active at level l.

        The selection runs through a cached jitted gather: an eager gather
        dispatch is unimplemented over the axon TPU tunnel (and _xs key
        stacking calls this eagerly at kernel-build time)."""
        return self._j_select_key(self.num_digits(l), self.targets(l))(
            ksk.b, ksk.a)

    @functools.lru_cache(maxsize=None)
    def _j_select_key(self, d_l: int, tgt: tuple):
        idx = np.asarray(tgt, dtype=np.int32)
        return jax.jit(lambda b, a: (b[:d_l][:, idx], a[:d_l][:, idx]))

    def _apply_ksk(self, D: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray,
                   l: int) -> jnp.ndarray:
        """sum_j D_j * key_j over digits -> [..., 2, T, N] Mont eval.

        b, a: level-selected key tensors [(...,) d_l, T, N] (see
        select_key) — explicit arrays so callers can scan over stacked
        rotation keys."""
        tgt = np.asarray(self.targets(l), dtype=np.int32)
        p_t, pinv_t = self.ntt.p[tgt], self.ntt.pinv[tgt]
        pb = mont_mul(D, b, p_t, pinv_t)
        pa = mont_mul(D, a, p_t, pinv_t)
        ks0, ks1 = pb[..., 0, :, :], pa[..., 0, :, :]
        for j in range(1, D.shape[-3]):
            ks0 = add_mod(ks0, pb[..., j, :, :], p_t)
            ks1 = add_mod(ks1, pa[..., j, :, :], p_t)
        return jnp.stack([ks0, ks1], axis=-3)

    def _mod_down(self, ks: jnp.ndarray, l: int) -> jnp.ndarray:
        """[2, l+K, N] Mont eval over Q_l*P -> [2, l, N] Mont eval over Q_l
        (divide by P, CENTERED fast base conversion).

        Centering matters: the plain (non-centered) CRT recombination
        leaves a representative error of ~K/2 integer units per
        coefficient — P-independent, K-proportional — which convolves
        with the secret on the c1 side and random-walks across the ~90
        keyswitches of a D=2048 BSGS call to ~7e-4 of slot error (the
        round-4 fe19 probe: K=8 -> 6.8e-4, K=12 -> 9.9e-4, K=2
        single-limb -> 1.6e-4; docs/NOTES_r4.md).  With the centering
        correction v = round(sum_k y_k / P_hat-weights) — same fixed-point
        scheme as _fbc_digits — the representative error drops to <= 1
        unit (v off-by-ones are rare and bounded)."""
        ntt = self.ntt
        rows = tuple(range(l))
        sp_rows = tuple(range(self.L, self.L + self.K))
        p, pinv = self._p(l)
        t = ntt.from_mont(ntt.intt(ks[..., l:, :], sp_rows), sp_rows)  # [.., K, N]
        if self.K > 1:
            y = mont_mul(t, self.phat_inv_mont,
                         _sel(ntt.p, sp_rows), _sel(ntt.pinv, sp_rows))
            # v = round(sum_k y_k / p_k), 32-bit fixed point (error <= 2K
            # ulps of 2^-32; an off-by-one shifts the representative by P,
            # i.e. the result by one unit — rare, bounded)
            u32f = y * self._sp_muA + mul_hi_u32(y, self._sp_B64)
            lo = u32f[..., 0, :]
            hi = jnp.zeros_like(lo)
            for k in range(1, self.K):
                tk = u32f[..., k, :]
                lo2 = lo + tk
                hi = hi + (lo2 < tk).astype(jnp.uint32)
                lo = lo2
            v = hi + (lo >> 31)                                 # [.., N]
            r = barrett_reduce(y[..., :, None, :], _sel(ntt.p, rows)[None],
                               _sel(self.mu, rows)[None])       # [.., K, l, N]
            r = mont_mul(r, self.phat_mod_mont[:, :l], _sel(ntt.p, rows),
                         _sel(ntt.pinv, rows))
            u = r[..., 0, :, :]
            for k in range(1, self.K):
                u = add_mod(u, r[..., k, :, :], p)
            vq = mont_mul(v[..., None, :], self.Pmod_mont[:l], p, pinv)
            u = sub_mod(u, vq, p)
        else:
            # K=1: centered lift of the single special residue
            u = self._extend_centered(t, sp_rows, rows)[..., 0, :, :]
        u = ntt.to_mont(ntt.ntt(u, rows), rows)
        return mont_mul(sub_mod(ks[..., :l, :], u, p), self.Pinv_mont[:l],
                        p, pinv)

    # ------------------------------------------------------------------
    # rotations
    # ------------------------------------------------------------------

    def rotate(self, x: Ciphertext, steps: int) -> Ciphertext:
        """Cyclic slot rotation by `steps` (slot j <- slot j+steps)."""
        if steps % self.slots == 0:
            return x
        g = self.galois_element(steps)
        assert g in self.galois_keys, f"missing galois key for step {steps}"
        return Ciphertext(self._j_rotate(x.level, g)(x.c), x.scale)

    def conjugate(self, x: Ciphertext) -> Ciphertext:
        g = 2 * self.n - 1
        assert g in self.galois_keys, "missing conjugation key"
        return Ciphertext(self._j_rotate(x.level, g)(x.c), x.scale)

    @functools.lru_cache(maxsize=None)
    def _j_rotate(self, l, g):
        perm = jnp.asarray(self.ntt.autoperm(g))
        ksk = self.galois_keys[g]
        p, _ = self._p(l)

        def f(c):
            cp = jnp.take(c, perm, axis=-1)
            D = self._decompose(cp[..., 1, :, :], l)
            kb, ka = self.select_key(ksk, l)
            ks = self._mod_down(self._apply_ksk(D, kb, ka, l), l)
            return jnp.stack([add_mod(cp[..., 0, :, :], ks[..., 0, :, :], p),
                              ks[..., 1, :, :]], axis=-3)
        return jax.jit(f)

    def hoisted_rotations(self, x: Ciphertext, steps: tuple) -> list[Ciphertext]:
        """Rotate one ciphertext by many steps, sharing the digit
        decomposition (the reference's `hoisting`,
        gpu/phantom_binding.cu:196-205).  Step 0 passes through."""
        steps = tuple(steps)
        cs = self._j_hoisted(x.level, steps)(x.c)
        return [Ciphertext(c, x.scale) for c in cs]

    @functools.lru_cache(maxsize=None)
    def _j_hoisted(self, l, steps):
        gs = [self.galois_element(s) for s in steps]
        perms = {g: jnp.asarray(self.ntt.autoperm(g)) for g in gs}
        p, _ = self._p(l)

        def f(c):
            D = self._decompose(c[..., 1, :, :], l)
            outs = []
            for s, g in zip(steps, gs):
                if s % self.slots == 0:
                    outs.append(c)
                    continue
                Dg = jnp.take(D, perms[g], axis=-1)
                kb, ka = self.select_key(self.galois_keys[g], l)
                ks = self._mod_down(self._apply_ksk(Dg, kb, ka, l), l)
                c0 = add_mod(jnp.take(c[..., 0, :, :], perms[g], axis=-1),
                             ks[..., 0, :, :], p)
                outs.append(jnp.stack([c0, ks[..., 1, :, :]], axis=-3))
            return outs
        return jax.jit(f)


def _close(a: float, b: float, rtol: float = 1e-6) -> bool:
    return abs(a - b) <= rtol * max(abs(a), abs(b))


def _sel(arr, rows):
    """Static row-subset selection (jnp arrays reject list/tuple indices)."""
    return arr[np.asarray(rows, dtype=np.int32)]
