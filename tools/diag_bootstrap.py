"""Stage-wise CKKS bootstrap noise diagnostic.

Runs one refresh stage by stage, decrypting after every stage and
comparing against host-computed expectations, to localize noise:

  raised    : centered coefficients v' = Delta_d*m_coeffs + q0*I (checks |I|)
  c2s       : slots vs (expected coefficient pairs)/Delta_d (bitrev in
              factorized mode)
  evalmod   : per-stream exp outputs vs exp(2*pi*i*t/q0) of the true coeffs
  combine   : w~ slots vs (v' mod q0)/Delta_d
  s2c/final : decrypted message vs original

Env knobs: DIAG_N, DIAG_LIMBS, DIAG_SPECIAL, DIAG_DNUM, DIAG_RADIX,
DIAG_MARGIN, DIAG_DEG, DIAG_RANGEK.  Runs wherever JAX lands (TPU via the
tunnel, or force CPU with DIAG_CPU=1).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    n = int(os.environ.get("DIAG_N", "2048"))
    limbs = int(os.environ.get("DIAG_LIMBS", "22"))
    special = int(os.environ.get("DIAG_SPECIAL", "4"))
    dnum = int(os.environ.get("DIAG_DNUM", "6")) or None
    radix = int(os.environ.get("DIAG_RADIX", "4")) or None
    margin = int(os.environ.get("DIAG_MARGIN", "3"))
    deg = int(os.environ.get("DIAG_DEG", "31"))
    rangek = int(os.environ.get("DIAG_RANGEK", "0")) or None
    width = int(os.environ.get("DIAG_WIDTH", "1"))

    if os.environ.get("DIAG_CPU"):
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    log(f"devices: {jax.devices()}")

    from fhe_spear_tpu.ckks import CkksContext, CkksParams
    from fhe_spear_tpu.ckks.bootstrap import Bootstrapper
    from fhe_spear_tpu.ckks.ciphertext import Ciphertext
    from fhe_spear_tpu.ckks.dft import bitrev
    from fhe_spear_tpu.ops.polyeval import _mul_scalar_c

    t0 = time.perf_counter()
    ctx = CkksContext(CkksParams.bootstrap(n=n, num_limbs=limbs,
                                           num_special=special, hamming=64,
                                           dnum=dnum), seed=0)
    bt = Bootstrapper(ctx, exp_degree=deg, margin_bits=margin, radix=radix,
                      range_k=rangek, evalmod_width=width)
    log(f"setup {time.perf_counter() - t0:.1f}s  K={bt.K} r={bt.r} "
        f"delta_d=2^{np.log2(bt.delta_d):.0f} "
        f"linear_levels={bt.linear_levels}")

    rng = np.random.default_rng(1)
    m = rng.uniform(-0.8, 0.8, ctx.slots)
    ct0 = ctx.mod_switch_to(ctx.encrypt(m), 2)

    # --- stage 0: normalize + drop to 1 limb -----------------------------
    ct = ctx.scale_to(ct0, bt.delta_d)
    ct = ctx.mod_switch_to(ct, 1)

    # true coefficients at delta_d (pre-raise; the level-1 residue itself)
    v_true = ctx.decrypt_to_coeffs(ct)           # centered mod q0, exact
    s = ctx.slots

    # --- stage 1: ModRaise ----------------------------------------------
    raised = bt.mod_raise(ct)
    q0 = int(ctx.q_np[0])
    # full-level decrypt: use 2-limb CRT path
    vr = ctx.decrypt_to_coeffs(raised)
    i_poly = (vr - v_true) / q0
    i_round = np.round(i_poly)
    log(f"raise: |I|max={np.abs(i_round).max():.0f} (bound K={bt.K}) "
        f"I_err={np.abs(i_poly - i_round).max():.2e}")

    # --- stage 2: CoeffToSlot -------------------------------------------
    w = bt._coeff_to_slot(raised)
    wz = ctx.decrypt_vec_complex(w)
    exp_pairs = (vr[:s] + 1j * vr[s:]) / bt.delta_d
    if bt.radix:
        exp_pairs = exp_pairs[bitrev(s.bit_length() - 1)]
    c2s_err = np.abs(wz - exp_pairs)
    log(f"c2s: level={w.level} scale=2^{np.log2(w.scale):.1f} "
        f"max_err={c2s_err.max():.3e} rel={c2s_err.max()/np.abs(exp_pairs).max():.2e} "
        f"(slot mag max {np.abs(exp_pairs).max():.0f})")

    # --- stage 3: split streams ------------------------------------------
    wc = ctx.conjugate(w)
    two_re = ctx.add(w, wc)
    two_im_i = ctx.sub(w, wc)
    half_re = ctx.rescale(ctx.mul_scalar(two_re, 0.5))
    half_im = ctx.rescale(_mul_scalar_c(ctx, two_im_i, -0.5j, ctx.scale))
    tr = ctx.decrypt_vec_complex(half_re)
    ti = ctx.decrypt_vec_complex(half_im)
    log(f"split: re_err={np.abs(tr - exp_pairs.real).max():.3e} "
        f"im_err={np.abs(ti - exp_pairs.imag).max():.3e}")

    # --- stage 4: EvalMod both streams -----------------------------------
    er = bt._eval_exp(half_re)
    ei = bt._eval_exp(half_im)
    dd, r = bt.delta_d, bt.r
    true_er = np.exp(2j * np.pi * exp_pairs.real * dd / q0)
    true_ei = np.exp(2j * np.pi * exp_pairs.imag * dd / q0)
    ez_r = ctx.decrypt_vec_complex(er)
    ez_i = ctx.decrypt_vec_complex(ei)
    log(f"evalmod: level={er.level} er_err={np.abs(ez_r - true_er).max():.3e} "
        f"ei_err={np.abs(ez_i - true_ei).max():.3e}")
    # also: how far is Im(exp) from the exact mod-reduction?
    vmod = vr - q0 * i_round
    sin_r = np.sin(2 * np.pi * vmod[:s] / q0)
    lin_r = 2 * np.pi * vmod[:s] / q0
    log(f"  sine linearization err (host): "
        f"{np.abs(sin_r - lin_r).max() * q0 / (2 * np.pi) / dd:.3e} "
        f"(in message units)")

    # --- stage 5: combine -------------------------------------------------
    gamma = bt.q0 / (2 * np.pi * dd)
    lvl = min(er.level, ei.level)
    er2 = ctx.mod_switch_to(er, lvl)
    ei2 = ctx.mod_switch_to(ei, lvl)
    dr = ctx.sub(er2, ctx.conjugate(er2))
    di = ctx.sub(ei2, ctx.conjugate(ei2))
    t1 = ctx.rescale(_mul_scalar_c(ctx, dr, -1.0j, ctx.scale))
    t2 = ctx.rescale(ctx.mul_scalar(di, 1.0))
    ssum = ctx.add(t1, Ciphertext(t2.c, t1.scale))
    wt = ctx.rescale(ctx.mul_scalar(ssum, 0.5 * gamma))
    if bt.width > 1:
        wt = ctx.scale_to(wt, ctx.scale)
    wt_z = ctx.decrypt_vec_complex(wt)
    exp_wt = (vmod[:s] + 1j * vmod[s:]) / dd
    log(f"combine: level={wt.level} err={np.abs(wt_z - exp_wt).max():.3e}")

    # --- stage 6: SlotToCoeff --------------------------------------------
    out = bt._slot_to_coeff(wt)
    got = ctx.decrypt_vec(out)
    err = np.abs(got - m)
    corr = np.corrcoef(got, m)[0, 1]
    log(f"final: level={out.level} max_err={err.max():.3e} "
        f"mean_err={err.mean():.3e} corr={corr:.6f}")


if __name__ == "__main__":
    main()
