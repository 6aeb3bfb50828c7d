"""Fused Pallas correlate+fold kernel vs the XLA device path.

Runs in Pallas interpreter mode on CPU (the real-TPU parity of the same
kernel is exercised by bench/e2e on hardware; the kernel is bit-identical
to the XLA float32 path there too).
"""

import numpy as np
import jax.numpy as jnp

from lte_cell_scanner_tpu.ops.xcorr_jax import xcorr_pss_jax
from lte_cell_scanner_tpu.ops.xcorr_pallas import (
    scan_plan,
    xcorr_core_pallas,
    xcorr_single_pallas,
)


def _capture(n=48000, seed=0, f_off=10e3):
    from lte_cell_scanner_tpu.models.pss import pss_td

    rng = np.random.default_rng(seed)
    cap = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.05
    tpl = pss_td(1)
    t = np.arange(137)
    sh = tpl * np.exp(1j * 2 * np.pi * f_off * t / 1.92e6)
    for k in range(500, n - 137, 9600):
        cap[k:k + 137] += 0.3 * sh
    return cap


def test_pallas_single_matches_xla_f32():
    cap = _capture()
    fset = np.arange(-2, 3) * 5e3
    rj = xcorr_pss_jax(cap, fset, 2, 739e6, 739e6, 1.92e6,
                       dtype=np.float32, use_pallas=False)
    single, n_comb_xc = xcorr_single_pallas(cap, fset, 739e6, 739e6,
                                            1.92e6, interpret=True)
    assert n_comb_xc == rj.n_comb_xc
    # Tight f32 tolerance, not bit-equality: the kernel's roll-built
    # window permutes the contraction order (zero-padded K rows), so
    # interpret-mode CPU rounding differs in the last ulp; on real TPU
    # hardware the two paths still match exactly (checked by bench/e2e).
    got = np.asarray(single, dtype=np.float64)
    want = np.asarray(rj.xc_incoherent_single, dtype=np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-5,
                               atol=1e-6 * np.abs(want).max())


def test_pallas_bf16_bank_tracks_f32():
    """bf16 precision mode: uint8-born samples are exact in bf16, only
    the template bank rounds (~2^-8) — the fold must track the f32 path
    within that rounding and keep the peak structure identical."""
    cap = _capture(seed=5)
    fset = np.arange(-2, 3) * 5e3
    s32, n32 = xcorr_single_pallas(cap, fset, 739e6, 739e6, 1.92e6,
                                   interpret=True)
    s16, n16 = xcorr_single_pallas(cap, fset, 739e6, 739e6, 1.92e6,
                                   interpret=True, precision="bf16")
    assert n32 == n16
    a = np.asarray(s32, dtype=np.float64)
    b = np.asarray(s16, dtype=np.float64)
    assert np.abs(a - b).max() < 2e-3 * np.abs(a).max()
    assert np.unravel_index(a.argmax(), a.shape) == \
        np.unravel_index(b.argmax(), b.shape)


def test_pallas_tea_matches_roll():
    """Template-embedded-alignment kernel (the default layout): same
    fold as the roll-based kernel (the per-hypothesis k_factor shifts
    are baked into per-fold template banks instead of post-matmul
    rolls). The Karatsuba 3-matmul variant (tea3) must agree too (its
    im = m3-m1-m2 recombination adds ~1 ulp of f32 rounding)."""
    cap = _capture(seed=11)
    fset = np.arange(-3, 4) * 5e3
    s_roll, n1 = xcorr_single_pallas(cap, fset, 739e6, 739e6, 1.92e6,
                                     interpret=True, layout="roll")
    s_tea, n2 = xcorr_single_pallas(cap, fset, 739e6, 739e6, 1.92e6,
                                    interpret=True, layout="tea")
    s_tea3, n3 = xcorr_single_pallas(cap, fset, 739e6, 739e6, 1.92e6,
                                     interpret=True, layout="tea3")
    assert n1 == n2 == n3
    a = np.asarray(s_roll, dtype=np.float64)
    b = np.asarray(s_tea, dtype=np.float64)
    c = np.asarray(s_tea3, dtype=np.float64)
    np.testing.assert_allclose(b, a, rtol=1e-6, atol=1e-7 * a.max())
    np.testing.assert_allclose(c, a, rtol=1e-5, atol=1e-6 * a.max())


import pytest


@pytest.mark.parametrize("layout", ["roll", "tea"])
def test_pallas_core_packed_and_uint8(layout):
    cap = _capture(seed=3)
    fset = np.arange(-1, 2) * 5e3
    n_cap = len(cap)
    n_comb_sp = (n_cap - 136 - 137) // 9600
    bank, bases, offs, halo, n_tile, n_comb_xc, pad_len = scan_plan(
        n_cap, fset, 739e6, 739e6, 1.92e6, layout=layout)
    from lte_cell_scanner_tpu.ops.xcorr_pallas import pad_capture
    cap2_raw = np.stack([cap.real, cap.imag]).astype(np.float32)
    cap2 = pad_capture(cap2_raw, pad_len)
    offs_j = None if offs is None else jnp.asarray(offs)
    packed, single, inc = xcorr_core_pallas(
        jnp.asarray(cap2), jnp.asarray(bank), jnp.asarray(bases),
        offs_j, n_comb_xc, n_comb_sp, 2, halo=halo,
        n_tile=n_tile, interpret=True)
    rj = xcorr_pss_jax(cap, fset, 2, 739e6, 739e6, 1.92e6,
                       dtype=np.float32, use_pallas=False)
    packed = np.asarray(packed, dtype=np.float64)
    np.testing.assert_allclose(packed[0:3], rj.xc_incoherent_collapsed_pow,
                               rtol=1e-6)
    assert (packed[3:6].astype(int)
            == rj.xc_incoherent_collapsed_frq).all()
    np.testing.assert_allclose(packed[6], rj.sp_incoherent, rtol=1e-6)

    # uint8 radio-byte ingestion: quantize to rtl_sdr format, expect the
    # same peak structure (planted PSS still detected at the right lag).
    u8 = pad_capture(
        np.clip(np.round(cap2_raw * 128.0 + 127.0), 0, 255
                ).astype(np.uint8), pad_len)
    packed_u, _, _ = xcorr_core_pallas(
        jnp.asarray(u8), jnp.asarray(bank), jnp.asarray(bases),
        offs_j, n_comb_xc, n_comb_sp, 2, halo=halo,
        n_tile=n_tile, interpret=True)
    pow_u = np.asarray(packed_u, dtype=np.float64)[0:3]
    n2, lag = np.unravel_index(np.argmax(pow_u), pow_u.shape)
    assert n2 == 1 and abs(lag - 500) <= 2


def test_scan_plan_tea_fallback_extreme_ppm():
    """Fold misalignments beyond the TEA bank's embedding range fall
    back to the roll layout (whose halo grows freely) instead of
    asserting — e.g. a ±600 kHz hypothesis grid (~800 ppm)."""
    fset = np.arange(-120, 121) * 5e3
    bank, bases, offs, halo, n_tile, n_comb_xc, pad_len = scan_plan(
        153600, fset, 739e6, 739e6, 1.92e6)
    assert offs is not None          # roll layout artifacts
    assert bank.ndim == 2
    # and the standard grid still plans TEA
    bank2, _, offs2, *_ = scan_plan(153600, np.arange(-15, 16) * 5e3,
                                    739e6, 739e6, 1.92e6)
    assert offs2 is None and bank2.ndim == 3
