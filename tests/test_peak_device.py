"""Device greedy peak search vs the host implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from lte_cell_scanner_tpu.constants import DS_COMB_ARM, THRESH1_N_NINES
from lte_cell_scanner_tpu.ops.peak import peak_search
from lte_cell_scanner_tpu.ops.peak_jax import (
    peak_search_device,
    peaks_to_cells,
    r_th1_normalized,
)
from lte_cell_scanner_tpu.ops.xcorr import xcorr_pss
from lte_cell_scanner_tpu.search.cell_search import detection_threshold


def _compare(cap, fc, fset):
    r = xcorr_pss(cap, fset, DS_COMB_ARM, fc, fc, 1.92e6, backend="numpy")
    z = detection_threshold(r.sp_incoherent, r.n_comb_xc)
    host = peak_search(r.xc_incoherent_collapsed_pow,
                       r.xc_incoherent_collapsed_frq, z, fset, fc, fc,
                       r.xc_incoherent_single, DS_COMB_ARM)

    packed = np.concatenate([
        r.xc_incoherent_collapsed_pow,
        r.xc_incoherent_collapsed_frq.astype(np.float64),
        r.sp_incoherent[None],
    ], axis=0)
    r_norm = r_th1_normalized(r.n_comb_xc, DS_COMB_ARM, THRESH1_N_NINES)
    table = peak_search_device(jnp.asarray(packed),
                               jnp.asarray(np.asarray(r.xc_incoherent_single)),
                               r_norm, DS_COMB_ARM)
    dev = peaks_to_cells(np.asarray(table), fset, fc, fc)

    assert len(dev) == len(host)
    for a, b in zip(dev, host):
        assert a.n_id_2 == b.n_id_2
        assert a.ind == b.ind
        assert a.freq == b.freq
        # the device table records pow in float32
        np.testing.assert_allclose(a.pss_pow, b.pss_pow, rtol=1e-6)
    return host


def test_device_peaks_match_host_synthetic():
    from lte_cell_scanner_tpu.models.pss import pss_td

    rng = np.random.default_rng(5)
    n = 153600
    cap = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.05
    # Two cells on different PSS at different lags/offsets.
    for n2, lag0, f_off, amp in [(1, 500, 10e3, 0.3), (0, 4000, -5e3, 0.2)]:
        tpl = pss_td(n2)
        t = np.arange(137)
        sh = tpl * np.exp(1j * 2 * np.pi * f_off * t / 1.92e6)
        for k in range(lag0, n - 137, 9600):
            cap[k:k + 137] += amp * sh
    found = _compare(cap, 739e6, np.arange(-3, 4) * 5e3)
    assert len(found) >= 2


def test_device_peaks_match_host_real_capture(capbuf_0000):
    cap, fc = capbuf_0000
    found = _compare(cap, fc, np.arange(-15, 16) * 5e3)
    assert len(found) >= 2  # cells 271 and 277 live in this capture


def test_dead_radio_no_hang_no_cells():
    """An all-zero capture (dead radio: constant 0x7F bytes) must return
    no cells promptly on both peak-search implementations."""
    from lte_cell_scanner_tpu.ops.peak_jax import peak_search_device

    zeros = np.zeros((3, 9600))
    host = peak_search(zeros, zeros.astype(int), np.zeros(9600),
                       np.array([0.0]), 739e6, 739e6,
                       np.zeros((3, 9600, 1)), DS_COMB_ARM)
    assert host == []
    table = peak_search_device(jnp.asarray(np.zeros((7, 9600))),
                               jnp.asarray(np.zeros((3, 9600, 1))),
                               1.0, DS_COMB_ARM)
    from lte_cell_scanner_tpu.ops.peak_jax import peaks_to_cells
    assert peaks_to_cells(np.asarray(table), np.array([0.0]),
                          739e6, 739e6) == []
