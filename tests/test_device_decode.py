"""Device decode chain (ops/sync_jax + ops/mib_jax) vs the float64 host
path: per-stage parity on the reference capture, full backend="jax"
end-to-end, and extended-CP coverage via the simulator.

reference behavior: src/searcher.cpp:533-1692 (sss_detect .. decode_mib).
"""

import dataclasses

import numpy as np
import pytest

from lte_cell_scanner_tpu.constants import DS_COMB_ARM, THRESH2_N_SIGMA
from lte_cell_scanner_tpu.models.rs import RSDL
from lte_cell_scanner_tpu.ops.mib_jax import decode_mib_batch
from lte_cell_scanner_tpu.ops.peak import peak_search
from lte_cell_scanner_tpu.ops.pbch import decode_mib
from lte_cell_scanner_tpu.ops.sync import pss_sss_foe, sss_detect
from lte_cell_scanner_tpu.ops.sync_jax import sss_foe_batch
from lte_cell_scanner_tpu.ops.tfg import extract_tfg, tfoec
from lte_cell_scanner_tpu.ops.xcorr import xcorr_pss
from lte_cell_scanner_tpu.search.cell_search import (cell_search,
                                                     detection_threshold)


@pytest.fixture(scope="module")
def real_peaks(capbuf_0000):
    cap, fc = capbuf_0000
    fset = np.arange(-15, 16) * 5e3
    r = xcorr_pss(cap, fset, DS_COMB_ARM, fc, fc, 1.92e6, backend="numpy")
    z = detection_threshold(r.sp_incoherent, r.n_comb_xc)
    peaks = peak_search(r.xc_incoherent_collapsed_pow,
                        r.xc_incoherent_collapsed_frq, z, fset, fc, fc,
                        r.xc_incoherent_single, DS_COMB_ARM)
    assert len(peaks) >= 2
    return cap, fc, peaks


def test_sync_stage_parity(real_peaks):
    """Device SSS detection + fine FOE matches the host chain per peak."""
    cap, fc, peaks = real_peaks
    got = sss_foe_batch(peaks, cap, fc, fc, 1.92e6, THRESH2_N_SIGMA)
    n_detected = 0
    for pk, g in zip(peaks, got):
        h = sss_detect(pk, cap, THRESH2_N_SIGMA, fc, fc, 1.92e6)
        if h.n_id_1 < 0:
            assert g.n_id_1 < 0
            continue
        n_detected += 1
        h = pss_sss_foe(h, cap, fc, fc, 1.92e6)
        assert g.n_id_1 == h.n_id_1
        assert g.cp_type == h.cp_type
        assert abs(g.frame_start - h.frame_start) < 1e-6
        assert abs(g.freq_fine - h.freq_fine) < 0.1
    assert n_detected >= 2


def test_mib_stage_parity(real_peaks):
    """Device TFG/TFOEC/chan_est/MIB matches the host (freq_time interp)."""
    cap, fc, peaks = real_peaks
    synced = sss_foe_batch(peaks, cap, fc, fc, 1.92e6, THRESH2_N_SIGMA)
    alive = [c for c in synced if c.n_id_1 >= 0]
    got = decode_mib_batch(alive, cap, fc, fc, 1.92e6)
    assert len(got) == len(alive)
    for g, c in zip(got, alive):
        h = dataclasses.replace(c)
        tfg, ts = extract_tfg(h, cap, fc, fc, 1.92e6)
        rs_dl = RSDL(h.n_id_cell(), 6, h.cp_type)
        h, tfg_comp, _ = tfoec(h, tfg, ts, fc, fc, rs_dl)
        h = decode_mib(h, tfg_comp, rs_dl, interp="freq_time")
        assert g.n_rb_dl == h.n_rb_dl == 50
        assert g.n_ports == h.n_ports == 2
        assert g.sfn == h.sfn
        assert g.phich_duration == h.phich_duration
        assert g.phich_resource == h.phich_resource
        assert abs(g.freq_superfine - h.freq_superfine) < 0.5


def test_e2e_device_backend(capbuf_0000):
    """cell_search(backend='jax') runs the whole per-peak chain on the
    device path and finds cells 277 + 271 with correct MIBs."""
    cap, fc = capbuf_0000
    fset = np.arange(-15, 16) * 5e3
    dev = cell_search(cap, fc, f_search_set=fset, backend="jax")
    host = cell_search(cap, fc, f_search_set=fset, backend="numpy",
                       interp="freq_time")
    assert {c.n_id_cell() for c in dev} == {277, 271}
    hmap = {c.n_id_cell(): c for c in host}
    for c in dev:
        h = hmap[c.n_id_cell()]
        assert (c.n_rb_dl, c.n_ports, c.sfn, c.cp_type) == \
            (h.n_rb_dl, h.n_ports, h.sfn, h.cp_type)
        assert abs(c.freq_superfine - h.freq_superfine) < 0.5


def test_device_decode_extended_cp():
    """Extended-CP geometry (732-symbol grid, 1728-bit PBCH) decodes on
    the device path."""
    from lte_cell_scanner_tpu.io.simulator import synthetic_capture

    cap = synthetic_capture(n_id_1=30, n_id_2=2, cp_type="extended",
                            snr_db=20.0, freq_offset=2e3, n_rb_dl=25,
                            seed=3)
    cells = cell_search(cap, 739e6, f_search_set=np.arange(-2, 3) * 5e3,
                        backend="jax")
    assert len(cells) == 1
    assert cells[0].n_id_cell() == 3 * 30 + 2
    assert cells[0].cp_type == "extended"
    assert cells[0].n_rb_dl == 25
