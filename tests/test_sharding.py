"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from lte_cell_scanner_tpu.ops.xcorr import xcorr_pss
from lte_cell_scanner_tpu.parallel import make_search_mesh, sharded_xcorr_pss
from tests.test_xcorr_device import _synthetic_capture


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("n_seq,n_hyp", [(8, 1), (4, 2), (2, 4)])
def test_sharded_scan_matches_reference(n_seq, n_hyp):
    cap = _synthetic_capture(n=153600, f_off=12e3)
    fset = np.arange(-4, 4) * 5e3  # 8 hypotheses, divisible by all n_hyp
    mesh = make_search_mesh(n_seq, n_hyp)

    ref = xcorr_pss(cap, fset, 2, 739e6, 739e6, 1.92e6, backend="numpy")
    out = sharded_xcorr_pss(cap, fset, 2, 739e6, 739e6, 1.92e6, mesh,
                            dtype=np.float64)

    np.testing.assert_allclose(out.xc_incoherent_collapsed_pow,
                               ref.xc_incoherent_collapsed_pow,
                               rtol=0, atol=1e-12)
    assert (out.xc_incoherent_collapsed_frq
            == ref.xc_incoherent_collapsed_frq).all()
    np.testing.assert_allclose(np.asarray(out.xc_incoherent_single),
                               np.asarray(ref.xc_incoherent_single),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(out.sp_incoherent, ref.sp_incoherent,
                               rtol=0, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_end_to_end_detection(capbuf_0000):
    """Sharded scan on the real capture must find the same peak."""
    from lte_cell_scanner_tpu.constants import DS_COMB_ARM
    from lte_cell_scanner_tpu.ops.peak import peak_search
    from lte_cell_scanner_tpu.search.cell_search import detection_threshold

    cap, fc = capbuf_0000
    fset = np.arange(-15, 16) * 5e3
    mesh = make_search_mesh(4, 1)
    r = sharded_xcorr_pss(cap, fset, DS_COMB_ARM, fc, fc, 1.92e6, mesh,
                          dtype=np.float64)
    z = detection_threshold(r.sp_incoherent, r.n_comb_xc)
    peaks = peak_search(r.xc_incoherent_collapsed_pow,
                        r.xc_incoherent_collapsed_frq, z, fset, fc, fc,
                        np.asarray(r.xc_incoherent_single), DS_COMB_ARM)
    assert peaks, "no peaks found on the reference capture"
    assert peaks[0].n_id_2 == 1  # cell 271/277 site transmits PSS 1
    assert peaks[0].freq == 35000.0
