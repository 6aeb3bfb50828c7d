"""Dev tools: rtl_sdr_check (dropped-sample detector) + debug dump."""

import numpy as np

from lte_cell_scanner_tpu.io.simulator import synthetic_capture
from lte_cell_scanner_tpu.tools.rtl_sdr_check import check_capture


def test_clean_capture_no_drops():
    sig = synthetic_capture(n_id_1=90, n_id_2=1, snr_db=15,
                            freq_offset=0.0, n_subframes=200, seed=2)
    events, lags = check_capture(sig, n_id_2=1)
    assert np.isfinite(lags).sum() > 30
    assert events == []


def test_detects_dropped_samples():
    sig = synthetic_capture(n_id_1=90, n_id_2=1, snr_db=15,
                            freq_offset=0.0, n_subframes=200, seed=2)
    # Drop 37 samples mid-capture.
    cut = 180000
    damaged = np.concatenate([sig[:cut], sig[cut + 37:]])
    events, _ = check_capture(damaged, n_id_2=1)
    assert len(events) >= 1
    assert any(abs(e.jump - 37) < 3 for e in events)
    assert abs(events[0].position - cut) < 2 * 9600


def test_detects_inserted_samples():
    sig = synthetic_capture(n_id_1=90, n_id_2=1, snr_db=15,
                            freq_offset=0.0, n_subframes=200, seed=2)
    cut = 150000
    damaged = np.concatenate([sig[:cut], np.zeros(20, dtype=complex),
                              sig[cut:]])
    events, _ = check_capture(damaged, n_id_2=1)
    assert any(abs(e.jump + 20) < 3 for e in events)


def test_debug_dump_roundtrip(tmp_path):
    from lte_cell_scanner_tpu.io.itfile import load_it
    from lte_cell_scanner_tpu.utils import debug_dump

    debug_dump.clear()
    debug_dump.dump("x", np.arange(5.0))
    debug_dump.dump("c", np.array([1 + 2j, 3 - 4j]))
    p = str(tmp_path / "dbg.it")
    debug_dump.flush(p)
    back = load_it(p)
    np.testing.assert_array_equal(back["x"], np.arange(5.0))
    np.testing.assert_array_equal(back["c"], np.array([1 + 2j, 3 - 4j]))
