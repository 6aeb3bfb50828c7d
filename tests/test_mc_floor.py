"""Statistical detection-floor regression (VERDICT r4 item 4).

The reference pins its performance envelope at reliable PSS/SSS
detection down to ~-12 dB AWGN SNR and MIB decode to ~-10 dB
(src/searcher.cpp:99-104; threshold derivation
Matlab/pss_search_final.m:207-255). The committed artifact MC_r05.json
(tools/mc_search.run_sweep_artifact, 50 trials/point on the chip) is the
full-resolution evidence; this test asserts the floor at two SNR points
with binomial tolerance so a detection-rate regression fails CI, not
just the artifact refresh.

Tolerances: with true per-trial success p >= 0.95 (the artifact measures
100% at both points), P[successes <= threshold] < 1e-3 under the
binomial — the test flakes only if the floor actually regressed.
"""

import numpy as np
import pytest

from lte_cell_scanner_tpu.tools.mc_search import run_mc, wilson_lower


@pytest.mark.parametrize("snr_db,min_detect,min_mib", [
    (-10.0, 7, 6),   # MIB floor point: reference claims ~-10 dB
    (-12.0, 7, 6),   # sync floor point: reference claims ~-12 dB
])
def test_detection_floor_point(snr_db, min_detect, min_mib):
    st = run_mc(8, snr_db, backend="jax", seed=int(-snr_db), ppm=10.0,
                verbose=0)
    assert st.trials == 8
    assert st.detections >= min_detect, \
        f"{snr_db} dB: {st.detections}/8 detected (floor regression)"
    assert st.mib_successes >= min_mib, \
        f"{snr_db} dB: {st.mib_successes}/8 MIB decodes (floor regression)"
    # The chi^2 threshold calibration bounds false alarms, not just
    # detections (src/CellSearch.cpp:500-503).
    assert st.false_cells <= 1, f"{st.false_cells} false cells"


def test_wilson_lower_bound():
    # Closed-form sanity: k=n gives the textbook z^2/(n+z^2) bound.
    n, z = 50, 1.96
    assert wilson_lower(50, 50) == pytest.approx(n / (n + z * z), abs=1e-9)
    assert wilson_lower(0, 50) == 0.0
    assert 0.83 < wilson_lower(49, 50) < 0.93
    assert wilson_lower(0, 0) == 0.0
    # Monotone in k.
    ks = [wilson_lower(k, 20) for k in range(21)]
    assert all(b >= a for a, b in zip(ks, ks[1:]))
    assert np.isclose(wilson_lower(10, 20), 0.299, atol=0.01)
