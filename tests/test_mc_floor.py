"""Statistical detection-floor regression (VERDICT r4 item 4).

The reference pins its performance envelope at reliable PSS/SSS
detection down to ~-12 dB AWGN SNR and MIB decode to ~-10 dB
(src/searcher.cpp:99-104; threshold derivation
Matlab/pss_search_final.m:207-255). The committed artifact MC_r05.json
(tools/mc_search.run_sweep_artifact, 50 trials/point on the chip) is the
full-resolution evidence; this test asserts the floor at two SNR points
with binomial tolerance so a detection-rate regression fails CI, not
just the artifact refresh.

Tolerances are anchored to the ARTIFACT's measured per-trial rates, not
to an assumed 100%: MC_r05.json measures 50/50 at -10 dB but 43/50
(0.86) at -12 dB — the -12 dB point sits ON the floor's shoulder by
design, so its threshold must tolerate p ~= 0.86. With n=8 trials:
  -10 dB, min 5:  under p >= 0.95, P[X <= 4] ~= 4e-4  (binomial)
  -12 dB, min 3:  under p >= 0.86, P[X <= 2] ~= 2e-4
                  (even at a conservative p = 0.80, ~1.2e-3)
so a CI failure means the detection rate genuinely collapsed at that
SNR (to p ~< 0.35 / ~< 0.2 respectively with ~90% power), not that the
RNG stream shifted. The committed artifact remains the full-resolution
(50 trials/point) evidence of the exact rates.
"""

import numpy as np
import pytest

from lte_cell_scanner_tpu.tools.mc_search import run_mc, wilson_lower


@pytest.mark.parametrize("snr_db,min_detect,min_mib", [
    (-10.0, 5, 5),   # MIB floor point: reference claims ~-10 dB
    (-12.0, 3, 3),   # sync floor shoulder: artifact measures p=0.86 here
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
