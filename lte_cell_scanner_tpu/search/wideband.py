"""Wideband cell search: one wide capture -> a whole fc sweep.

The reference tunes the dongle to every carrier in turn and captures
80 ms each (src/CellSearch.cpp:471-481) — the sweep costs
N_carriers x (tune + settle + capture) of radio time. A wideband SDR
recording (any integer multiple of 1.92 Msps, e.g. a 15.36 or
30.72 Msps full-band LTE capture) contains every carrier of the band at
once: this module channelizes it (io/frontend.py: frequency shift +
polyphase decimating FIR, one MXU matmul per carrier) and feeds the
resulting per-carrier 1.92 Msps captures to the data-parallel sharded
sweep (parallel/fc_sweep.py), so a single 80 ms recording yields every
cell in the band. No reference equivalent — this is the TPU
deployment's high-throughput front end.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from lte_cell_scanner_tpu.constants import FS_SEARCH
from lte_cell_scanner_tpu.io.frontend import PASSBAND_HZ, decimate_capture
from lte_cell_scanner_tpu.models.cell import Cell

CAPLENGTH = 153600   # the searcher's 80 ms analysis window


def wideband_carriers(fs_in: float, fc_center: float,
                      freq_start: float, freq_end: float,
                      raster: float = 100e3) -> List[float]:
    """The 100 kHz-raster carriers inside [freq_start, freq_end] whose
    600 kHz occupancy fits the recording's usable bandwidth."""
    usable = fs_in / 2.0 - PASSBAND_HZ
    lo = max(freq_start, fc_center - usable)
    hi = min(freq_end, fc_center + usable)
    first = np.ceil(lo / raster) * raster
    return [float(f) for f in np.arange(first, hi + raster / 2, raster)]


def wideband_search_sweep(wide: np.ndarray, fs_in: float,
                          fc_center: float, fc_list: Sequence[float],
                          f_search_set: np.ndarray, mesh=None,
                          backend: str = "numpy", **sweep_kw
                          ) -> Tuple[List[List[Cell]], List[Cell]]:
    """Channelize ``wide`` (complex, fs_in Sps, centered at fc_center)
    at every carrier in fc_list and run the full DP sharded search
    sweep on the resulting 1.92 Msps captures.

    Returns (cells_per_carrier, deduped) like sharded_search_sweep.
    ``backend`` selects the channelizer implementation (the sweep itself
    picks its device path automatically).
    """
    import jax

    from lte_cell_scanner_tpu.parallel.fc_sweep import (
        make_cap_mesh, sharded_search_sweep)

    caps = []
    for fc in fc_list:
        nb = decimate_capture(wide, fs_in, freq_shift=fc - fc_center,
                              backend=backend)
        caps.append(nb[:CAPLENGTH])
    n = min(len(c) for c in caps)
    capbufs = np.stack([c[:n] for c in caps])

    if mesh is None:
        B = len(caps)
        n_shards = max(d for d in range(1, len(jax.devices()) + 1)
                       if B % d == 0)
        mesh = make_cap_mesh(n_shards)
    return sharded_search_sweep(capbufs, list(fc_list),
                                np.asarray(f_search_set), mesh,
                                **sweep_kw)
