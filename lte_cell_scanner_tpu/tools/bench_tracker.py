"""Tracker capacity benchmark: cells tracked in realtime per chip.

The reference tracks ~4 cells x 2 ports in realtime on a dual-core
i7-2640 (doc/LTE-Tracker.html:56-57, BASELINE.md). This benchmark
measures the batched device data plane (tracker/batch_runtime.py): M
tracked cells' complete per-symbol processing — demod, channel
estimation/filtering, FOE/TOE/AC statistics, sync measurements, PBCH
collection and the batched Viterbi MIB decode with health tracking —
driven for a stretch of signal, reporting how many cells fit in realtime.

The per-cell symbol streams replicate one simulated cell's PDUs (the
arithmetic is identical for any cell content; acquisition is exercised by
the e2e tests, not benchmarked here).

Usage: python -m lte_cell_scanner_tpu.tools.bench_tracker \
           [--cells 64] [--seconds 0.4]
"""

from __future__ import annotations

import argparse
import copy
import json
import time


from lte_cell_scanner_tpu.io.simulator import synthetic_capture
from lte_cell_scanner_tpu.tracker import LTETracker
from lte_cell_scanner_tpu.tracker.batch_runtime import BatchTrackerEngine
from lte_cell_scanner_tpu.tracker.runtime import playback_source
from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

BASELINE_CELLS = 4.0


def _collect_pdus(seconds: float):
    """Run the real batched pipeline once to harvest authentic descriptor
    PDUs plus the raw uint8 stream they index into."""
    n_subframes = int(seconds * 1000) + 400
    sig = synthetic_capture(n_id_1=90, n_id_2=1, snr_db=15,
                            freq_offset=4e3, n_subframes=n_subframes,
                            sfn_start=0, seed=5)
    harvested = []
    raw_blocks = []

    trk = LTETracker(739e6, initial_freq_offset=4000.0, batch=True,
                     engine_every=20)
    # Tap the feeder: record every PDU pushed to the first tracked cell.
    orig_push = TrackedCell.push_pdu

    def tap(self, pdu):
        harvested.append(copy.copy(pdu))
        orig_push(self, pdu)

    def tapped_source():
        for blk in playback_source(sig):
            raw_blocks.append(blk)
            yield blk

    TrackedCell.push_pdu = tap
    try:
        n_blocks = int(seconds * 1.92e6 / 10000) + 250
        trk.run(tapped_source(), max_blocks=n_blocks)
    finally:
        TrackedCell.push_pdu = orig_push
    assert trk.cells, "benchmark signal failed to acquire"
    proto = trk.cells[0]
    return harvested, raw_blocks, proto


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cells", type=int, default=96)
    ap.add_argument("--seconds", type=float, default=1.2)
    ap.add_argument("--chunk-ms", type=float, default=300.0,
                    help="signal per engine cycle (dispatch cadence)")
    args = ap.parse_args(argv)

    pdus, raw_blocks, proto = _collect_pdus(args.seconds)
    n_sym_s = proto.n_symb_dl * 2 * 1000
    n_need = int(args.seconds * n_sym_s)
    if len(pdus) < n_need:
        n_need = len(pdus)
    pdus = pdus[:n_need]
    chunk = max(1, int(args.chunk_ms / 1000 * n_sym_s))
    if len(pdus) <= chunk:
        # Never let warm-up consume the whole signal: keep >= 2 timed
        # chunks or the measurement degenerates to 0 s.
        chunk = max(1, len(pdus) // 3)

    M = args.cells
    state = GlobalState(fc_requested=739e6, fc_programmed=739e6,
                        fs_programmed=1.92e6, frequency_offset=4000.0)
    cells = []
    for m in range(M):
        # M replicas of the real tracked cell (distinct serials), so the
        # full locked-tracker path runs: MIB decodes succeed.
        cells.append(TrackedCell(
            n_id_cell=proto.n_id_cell, n_ports=proto.n_ports,
            cp_type=proto.cp_type, n_rb_dl=proto.n_rb_dl,
            phich_duration=proto.phich_duration,
            phich_resource=proto.phich_resource,
            frame_timing=proto.frame_timing, serial_num=m,
            drop_threshold=float("inf")))
    engine = BatchTrackerEngine(state)
    for blk in raw_blocks:
        engine.push_raw(blk)

    # Warm-up: compile the dispatch shapes.
    for c in cells:
        for p in pdus[:chunk]:
            c.fifo.append(p)
    engine.process_all(cells)

    t0 = time.time()
    fed = chunk
    while fed < len(pdus):
        hi = min(fed + chunk, len(pdus))
        for c in cells:
            for p in pdus[fed:hi]:
                c.fifo.append(p)
        engine.process_all(cells)
        fed = hi
    wall = time.time() - t0

    signal_s = (len(pdus) - chunk) / n_sym_s
    realtime_factor = signal_s / wall
    cells_realtime = M * realtime_factor
    mibs = sum(c.mib_decode_successes for c in cells)
    print(f"# {M} cells x {signal_s:.2f}s signal in {wall:.2f}s wall "
          f"({mibs} MIB decodes)", flush=True)
    print(json.dumps({
        "metric": "tracker_cells_realtime_per_chip",
        "value": round(cells_realtime, 1),
        "unit": "cells",
        "vs_baseline": round(cells_realtime / BASELINE_CELLS, 1),
    }))


if __name__ == "__main__":
    main()
