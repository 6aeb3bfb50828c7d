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


def measure(cells=96, seconds=1.2, chunk_ms=300.0, verbose=True,
            warm_chunks=2):
    """Run the capacity measurement; returns the metric dict (the same
    payload ``main`` prints). Callable from bench.py so the driver's
    headline JSON carries the tracker capacity too."""
    pdus, raw_blocks, proto = _collect_pdus(seconds)
    n_sym_s = proto.n_symb_dl * 2 * 1000
    n_need = int(seconds * n_sym_s)
    if len(pdus) < n_need:
        n_need = len(pdus)
    pdus = pdus[:n_need]
    chunk = max(1, int(chunk_ms / 1000 * n_sym_s))
    if len(pdus) <= chunk * (int(warm_chunks) + 1):
        # Never let warm-up consume the whole signal: keep >= 2 timed
        # chunks or the measurement degenerates to 0 s.
        chunk = max(1, len(pdus) // (int(warm_chunks) + 2))

    M = cells
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

    # Warm-up: compile the dispatch shapes, including the Viterbi
    # decoder's single 128-lane-padded kernel shape (a fresh Mosaic
    # compile through the tunnel costs minutes and must never land in
    # a timed cycle).
    import jax.numpy as _jnp
    import numpy as _np

    import lte_cell_scanner_tpu.tracker.batch_runtime as _br

    # All four power-of-two tile counts of the eager decode path (see
    # lte_conv_decode_batch): job counts walk up over the first cycles.
    for _b in (1, 129, 257, 513):
        _np.asarray(_br.lte_conv_decode_batch(_jnp.zeros((_b, 3, 40))))
    # TWO warm-up cycles by default: the MIB backlog walks up batch
    # buckets over the first cycles, and each fresh bucket's eager op
    # set (pad/tile/concat around the Viterbi kernel) costs a one-time
    # per-process compile through the tunnel that must not land in a
    # timed cycle.
    warm = max(1, int(warm_chunks)) * chunk
    for c in cells:
        for p in pdus[:warm]:
            c.fifo.append(p)
    engine.process_all(cells)

    # Tap the engine's device dispatches during the timed run so the
    # device-bound measurement below can replay one cycle's REAL
    # argument set in a chained lax.scan.
    import lte_cell_scanner_tpu.tracker.batch_runtime as br

    rec: dict = {}
    counts = {"cycles": 0, "mib": 0}
    orig = (br._demod_stream_jit, br._stats_jit, br.lte_conv_decode_batch,
            br._demod_stream_pallas_jit)

    def tap_demod(*a):
        rec["demod"] = a
        rec["demod_fn"] = orig[0]
        counts["cycles"] += 1
        return orig[0](*a)

    def tap_demod_pallas(*a):
        rec["demod"] = a
        rec["demod_fn"] = orig[3]
        counts["cycles"] += 1
        return orig[3](*a)

    def tap_stats(*a):
        rec["stats"] = a
        return orig[1](*a)

    def tap_vit(b):
        rec["vit"] = b
        counts["mib"] += 1
        return orig[2](b)

    br._demod_stream_jit = tap_demod
    br._demod_stream_pallas_jit = tap_demod_pallas
    br._stats_jit = tap_stats
    br.lte_conv_decode_batch = tap_vit
    try:
        fed = warm
        # Full chunks only: a trailing partial chunk would change the
        # dispatch bucket and drop a fresh (tunnel-slow) compile into
        # the timed region. Each cycle is timed SEPARATELY and the
        # capacity uses the median cycle: one tunnel hiccup poisons one
        # sample, not the measurement (same estimator as bench.py's
        # pipelined batches).
        cycle_walls = []
        while fed + chunk <= len(pdus):
            hi = fed + chunk
            t1 = time.time()
            for c in cells:
                for p in pdus[fed:hi]:
                    c.fifo.append(p)
            engine.process_all(cells)
            cycle_walls.append(time.time() - t1)
            fed = hi
        import numpy as _np

        wall_med = float(_np.median(cycle_walls))
        wall = sum(cycle_walls)
    finally:
        (br._demod_stream_jit, br._stats_jit, br.lte_conv_decode_batch,
         br._demod_stream_pallas_jit) = orig

    signal_s = (fed - warm) / n_sym_s
    chunk_s = chunk / n_sym_s
    cells_realtime = M * chunk_s / wall_med
    mibs = sum(c.mib_decode_successes for c in cells)
    if verbose:
        print(f"# {M} cells x {signal_s:.2f}s signal in {wall:.2f}s wall "
              f"(median cycle {wall_med:.2f}s, {mibs} MIB decodes)",
              flush=True)

    dev = _device_bound(rec, counts, M, chunk, n_sym_s, signal_s)
    return {
        "metric": "tracker_cells_realtime_per_chip",
        "value": round(cells_realtime, 1),
        "unit": "cells",
        "vs_baseline": round(cells_realtime / BASELINE_CELLS, 1),
        "cycle_walls_s": [round(w, 3) for w in cycle_walls],
        **dev,
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--cells", type=int, default=96)
    ap.add_argument("--seconds", type=float, default=1.2)
    ap.add_argument("--chunk-ms", type=float, default=300.0,
                    help="signal per engine cycle (dispatch cadence)")
    args = ap.parse_args(argv)
    print(json.dumps(measure(args.cells, args.seconds, args.chunk_ms)))


def _device_bound(rec, counts, M, chunk, n_sym_s, signal_s):
    """Device-bound tracker capacity: per-cycle DEVICE time of the data
    plane (stream demod + CE/FOE/TOE/AC stats, plus the batched Viterbi
    amortized at its observed cadence), measured by chaining one timed
    cycle's REAL dispatch arguments inside a lax.scan (slope between two
    chain lengths — immune to the host link, which dominates the
    wall-clock number on a tunneled chip; see CLAUDE.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import lte_cell_scanner_tpu.tracker.batch_runtime as br

    if jax.default_backend() == "cpu" or "demod" not in rec \
            or "stats" not in rec:
        return {}
    dem = rec["demod_fn"].__wrapped__
    st = br._stats_jit.__wrapped__
    da = [jnp.asarray(np.asarray(a)) for a in rec["demod"]]
    sa = rec["stats"]
    stats_rest = [jnp.asarray(np.asarray(a)) for a in sa[1:-1]]
    n_seg = int(sa[-1])

    def step(c, _):
        flat, ce_dev = dem(da[0], da[1] + c, *da[2:])
        flat2, _hist = st(ce_dev, *stats_rest, n_seg)
        big = jnp.float32(6e4)
        eps = ((flat.reshape(-1)[0].astype(jnp.float32) > big)
               | (flat2.reshape(-1)[0].astype(jnp.float32) > big))
        return c + eps.astype(jnp.int32), flat2.reshape(-1)[0]

    def slope(step_fn, carry0):
        times = {}
        for n in (8, 32):
            f = jax.jit(lambda c: jax.lax.scan(step_fn, c, None,
                                               length=n)[1])
            np.asarray(f(carry0))
            t0 = time.time()
            np.asarray(f(carry0))
            times[n] = time.time() - t0
        return (times[32] - times[8]) / 24

    per_cycle = slope(step, jnp.int32(0))
    if "vit" in rec and counts["mib"]:
        vb = jnp.asarray(np.asarray(rec["vit"]))

        def vstep(c, _):
            dec = br.lte_conv_decode_batch(vb + c)
            eps = (dec.reshape(-1)[0].astype(jnp.float32) > 2.0)
            return c + eps.astype(vb.dtype), dec.reshape(-1)[0]

        per_cycle += slope(vstep, jnp.zeros((), vb.dtype)) \
            * counts["mib"] / max(counts["cycles"], 1)
    cycle_signal_s = chunk / n_sym_s
    cells_dev = M * cycle_signal_s / per_cycle
    return {
        "device_ms_per_cycle": round(per_cycle * 1e3, 3),
        "cells_realtime_device": round(cells_dev, 1),
        "vs_baseline_device": round(cells_dev / BASELINE_CELLS, 1),
    }


if __name__ == "__main__":
    main()
