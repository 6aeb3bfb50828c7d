"""Device-only throughput benchmark for the wideband channelizer.

Measures the per-carrier on-device cost of turning ONE wideband capture
into a whole fc sweep's worth of 1.92 Msps channels, for both
formulations in search/wideband.py:

- ``bank``: the one-pass filter-bank (modulated-kernel strided conv on
  the MXU + exact two-level post-rotation) — the production path;
- ``map``:  the per-carrier lax.map baseline (device time grows
  linearly with the carrier count).

Timing uses the chained-lax.scan slope method (see tools/bench_scan.py):
back-to-back block_until_ready timings are meaningless through this
machine's tunneled chip.

No reference equivalent — the reference retunes the dongle per carrier
(src/CellSearch.cpp:471-481); this is the TPU deployment's front end.

Usage:
    python -m lte_cell_scanner_tpu.tools.bench_wideband
        [--decim 16] [--carriers 16] [--iters 24] [--skip-map]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def measure_channelizer(make, fs_in: float, fc_center: float, fcs,
                        n_wide: int, iters: int = 24):
    """Per-dispatch device seconds of one channelizer formulation.

    ``make`` is make_channelizer / make_channelizer_map. Chains the
    program data-dependently inside a lax.scan (iteration i+1's input
    depends on iteration i's output, so XLA can neither overlap nor CSE
    them) and returns (slope_seconds, n_out) — the slope between two
    chain lengths cancels the constant dispatch cost. Shared with
    bench.py's wideband metric.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    planes = rng.standard_normal((2, n_wide)).astype(np.float32)
    run, consts, n_out = make(fs_in, fc_center, fcs, n_wide)
    cap_j = jnp.asarray(planes)

    def chain(n):
        def step(c, _):
            out = run(c, *consts)
            eps = jnp.where(out[0, 0, 0] > 1e30, 1.0, 0.0)
            return c + eps, out[0, 0, 0]

        @jax.jit
        def go(c):
            return jax.lax.scan(step, c, None, length=n)[1]

        return go

    times = {}
    for n in (max(1, iters // 4), iters):
        go = chain(n)
        np.asarray(go(cap_j))                 # compile
        t0 = time.time()
        np.asarray(go(cap_j))                 # honest D2H-forced run
        times[n] = time.time() - t0
    n1, n2 = sorted(times)
    return (times[n2] - times[n1]) / (n2 - n1), n_out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--decim", type=int, default=16,
                   help="decimation (fs_in = decim * 1.92 Msps)")
    p.add_argument("--carriers", type=int, default=16)
    p.add_argument("--iters", type=int, default=24)
    p.add_argument("--skip-map", action="store_true",
                   help="skip the slow per-carrier baseline")
    args = p.parse_args(argv)

    from lte_cell_scanner_tpu.search.wideband import (CAPLENGTH,
                                                      make_channelizer,
                                                      make_channelizer_map)

    fs_in = args.decim * 1.92e6
    fc_center = 750e6
    # 100 kHz-raster carriers straddling the band center.
    fcs = [fc_center + (i - args.carriers // 2) * 100e3
           for i in range(args.carriers)]
    n_wide = (CAPLENGTH + 64) * args.decim

    def measure(make):
        return measure_channelizer(make, fs_in, fc_center, fcs, n_wide,
                                   iters=args.iters)

    bank_s, n_out = measure(make_channelizer)
    res = {
        "metric": "wideband_channelize_ms_per_carrier",
        "value": round(bank_s / args.carriers * 1e3, 4),
        "unit": "ms",
        "carriers": args.carriers,
        "decim": args.decim,
        "n_out": n_out,
        "bank_ms": round(bank_s * 1e3, 3),
        "carriers_per_sec": int(args.carriers / bank_s),
    }
    if not args.skip_map:
        map_s, _ = measure(make_channelizer_map)
        res["map_ms"] = round(map_s * 1e3, 3)
        res["speedup_vs_map"] = round(map_s / bank_s, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
