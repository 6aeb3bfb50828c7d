"""Device-only latency microbenchmark for the fused scan kernel.

Measures what the tunnel hides: the pure on-device latency of (a) the
fused Pallas correlate+fold and (b) the complete scan program including
smoothing/power/threshold/greedy peaks, by chaining N data-dependent
iterations inside ONE jitted `lax.scan` (per-iteration latency = slope
between two chain lengths, cancelling the constant dispatch cost).
Back-to-back `block_until_ready` timings are useless through this
machine's ~25 ms tunnel round-trip; the chained program is the only
honest measurement (see CLAUDE.md).

Reference workload: the reference's hot loop costs ~6 s/fc on a
dual-core i7 (doc/CellSearch.html:52-55); the f32 MXU bound for the
same math (15.6 GFLOP of matmul per capture at n_f=31) is ~0.3 ms.

Usage:
    python -m lte_cell_scanner_tpu.tools.bench_scan [--precision bf16]
        [--tile 3200] [--iters 128]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _get_capture():
    path = "/root/reference/test/capbuf_0000.it"
    if os.path.exists(path):
        from lte_cell_scanner_tpu.io import load_it

        d = load_it(path)
        return d["capbuf"], float(d["fc"][0])
    from lte_cell_scanner_tpu.io.simulator import synthetic_capture

    return synthetic_capture(), 739e6


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--precision", choices=("f32", "bf16"), default="f32")
    p.add_argument("--layout", choices=("roll", "tea", "tea3"),
                   default="tea")
    p.add_argument("--tile", type=int, default=None)
    p.add_argument("--iters", type=int, default=128)
    p.add_argument("--ppm", type=float, default=100.0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lte_cell_scanner_tpu.constants import DS_COMB_ARM
    from lte_cell_scanner_tpu.ops.peak_jax import (peak_search_device,
                                                   r_th1_normalized)
    from lte_cell_scanner_tpu.ops.xcorr_pallas import (DEFAULT_TILE,
                                                       pad_capture,
                                                       scan_plan,
                                                       xcorr_core_pallas,
                                                       xcorr_fold_pallas)

    tile = args.tile if args.tile is not None else DEFAULT_TILE
    cap, fc = _get_capture()
    n_extra = int(np.floor((fc * args.ppm / 1e6 + 2.5e3) / 5e3))
    fset = np.arange(-n_extra, n_extra + 1) * 5e3
    n_cap = len(cap)
    n_comb_sp = (n_cap - 136 - 137) // 9600

    bank, bases, offs, halo, n_tile, n_comb_xc, pad_len = scan_plan(
        n_cap, fset, fc, fc, 1.92e6, tile=tile,
        precision=args.precision, layout=args.layout)
    cap2 = pad_capture(np.stack([cap.real, cap.imag]).astype(np.float32),
                       pad_len)
    cap_j, bank_j = jnp.asarray(cap2), jnp.asarray(bank)
    bases_j = jnp.asarray(bases)
    offs_j = None if offs is None else jnp.asarray(offs)
    r_norm = r_th1_normalized(n_comb_xc, DS_COMB_ARM)
    interpret = jax.default_backend() == "cpu"

    def chain(body, n):
        """Chained scan: each iteration's input depends on the previous
        output, so XLA can neither CSE nor overlap the iterations."""

        def step(c, _):
            out = body(c)
            eps = jnp.where(out > 1e30, 1.0, 0.0).astype(c.dtype)
            return c + eps, out

        @jax.jit
        def run(c):
            return jax.lax.scan(step, c, None, length=n)[1]

        return run

    def fold_body(c):
        single = xcorr_fold_pallas(c, bank_j, bases_j, offs_j, n_comb_xc,
                                   tile=tile, halo=halo, n_tile=n_tile,
                                   interpret=interpret)
        return single[0, 0, 0].astype(jnp.float32)

    def scan_body(c):
        packed, single, _ = xcorr_core_pallas(
            c, bank_j, bases_j, offs_j, n_comb_xc, n_comb_sp, DS_COMB_ARM,
            tile=tile, halo=halo, n_tile=n_tile, interpret=interpret)
        peaks = peak_search_device(packed, single, r_norm, DS_COMB_ARM)
        return peaks[0, 0]

    results = {}
    for name, body in (("correlate_fold", fold_body), ("full_scan",
                                                       scan_body)):
        times = {}
        for n in (args.iters // 4, args.iters):
            run = chain(body, n)
            np.asarray(run(cap_j))                  # compile
            t0 = time.time()
            # np.asarray forces a real D2H fetch; block_until_ready can
            # return on dispatch ACK through the tunnel (see CLAUDE.md).
            np.asarray(run(cap_j))
            times[n] = time.time() - t0
        n1, n2 = sorted(times)
        per = (times[n2] - times[n1]) / (n2 - n1)
        results[f"{name}_ms"] = round(per * 1e3, 3)

    gflop = 2 * bank.shape[-2] * bank.shape[-1] * (n_cap - 136) / 1e9
    results.update({
        "metric": "device_scan_latency_ms",
        "value": results["full_scan_ms"],
        "unit": "ms",
        "precision": args.precision,
        "layout": args.layout,
        "tile": tile,
        "n_f": len(fset),
        "matmul_gflop": round(gflop, 1),
        "samples_per_sec": int(n_cap / (results["full_scan_ms"] / 1e3)),
    })
    print(json.dumps(results))


if __name__ == "__main__":
    main()
