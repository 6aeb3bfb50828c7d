"""Headline benchmark: cell-search scan throughput per chip.

Prints ONE JSON line:
    {"metric": "cellsearch_wallclock_per_fc_ms", "value": ..., "unit": "ms",
     "vs_baseline": ...}

The reference's headline number is ~6 s of wall clock per center frequency
at ppm=100 (31 frequency hypotheses x 3 PSS over an 80 ms capture) on a
dual-core i7-2640 (doc/CellSearch.html:52-55, BASELINE.md). This benchmark
measures the same work end-to-end on one TPU chip: the batched device scan
(correlation bank + incoherent combining + power estimate + collapse) plus
the host-side peak search and threshold, amortized over a batch of
captures as the fc sweep runs in production. vs_baseline > 1 means faster
than the reference.
"""

import json
import os
import time

import numpy as np

BASELINE_MS_PER_FC = 6000.0


def _get_capture():
    path = "/root/reference/test/capbuf_0000.it"
    if os.path.exists(path):
        from lte_cell_scanner_tpu.io import load_it

        d = load_it(path)
        return d["capbuf"], float(d["fc"][0])
    # Self-contained fallback: synthesized DL signal.
    from lte_cell_scanner_tpu.io.simulator import synthetic_capture

    return synthetic_capture(), 739e6


def main():
    import jax
    import jax.numpy as jnp

    from lte_cell_scanner_tpu.constants import DS_COMB_ARM
    from lte_cell_scanner_tpu.ops.peak import peak_search
    from lte_cell_scanner_tpu.ops.xcorr import (fold_start_indices,
                                                shifted_templates)
    from lte_cell_scanner_tpu.ops.xcorr_jax import xcorr_pss_core_batch
    from lte_cell_scanner_tpu.search.cell_search import detection_threshold

    cap, fc = _get_capture()
    fset = np.arange(-15, 16) * 5e3  # ppm=100 at 739 MHz -> 31 hypotheses
    B = 8
    n_cap = len(cap)
    n_lags = n_cap - 136
    n_comb_xc = (n_lags - 100) // 9600
    n_comb_sp = (n_cap - 136 - 137) // 9600

    caps = np.stack([cap] * B)
    cap_ri = jnp.asarray(np.stack([caps.real, caps.imag], -1).astype(np.float32))
    tpl = shifted_templates(fset, fc, fc, 1.92e6).reshape(-1, 137)
    tre = jnp.asarray(tpl.real.astype(np.float32))
    tim = jnp.asarray(tpl.imag.astype(np.float32))
    starts = jnp.asarray(
        fold_start_indices(fset, n_comb_xc, fc, fc, 1.92e6).astype(np.int32))

    def scan_batch():
        packed, single, inc = xcorr_pss_core_batch(
            cap_ri, tre, tim, starts, n_comb_sp, DS_COMB_ARM)
        return np.asarray(packed, dtype=np.float64)

    packed = scan_batch()  # compile
    times = []
    for _ in range(5):
        t0 = time.time()
        packed = scan_batch()
        times.append(time.time() - t0)
    scan_ms_per_fc = min(times) / B * 1e3

    # Host tail: threshold + greedy peak scan for every capture.
    t0 = time.time()
    for b in range(B):
        pow_, frq, sp = packed[b, :3], packed[b, 3:6].astype(int), packed[b, 6]
        z = detection_threshold(sp, n_comb_xc)
        single_rep = np.repeat(pow_[:, :, None], len(fset), axis=2)
        peak_search(pow_, frq, z, fset, fc, fc, single_rep, DS_COMB_ARM)
    host_ms_per_fc = (time.time() - t0) / B * 1e3

    total = scan_ms_per_fc + host_ms_per_fc
    print(json.dumps({
        "metric": "cellsearch_wallclock_per_fc_ms",
        "value": round(total, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS_PER_FC / total, 1),
    }))


if __name__ == "__main__":
    main()
