"""Headline benchmark: cell-search scan throughput per chip.

Prints ONE JSON line:
    {"metric": "cellsearch_wallclock_per_fc_ms", "value": ..., "unit": "ms",
     "vs_baseline": ...}

The reference's headline number is ~6 s of wall clock per center frequency
at ppm=100 (31 frequency hypotheses x 3 PSS over an 80 ms capture) on a
dual-core i7-2640 (doc/CellSearch.html:52-55, BASELINE.md). This benchmark
measures the same work end-to-end on one TPU chip: raw uint8 IQ bytes
(the radio's native format) shipped host->device, the fused Pallas scan
(correlation bank on the MXU + incoherent k_factor fold + delay-spread
smooth + power estimate + collapse), the packed-table device->host fetch,
and the host-side threshold + greedy peak scan — amortized over a batch of
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
    from lte_cell_scanner_tpu.ops.peak_jax import (peaks_to_cells,
                                                   r_th1_normalized,
                                                   scan_and_peaks_pallas)
    from lte_cell_scanner_tpu.ops.xcorr_pallas import pad_capture, scan_plan

    cap, fc = _get_capture()
    fset = np.arange(-15, 16) * 5e3  # ppm=100 at 739 MHz -> 31 hypotheses
    B = 32
    n_cap = len(cap)
    n_comb_sp = (n_cap - 136 - 137) // 9600

    bank, bases, offs, halo, n_tile, n_comb_xc, pad_len = scan_plan(
        n_cap, fset, fc, fc, 1.92e6)
    bank_j = jnp.asarray(bank)
    bases_j = jnp.asarray(bases)
    offs_j = jnp.asarray(offs)
    r_norm = r_th1_normalized(n_comb_xc, DS_COMB_ARM)

    # Raw radio bytes: (B, 2, n_cap) uint8, converted on device.
    cap2 = np.stack([cap.real, cap.imag]).astype(np.float32)
    u8_one = pad_capture(
        np.clip(np.round(cap2 * 128.0 + 127.0), 0, 255).astype(np.uint8),
        pad_len)
    u8 = np.stack([u8_one] * B)

    interpret = jax.default_backend() == "cpu"  # no-TPU fallback

    def scan_all(u8b):
        return jnp.stack([
            scan_and_peaks_pallas(u8b[b], bank_j, bases_j, offs_j, r_norm,
                                  n_comb_xc, n_comb_sp, DS_COMB_ARM,
                                  halo=halo, n_tile=n_tile,
                                  interpret=interpret)
            for b in range(B)
        ])

    scan_jit = jax.jit(scan_all)

    def scan_batch():
        dev = jax.device_put(u8)
        return np.asarray(scan_jit(dev), dtype=np.float64)

    tables = scan_batch()  # compile
    times = []
    for _ in range(10):
        t0 = time.time()
        tables = scan_batch()
        times.append(time.time() - t0)
    scan_ms_per_fc = min(times) / B * 1e3

    # Host tail: unpack the peak lists.
    t0 = time.time()
    cells = [peaks_to_cells(tables[b], fset, fc, fc) for b in range(B)]
    host_ms_per_fc = (time.time() - t0) / B * 1e3
    assert all(len(c) >= 1 for c in cells) or not os.path.exists(
        "/root/reference/test/capbuf_0000.it")

    total = scan_ms_per_fc + host_ms_per_fc
    print(json.dumps({
        "metric": "cellsearch_wallclock_per_fc_ms",
        "value": round(total, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS_PER_FC / total, 1),
    }))


if __name__ == "__main__":
    main()
