"""Scratch: per-stage wall breakdown of the deep-pipelined sweep loop.

Mirrors bench.py's run_pipelined(defer_sync=True) with time stamps per
stage to attribute the per-batch overhead above the byte floor.
"""

import os
import time
from collections import defaultdict

import numpy as np

B = int(os.environ.get("LTE_BENCH_B", "64"))
REPS = 8


def main():
    import jax
    import jax.numpy as jnp

    from lte_cell_scanner_tpu.constants import (DS_COMB_ARM,
                                                THRESH2_N_SIGMA)
    from lte_cell_scanner_tpu.io import load_it
    from lte_cell_scanner_tpu.ops.mib_jax import (decode_mib_batch,
                                                  finish_mib_batch)
    from lte_cell_scanner_tpu.ops.peak_jax import (peaks_to_cells,
                                                   r_th1_normalized,
                                                   scan_and_peaks_pallas)
    from lte_cell_scanner_tpu.ops.sync_jax import (finish_sync_batch,
                                                   sss_foe_batch)
    from lte_cell_scanner_tpu.ops.xcorr_pallas import scan_plan

    d = load_it("/root/reference/test/capbuf_0000.it")
    cap, fc = d["capbuf"], float(d["fc"][0])
    fset = np.arange(-15, 16) * 5e3
    n_cap = len(cap)
    n_comb_sp = (n_cap - 136 - 137) // 9600
    bank, bases, offs, halo, n_tile, n_comb_xc, pad_len = scan_plan(
        n_cap, fset, fc, fc, 1.92e6)
    bank_j = jnp.asarray(bank)
    bases_j = jnp.asarray(bases)
    offs_j = None if offs is None else jnp.asarray(offs)
    front = pad_len[0] if isinstance(pad_len, tuple) else 0
    r_norm = r_th1_normalized(n_comb_xc, DS_COMB_ARM)
    cap2 = np.stack([cap.real, cap.imag]).astype(np.float32)
    u8_one = np.clip(np.round(cap2 * 128.0 + 127.0), 0,
                     255).astype(np.uint8)
    u8 = np.stack([u8_one] * B)
    total_pad = pad_len[1] if isinstance(pad_len, tuple) else pad_len
    back = total_pad - front - n_cap

    def scan_all(u8b):
        u8p = jnp.pad(u8b, ((0, 0), (0, 0), (front, back)),
                      constant_values=np.uint8(127))

        def one(c):
            return scan_and_peaks_pallas(c, bank_j, bases_j, offs_j,
                                         r_norm, n_comb_xc, n_comb_sp,
                                         DS_COMB_ARM, halo=halo,
                                         n_tile=n_tile)

        return jax.lax.map(one, u8p)

    scan_jit = jax.jit(scan_all)

    @jax.jit
    def to_flat(u8b):
        f = (u8b.astype(jnp.float32) - 127.0) / 128.0
        return jnp.moveaxis(f, 1, 2).reshape(B * n_cap, 2)

    T = defaultdict(float)

    def tic():
        return time.time()

    def sync_dispatch_batch(tables, cap_flat):
        t0 = tic()
        cells, bases_c = [], []
        for b in range(B):
            for c in peaks_to_cells(tables[b], fset, fc, fc):
                cells.append(c)
                bases_c.append(b * n_cap)
        T["peaks_to_cells"] += tic() - t0
        t0 = tic()
        sp = sss_foe_batch(cells, None, 0.0, 0.0, 1.92e6,
                           THRESH2_N_SIGMA, cap_dev=cap_flat,
                           n_cap=n_cap, cap_bases=bases_c, defer=True)
        T["sync_plan_dispatch"] += tic() - t0
        return sp, bases_c, cap_flat

    def mib_dispatch_batch(sp, bases_c, cap_flat):
        t0 = tic()
        synced = finish_sync_batch(sp)
        T["finish_sync"] += tic() - t0
        t0 = tic()
        alive = [(c, base) for c, base in zip(synced, bases_c)
                 if c.n_id_1 >= 0]
        pendings = []
        for cp in ("normal", "extended"):
            grp = [(c, base) for c, base in alive if c.cp_type == cp]
            if grp:
                pendings.append(decode_mib_batch(
                    [c for c, _ in grp], None, 0.0, 0.0, 1.92e6,
                    cap_dev=cap_flat, n_cap=n_cap,
                    cap_bases=[g for _, g in grp], defer=True))
        T["mib_plan_dispatch"] += tic() - t0
        return pendings

    def finish_batch(pendings):
        t0 = tic()
        out = []
        for p in pendings:
            out += finish_mib_batch(p)
        T["finish_mib"] += tic() - t0
        return [c for c in out if c.n_rb_dl >= 0]

    def _async_copy(a):
        try:
            a.copy_to_host_async()
        except Exception:
            pass

    from concurrent.futures import ThreadPoolExecutor

    # Warm-up.
    dev = jax.device_put(u8)
    tables = np.asarray(scan_jit(dev), dtype=np.float64)
    flat = to_flat(dev)
    sp = sync_dispatch_batch(tables, flat)
    pend = mib_dispatch_batch(*sp)
    finish_batch(pend)
    T.clear()

    with ThreadPoolExecutor(1) as ex:
        fut = ex.submit(jax.device_put, u8)
        dev = fut.result()
        scan_out = scan_jit(dev)
        _async_copy(scan_out)
        flat = to_flat(dev)
        fut = ex.submit(jax.device_put, u8)
        t_all = tic()
        sync_prev = None
        mib_prev = None
        for i in range(REPS):
            t0 = tic()
            tables = np.asarray(scan_out, dtype=np.float64)
            T["tables_fetch"] += tic() - t0
            sp_i = sync_dispatch_batch(tables, flat)
            if mib_prev is not None:
                finish_batch(mib_prev)
                mib_prev = None
            if sync_prev is not None:
                mib_prev = mib_dispatch_batch(*sync_prev)
            sync_prev = sp_i
            if i + 1 < REPS:
                t0 = tic()
                dev = fut.result()
                T["upload_wait"] += tic() - t0
                t0 = tic()
                scan_out = scan_jit(dev)
                _async_copy(scan_out)
                flat = to_flat(dev)
                T["scan_dispatch"] += tic() - t0
                if i + 2 < REPS:
                    fut = ex.submit(jax.device_put, u8)
        if sync_prev is not None:
            tail = mib_dispatch_batch(*sync_prev)
            if mib_prev is not None:
                finish_batch(mib_prev)
            finish_batch(tail)
        elif mib_prev is not None:
            finish_batch(mib_prev)
        wall = tic() - t_all

    tot = sum(T.values())
    print(f"wall {wall*1e3/REPS/B:.2f} ms/fc over {REPS} batches of {B}")
    for k, v in sorted(T.items(), key=lambda kv: -kv[1]):
        print(f"  {k:20s} {v*1e3/REPS:8.1f} ms/batch "
              f"{v*1e3/REPS/B:6.3f} ms/fc")
    print(f"  {'(accounted)':20s} {tot*1e3/REPS:8.1f} ms/batch")


if __name__ == "__main__":
    main()
