"""Device-only latency of the batched decode chain, per stage.

Times the sync program and the MIB program (ops/sync_jax.py,
ops/mib_jax.py) the only honest way through this machine's tunneled
chip: N data-dependent iterations chained inside ONE jitted `lax.scan`,
per-iteration latency = slope between two chain lengths (see
tools/bench_scan.py / CLAUDE.md). The MIB program is additionally cut
after each milestone (the ``stage`` instrumentation of
`_build_mib_device`) so the 64-candidate batch's device time is
attributed per stage: window gather, DFT grid, TFOEC, TOE, 4-port
channel estimation, PBCH RE extraction, LLR chain, Viterbi+CRC.

Workload: the reference's own recorded capture (2 decodable cells),
tiled to a 32-capture stack = the fc sweep's 64-candidate decode batch
(reference per-candidate chain: src/searcher.cpp:533-1692).

Usage:
    python -m lte_cell_scanner_tpu.tools.bench_decode [--iters 16]
        [--stages wins,tfg,...]   (default: all)
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

STAGES = ("wins", "tfg", "tfoec", "toe", "chanest", "pbch", "llr", "vit",
          "full")


def _get_capture():
    path = "/root/reference/test/capbuf_0000.it"
    if os.path.exists(path):
        from lte_cell_scanner_tpu.io import load_it

        d = load_it(path)
        return d["capbuf"], float(d["fc"][0])
    from lte_cell_scanner_tpu.io.simulator import synthetic_capture

    return synthetic_capture(), 739e6


def _host_cells(cap, fc):
    """Host-path peaks + synced cells (the decode batch's inputs)."""
    from lte_cell_scanner_tpu.constants import DS_COMB_ARM, THRESH2_N_SIGMA
    from lte_cell_scanner_tpu.ops.peak import peak_search
    from lte_cell_scanner_tpu.ops.sync import pss_sss_foe, sss_detect
    from lte_cell_scanner_tpu.ops.xcorr import xcorr_pss
    from lte_cell_scanner_tpu.search.cell_search import detection_threshold

    fset = np.arange(-15, 16) * 5e3
    r = xcorr_pss(cap, fset, DS_COMB_ARM, fc, fc, 1.92e6, backend="numpy")
    z = detection_threshold(r.sp_incoherent, r.n_comb_xc)
    peaks = peak_search(r.xc_incoherent_collapsed_pow,
                        r.xc_incoherent_collapsed_frq, z, fset, fc, fc,
                        r.xc_incoherent_single, DS_COMB_ARM)
    cells = []
    for p in peaks:
        h = sss_detect(dataclasses.replace(p), cap, THRESH2_N_SIGMA,
                       fc, fc, 1.92e6)
        if h.n_id_1 >= 0:
            cells.append(pss_sss_foe(h, cap, fc, fc, 1.92e6))
    return peaks, cells


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--iters", type=int, default=16)
    p.add_argument("--b-cap", type=int, default=32,
                   help="captures in the stacked sweep batch")
    p.add_argument("--stages", default=",".join(STAGES))
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lte_cell_scanner_tpu.constants import THRESH2_N_SIGMA
    from lte_cell_scanner_tpu.ops.mib_jax import (_dev_cell_tables,
                                                  _mib_device,
                                                  _pallas_default,
                                                  mib_plan)
    from lte_cell_scanner_tpu.ops.sync_jax import _sync_device, sync_plan

    cap, fc = _get_capture()
    peaks, cells = _host_cells(cap, fc)
    if not cells:
        raise SystemExit("no decodable cells in the capture")
    n_cap = len(cap)
    b_cap = args.b_cap
    per = max(1, len(cells))
    cells64 = (cells * b_cap)[: per * b_cap]
    peaks64 = (peaks * b_cap)[: per * b_cap]
    bases = [(i // per) * n_cap for i in range(len(cells64))]

    mp = mib_plan(cells64, n_cap, fc, fc, 1.92e6, cap_bases=bases)
    sp = sync_plan(peaks64, n_cap, fc, fc, 1.92e6, cap_bases=bases)

    cap2 = np.stack([cap.real, cap.imag], -1).astype(np.float32)
    cap_flat = jnp.asarray(np.tile(cap2, (b_cap, 1)))

    def chain(body, n):
        def step(c, _):
            s = body(c)
            eps = jnp.where(s > 1e30, 1.0, 0.0).astype(c.dtype)
            return c + eps, s

        @jax.jit
        def run(c):
            return jax.lax.scan(step, c, None, length=n)[1]

        return run

    def slope(body):
        times = {}
        for n in (args.iters // 4, args.iters):
            f = chain(body, n)
            np.asarray(f(cap_flat))               # compile
            t0 = time.time()
            np.asarray(f(cap_flat))
            times[n] = time.time() - t0
        n1, n2 = sorted(times)
        return (times[n2] - times[n1]) / (n2 - n1) * 1e3

    results = {"b_candidates": len(cells64), "b_captures": b_cap}

    def note(k):
        # Incremental progress on stderr: on a flaky tunnel a mid-run
        # wedge must not cost the numbers already measured.
        print(f"# {k}={results[k]}", file=sys.stderr, flush=True)

    # Headline numbers FIRST (sync + full MIB program), then the
    # per-stage cuts — a short tunnel-recovery window still yields the
    # numbers that matter.
    def sync_body(c):
        out = _sync_device(c, sp.pss_idx, sp.rep_mask, sp.foc, sp.inv_fs,
                           sp.n_id_2, sp.foe_pss, sp.foe_sss, sp.foe_mask,
                           sp.foe_seq, sp.foe_phase, sp.foe_conv,
                           THRESH2_N_SIGMA)
        vals = list(out.values()) if isinstance(out, dict) else [out]
        return sum(jnp.sum(v).astype(jnp.float32) for v in vals)

    tabs = _dev_cell_tables(cells64[0].cp_type)

    from lte_cell_scanner_tpu.ops.mib_jax import _pack_plan

    mp_u8, mp_f32 = _pack_plan(mp)

    def mib_body_for(run):
        def body(c, run=run):
            out = run(c, mp_u8, mp_f32, *tabs)
            return jnp.sum(out).astype(jnp.float32)
        return body

    stages = [s for s in args.stages.split(",") if s in STAGES]
    raw = {}                     # unrounded slopes, keyed by MIB stage

    # The sync program is always measured (it is not a MIB stage cut).
    results["sync_ms"] = round(slope(sync_body), 3)
    note("sync_ms")
    for st in ((["full"] if "full" in stages else [])
               + [s for s in stages if s != "full"]):
        if st in raw:
            continue
        # 'full' uses the same lru_cache key as decode_mib_batch — one
        # compiled program, not two. Stage cuts measure the same
        # (production) extract path; the 'wins' cut always uses the XLA
        # gather (the fused kernel has no separate windows milestone).
        up = _pallas_default()
        run = (_mib_device(mp.n_symb_dl, mp.n_ofdm, mp.m_bit,
                           use_pallas=up)
               if st == "full" else
               _mib_device(mp.n_symb_dl, mp.n_ofdm, mp.m_bit, st,
                           use_pallas=up))
        raw[st] = slope(mib_body_for(run))
        results[f"mib_{st}_ms"] = round(raw[st], 3)
        note(f"mib_{st}_ms")

    # Deltas attribute per-stage time from the RAW slopes (rounding
    # each cumulative value first would let the deltas drift off by a
    # ulp of the rounding); meaningful for the pipeline order of
    # STAGES (an out-of-order --stages list still reports honest
    # cumulative *_ms values).
    prev = 0.0
    last_ms = None
    for st in stages:
        ms = raw.get(st)
        if ms is None:
            continue
        results[f"mib_{st}_delta_ms"] = round(ms - prev, 3)
        prev = ms
        last_ms = round(ms, 3)

    results.update({
        "metric": "device_decode_latency_ms",
        "value": results.get("mib_full_ms", last_ms),
        "unit": "ms",
    })
    print(json.dumps(results))


if __name__ == "__main__":
    main()
