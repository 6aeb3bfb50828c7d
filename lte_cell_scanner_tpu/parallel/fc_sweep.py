"""Data-parallel fc sweep: whole captures sharded across the device mesh.

The carrier-frequency loop is the reference's outermost, embarrassingly
parallel axis (src/CellSearch.cpp:471; SURVEY §2.9 names it the primary
TPU scaling axis). Each device runs the complete single-capture scan —
correlation bank, incoherent k_factor fold, delay-spread smoothing, power
estimate, threshold, greedy peak extraction — on its share of the
captures; the only host traffic is the per-capture peak tables (~1 KB
each). Combined with the (seq, hyp) sharding in sharded_search.py this
covers all three parallel axes of the problem.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lte_cell_scanner_tpu.constants import DS_COMB_ARM, HALF_FRAME, PSS_TD_LEN
from lte_cell_scanner_tpu.models.cell import Cell
from lte_cell_scanner_tpu.ops.peak_jax import (
    MAX_PEAKS,
    peak_search_device,
    peaks_to_cells,
    r_th1_normalized,
)
from lte_cell_scanner_tpu.ops.xcorr import (fold_start_indices,
                                            n_comb_sp_for, n_comb_xc_for,
                                            shifted_templates)
from lte_cell_scanner_tpu.ops.xcorr_jax import _xcorr_core


def make_cap_mesh(n_cap_shards: int) -> Mesh:
    devs = np.array(jax.devices()[:n_cap_shards])
    return Mesh(devs, axis_names=("cap",))


def sharded_fc_sweep(capbufs: np.ndarray, fc_list: Sequence[float],
                     f_search_set: np.ndarray, mesh: Mesh,
                     fs_programmed: float = 1.92e6,
                     ds_comb_arm: int = DS_COMB_ARM,
                     max_peaks: int = MAX_PEAKS) -> List[List[Cell]]:
    """Scan B captures (one per center frequency) data-parallel over the
    ``cap`` mesh axis. Returns the candidate peak list per capture.

    B must be a multiple of the mesh size. Each capture gets its own
    frequency-shifted template bank and fold schedule (fc-dependent
    k_factor arithmetic), built on host and sharded alongside it.
    """
    capbufs = np.asarray(capbufs)
    B, n_cap = capbufs.shape
    n_shards = mesh.shape["cap"]
    if B % n_shards:
        raise ValueError(f"B={B} not divisible by cap shards {n_shards}")
    f_search_set = np.asarray(f_search_set, dtype=np.float64)
    n_lags = n_cap - (PSS_TD_LEN - 1)
    # The fold count must be uniform across the batch (static shapes):
    # take the min over the swept carriers.
    n_comb_xc = min(n_comb_xc_for(n_lags, f_search_set, fc, fc,
                                  fs_programmed) for fc in fc_list)
    n_comb_sp = n_comb_sp_for(n_cap)
    r_norm = r_th1_normalized(n_comb_xc, ds_comb_arm)

    cap_ri = np.stack([capbufs.real, capbufs.imag], -1).astype(np.float32)
    tre = np.zeros((B, 3 * len(f_search_set), PSS_TD_LEN), np.float32)
    tim = np.zeros_like(tre)
    starts = np.zeros((B, len(f_search_set), n_comb_xc), np.int32)
    for b, fc in enumerate(fc_list):
        tpl = shifted_templates(f_search_set, fc, fc,
                                fs_programmed).reshape(-1, PSS_TD_LEN)
        tre[b] = tpl.real
        tim[b] = tpl.imag
        starts[b] = fold_start_indices(f_search_set, n_comb_xc, fc, fc,
                                       fs_programmed)

    def scan_one(cap, tr, ti, st):
        packed, single, _ = _xcorr_core(cap, tr, ti, st,
                                        n_comb_sp=n_comb_sp,
                                        ds_comb_arm=ds_comb_arm)
        return peak_search_device(packed, single, r_norm, ds_comb_arm,
                                  max_peaks=max_peaks)

    sweep = jax.vmap(scan_one)
    shard = NamedSharding(mesh, P("cap"))
    args = [jax.device_put(jnp.asarray(x), shard)
            for x in (cap_ri, tre, tim, starts)]
    tables = np.asarray(jax.jit(sweep)(*args))

    out: List[List[Cell]] = []
    for b, fc in enumerate(fc_list):
        cells = peaks_to_cells(tables[b], f_search_set, fc, fc,
                               fs_programmed)
        if len(cells) >= max_peaks:
            # Device peak table full: the fixed-trip loop may have
            # truncated a denser capture — redo this capture with the
            # unbounded host scan (mirrors search/cell_search.py's
            # fallback for the fused single-capture path).
            from lte_cell_scanner_tpu.ops.peak import peak_search
            from lte_cell_scanner_tpu.ops.xcorr import xcorr_pss
            from lte_cell_scanner_tpu.search.cell_search import \
                detection_threshold

            r = xcorr_pss(capbufs[b], f_search_set, ds_comb_arm, fc, fc,
                          fs_programmed, backend="numpy")
            z_th1 = detection_threshold(r.sp_incoherent, r.n_comb_xc,
                                        ds_comb_arm)
            cells = peak_search(r.xc_incoherent_collapsed_pow,
                                r.xc_incoherent_collapsed_frq, z_th1,
                                f_search_set, fc, fc,
                                r.xc_incoherent_single, ds_comb_arm,
                                fs_programmed)
        out.append(cells)
    return out


def sharded_search_sweep(capbufs: np.ndarray, fc_list: Sequence[float],
                         f_search_set: np.ndarray, mesh: Mesh,
                         fs_programmed: float = 1.92e6,
                         thresh2_n_sigma: float = None,
                         dedup_cells: bool = True):
    """Full cell search of a whole fc sweep: DP-sharded scan + batched
    device decode of EVERY candidate in the sweep.

    The scan runs data-parallel over the ``cap`` mesh axis
    (sharded_fc_sweep); all surviving candidates across all captures are
    then decoded in two fixed-shape device dispatches (sync + MIB) over a
    single stacked capture buffer — the per-candidate chain never touches
    host NumPy. Returns (cells_per_capture, deduped) where ``deduped``
    merges across the sweep like src/CellSearch.cpp:285-319.
    """
    from lte_cell_scanner_tpu.constants import THRESH2_N_SIGMA
    from lte_cell_scanner_tpu.ops.mib_jax import decode_mib_batch
    from lte_cell_scanner_tpu.ops.sync_jax import sss_foe_batch
    from lte_cell_scanner_tpu.search.cell_search import dedup

    if thresh2_n_sigma is None:
        thresh2_n_sigma = THRESH2_N_SIGMA
    capbufs = np.asarray(capbufs)
    B, n_cap = capbufs.shape
    peaks = sharded_fc_sweep(capbufs, fc_list, f_search_set, mesh,
                             fs_programmed)

    # One flattened capture stack; every candidate carries its base.
    flat = np.stack([capbufs.real, capbufs.imag], -1).astype(np.float32)
    cap_dev = jnp.asarray(flat.reshape(B * n_cap, 2))
    all_cells, bases = [], []
    for b in range(B):
        for c in peaks[b]:
            all_cells.append(c)
            bases.append(b * n_cap)
    synced = sss_foe_batch(all_cells, None, 0.0, 0.0, fs_programmed,
                           thresh2_n_sigma, cap_dev=cap_dev, n_cap=n_cap,
                           cap_bases=bases)
    alive = [(c, base) for c, base in zip(synced, bases) if c.n_id_1 >= 0]
    decoded = []
    for cp in ("normal", "extended"):
        group = [(c, base) for c, base in alive if c.cp_type == cp]
        if not group:
            continue
        res = decode_mib_batch([c for c, _ in group], None, 0.0, 0.0,
                               fs_programmed, cap_dev=cap_dev, n_cap=n_cap,
                               cap_bases=[base for _, base in group])
        decoded.extend(res)
    good = [c for c in decoded if c.n_rb_dl >= 0]

    per_cap: List[List[Cell]] = [[] for _ in range(B)]
    fc_of = {float(fc): i for i, fc in enumerate(fc_list)}
    for c in good:
        per_cap[fc_of[float(c.fc_requested)]].append(c)
    return per_cap, (dedup(good) if dedup_cells else good)
