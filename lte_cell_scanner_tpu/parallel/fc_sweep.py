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

import functools

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


_DEV_BANK_CACHE: dict = {}   # sweep-key -> device-resident sharded banks
_JIT_CACHE: dict = {}        # program-key -> jitted sweep callable
                             # (a fresh closure per call would retrace —
                             # and recompile on any shape change — every
                             # sweep invocation)


def _cache_put(cache: dict, key, value, cap: int = 8):
    """Bounded FIFO insert (compiled programs / device banks are MBs)."""
    if len(cache) >= cap:
        cache.pop(next(iter(cache)))
    cache[key] = value


def _to_complex(capbufs: np.ndarray, b: int = None):
    """(B, 2, n) planes (uint8 radio bytes or float) -> complex (B, n)
    (pass-through for complex input); with ``b``, only that capture."""
    if capbufs.ndim != 3:
        return capbufs if b is None else capbufs[b]
    if b is not None:
        capbufs = capbufs[b:b + 1]
    if capbufs.dtype == np.uint8:
        f = (capbufs.astype(np.float32) - 127.0) / 128.0
    else:
        f = capbufs
    c = f[:, 0] + 1j * f[:, 1]
    return c if b is None else c[0]


def _bank_signature(fc: float, fc_prog: float, f_search_set: np.ndarray,
                    fs_programmed: float, n_comb_xc: int,
                    share_banks: bool = False):
    """The inputs a carrier's TEA bank is built from: the f32-cast
    frequency-shifted templates and the integer fold misalignments.

    Two carriers whose signatures are byte-identical can share one
    bank, so a sweep need only build and upload the DISTINCT banks.
    By default the signature is exact (templates + offsets): it
    collapses repeated carriers (and same-fc batches) but NOT a raster
    sweep — the template phase carries an O(f_off^2 t / (fs fc)) term,
    so each 100 kHz raster step moves the f32 templates by a few ulps.

    ``share_banks`` drops the template bytes from the signature: any
    carriers whose integer fold offsets match (contiguous multi-MHz
    spans of the raster — the offsets move ~2e-4 samples per 100 kHz
    and only split at a rounding boundary) share the group's first
    bank. The shared bank's correlation differs by ~1e-6 relative —
    orders below the detection noise floor — and every downstream
    quantity is re-derived in float64 from the detected (ind, freq),
    so decode results are unaffected; it is still opt-in because scan
    scores are then not bit-equal to the per-fc host reference.
    """
    tpl = shifted_templates(f_search_set, fc, fc_prog,
                            fs_programmed).reshape(-1, PSS_TD_LEN)
    st = fold_start_indices(f_search_set, n_comb_xc, fc, fc_prog,
                            fs_programmed)
    d = (st - np.arange(n_comb_xc)[None, :] * HALF_FRAME).astype(np.int64)
    if share_banks:
        return tpl, d, d.tobytes()
    tpl32 = np.stack([tpl.real, tpl.imag], -1).astype(np.float32)
    return tpl, d, tpl32.tobytes() + d.tobytes()


@functools.lru_cache(maxsize=32)   # ~4 MB/bank at production shapes
def _fc_bank(fc: float, fc_prog: float, fset_key: bytes,
             fs_programmed: float, n_cap: int, n_comb_xc: int, s0: int,
             win_rows: int) -> np.ndarray:
    """Cached per-carrier TEA template bank for the DP sweep (the bank
    embeds fc's k_factor fold shifts; sweeps revisit carriers)."""
    from lte_cell_scanner_tpu.ops.xcorr_pallas import _tea_bank

    f_search_set = np.frombuffer(fset_key, dtype=np.float64)
    tpl, d, _ = _bank_signature(fc, fc_prog, f_search_set,
                                fs_programmed, n_comb_xc)
    return _tea_bank(tpl, d, s0, win_rows, "f32")


def make_cap_mesh(n_cap_shards: int) -> Mesh:
    devs = np.array(jax.devices()[:n_cap_shards])
    return Mesh(devs, axis_names=("cap",))


def sharded_fc_sweep(capbufs: np.ndarray, fc_list: Sequence[float],
                     f_search_set: np.ndarray, mesh: Mesh,
                     fs_programmed: float = 1.92e6,
                     ds_comb_arm: int = DS_COMB_ARM,
                     max_peaks: int = MAX_PEAKS,
                     use_pallas: bool = None,
                     fc_prog_list: Sequence[float] = None,
                     return_tables: bool = False,
                     share_banks: bool = False):
    """Scan B captures (one per center frequency) data-parallel over the
    ``cap`` mesh axis. Returns the candidate peak list per capture.

    B must be a multiple of the mesh size. Each capture gets its own
    frequency-shifted template bank and fold schedule (fc-dependent
    k_factor arithmetic), built on host and sharded alongside it.

    use_pallas (default: auto — True on TPU) runs each device's local
    captures through the fused TEA Pallas kernel (~16x the XLA im2col
    core per chip); the fold schedule's window bases are fc-independent,
    so only the per-capture template banks carry the k_factor shifts.

    ``capbufs`` may be complex (B, n_cap) or raw radio bytes — uint8
    (B, 2, n_cap) re/im planes, converted on device (4x less uplink).

    ``fc_prog_list`` carries the tuner's actually-programmed carriers
    (defaults to fc_list) — the k_factor arithmetic uses it exactly as
    the per-fc path does.

    ``capbufs`` may also be a DEVICE-resident jax array of f32
    (B, 2, n_cap) planes (the wideband channelizer's output) — the scan
    then never moves the narrowband data through the host.

    ``return_tables=True`` returns the DEVICE peak-table array (D2H
    copy already started) instead of peak lists — a pipelined sweep
    (search/pipeline.py) collects it a batch later via
    :func:`tables_to_peaks` so the fetch round trip overlaps the next
    batch's upload and scan.
    """
    is_dev = isinstance(capbufs, jax.Array)
    if not is_dev:
        capbufs = np.asarray(capbufs)
    if capbufs.ndim == 3:
        B, _, n_cap = capbufs.shape
    else:
        B, n_cap = capbufs.shape
    fcp = list(fc_list) if fc_prog_list is None else list(fc_prog_list)
    n_shards = mesh.shape["cap"]
    if B % n_shards:
        raise ValueError(f"B={B} not divisible by cap shards {n_shards}")
    f_search_set = np.asarray(f_search_set, dtype=np.float64)
    n_lags = n_cap - (PSS_TD_LEN - 1)
    # The fold count must be uniform across the batch (static shapes):
    # take the min over the swept carriers.
    n_comb_xc = min(n_comb_xc_for(n_lags, f_search_set, fc_list[b],
                                  fcp[b], fs_programmed)
                    for b in range(B))
    n_comb_sp = n_comb_sp_for(n_cap)
    r_norm = r_th1_normalized(n_comb_xc, ds_comb_arm)
    if use_pallas is None:
        use_pallas = jax.default_backend() != "cpu"

    n_f = len(f_search_set)
    starts = np.zeros((B, n_f, n_comb_xc), np.int32)
    for b in range(B):
        starts[b] = fold_start_indices(f_search_set, n_comb_xc,
                                       fc_list[b], fcp[b], fs_programmed)

    shard = NamedSharding(mesh, P("cap"))
    if use_pallas:
        from lte_cell_scanner_tpu.ops.xcorr_pallas import _tea_fits
        if not _tea_fits(starts.reshape(B * n_f, n_comb_xc)):
            use_pallas = False   # extreme ppm/length: XLA core instead
    if use_pallas:
        from jax import shard_map

        from lte_cell_scanner_tpu.ops.xcorr_pallas import (
            DEFAULT_TILE, plan_tiles_tea, xcorr_core_pallas)

        # One shared schedule for the whole sweep: the bases are
        # fc-independent; the per-fc fold misalignments d live in the
        # per-capture banks (sized by the sweep-global extremes).
        bases, d_all, s0, s_col, win_rows, n_tile, pad = plan_tiles_tea(
            n_cap, starts.reshape(B * n_f, n_comb_xc), tile=DEFAULT_TILE)
        d_all = d_all.reshape(B, n_f, n_comb_xc)
        # The bank is the sweep's largest upload (~4 MB/carrier vs
        # 307 KB/capture), so carriers that would get BYTE-IDENTICAL
        # banks share one: dedupe by the exact construction signature
        # (f32 templates + integer fold offsets — see _bank_signature;
        # nearby carriers collide almost always), upload only the
        # distinct banks REPLICATED across the mesh, and give each
        # capture a bank index (sharded with it). A one-pass 32-fc
        # chunk then ships 1-3 banks, not 32. The device-resident
        # result is also cached across sweep calls (sweeps revisit
        # carriers batch after batch).
        fset_key = f_search_set.tobytes()
        mesh_key = (tuple(str(d) for d in mesh.devices.flat),
                    tuple(mesh.shape.items()))
        dev_key = (tuple(fc_list), tuple(fcp), fset_key, fs_programmed,
                   n_cap, n_comb_xc, mesh_key, share_banks)
        dev_entry = _DEV_BANK_CACHE.get(dev_key)
        if dev_entry is None:
            sig_to_u, uniq = {}, []
            bank_idx = np.zeros(B, np.int32)
            for b in range(B):
                _, _, sig = _bank_signature(fc_list[b], fcp[b],
                                            f_search_set, fs_programmed,
                                            n_comb_xc, share_banks)
                u = sig_to_u.get(sig)
                if u is None:
                    u = sig_to_u[sig] = len(uniq)
                    uniq.append(_fc_bank(fc_list[b], fcp[b], fset_key,
                                         fs_programmed, n_cap,
                                         n_comb_xc, s0, win_rows))
                bank_idx[b] = u
            n_u = 1                      # power-of-2 bucket: bounded
            while n_u < len(uniq):       # recompiles, padded rows are
                n_u *= 2                 # repeats of bank 0
            uniq += [uniq[0]] * (n_u - len(uniq))
            rep = NamedSharding(mesh, P())
            dev_entry = (jax.device_put(jnp.asarray(np.stack(uniq)), rep),
                         jax.device_put(jnp.asarray(bank_idx), shard))
            _cache_put(_DEV_BANK_CACHE, dev_key, dev_entry)
        dev_banks, dev_bank_idx = dev_entry
        # The capture crosses the link UNPADDED — each shard applies
        # the TEA front/back padding on device (sample axis only, so
        # per-shard padding is exact and no pad bytes ride the link).
        if is_dev:
            cap2 = capbufs
        elif capbufs.dtype == np.uint8:
            cap2 = capbufs                         # (B, 2, n_cap) u8
        else:
            cap2 = np.stack([capbufs.real, capbufs.imag],
                            1).astype(np.float32)
        front, total = pad
        back = total - front - n_cap
        interpret = jax.default_backend() == "cpu"
        # s_col/win_rows/n_tile (and the in-program pad geometry) are
        # baked into the closure below: they depend on the search
        # grid's fold-misalignment range, so two grids with identical
        # shapes can still need different kernels.
        jit_key = ("pallas", mesh_key, n_cap, n_comb_xc, n_comb_sp,
                   ds_comb_arm, float(r_norm), max_peaks, s_col,
                   win_rows, n_tile)
        sweep_jit = _JIT_CACHE.get(jit_key)
        if sweep_jit is None:
            bases_j = jnp.asarray(bases)

            def local_scan(cap_loc, banks_all, idx_loc):
                fill = (np.uint8(127) if cap_loc.dtype == jnp.uint8
                        else cap_loc.dtype.type(0))  # zero-level sample
                cap_p = jnp.pad(cap_loc, ((0, 0), (0, 0), (front, back)),
                                constant_values=fill)

                def one(args):
                    c, ix = args
                    bk = banks_all[ix]   # XLA row gather, outside Pallas
                    packed, single, _ = xcorr_core_pallas(
                        c, bk, bases_j, None, n_comb_xc, n_comb_sp,
                        ds_comb_arm, tile=DEFAULT_TILE, halo=s_col,
                        n_tile=n_tile, interpret=interpret)
                    return peak_search_device(packed, single, r_norm,
                                              ds_comb_arm,
                                              max_peaks=max_peaks)

                return jax.lax.map(one, (cap_p, idx_loc))

            sweep_jit = jax.jit(shard_map(local_scan, mesh=mesh,
                                          in_specs=(P("cap"), P(),
                                                    P("cap")),
                                          out_specs=P("cap"),
                                          check_vma=False))
            _cache_put(_JIT_CACHE, jit_key, sweep_jit)
        cap_dev = jax.device_put(jnp.asarray(cap2), shard)
        tables_dev = sweep_jit(cap_dev, dev_banks, dev_bank_idx)
    else:
        cc = _to_complex(np.asarray(capbufs))
        cap_ri = np.stack([cc.real, cc.imag], -1).astype(np.float32)
        tpls = [shifted_templates(f_search_set, fc_list[b], fcp[b],
                                  fs_programmed).reshape(-1, PSS_TD_LEN)
                for b in range(B)]
        tre = np.stack([t.real for t in tpls]).astype(np.float32)
        tim = np.stack([t.imag for t in tpls]).astype(np.float32)

        mesh_key = (tuple(str(d) for d in mesh.devices.flat),
                    tuple(mesh.shape.items()))
        jit_key = ("xla", mesh_key, n_comb_sp, ds_comb_arm,
                   float(r_norm), max_peaks)
        sweep_jit = _JIT_CACHE.get(jit_key)
        if sweep_jit is None:
            def scan_one(cap, tr, ti, st):
                packed, single, _ = _xcorr_core(cap, tr, ti, st,
                                                n_comb_sp=n_comb_sp,
                                                ds_comb_arm=ds_comb_arm)
                return peak_search_device(packed, single, r_norm,
                                          ds_comb_arm,
                                          max_peaks=max_peaks)

            sweep_jit = jax.jit(jax.vmap(scan_one))
            _cache_put(_JIT_CACHE, jit_key, sweep_jit)
        args = [jax.device_put(jnp.asarray(x), shard)
                for x in (cap_ri, tre, tim, starts)]
        tables_dev = sweep_jit(*args)

    if return_tables:
        # Pipelined callers collect the DEVICE table array themselves
        # (after overlapping its D2H copy with other work) and convert
        # via tables_to_peaks; start the copy now so the fetch round
        # trip rides behind whatever the caller does next.
        try:
            tables_dev.copy_to_host_async()
        except Exception:   # backend without async copies: fetch later
            pass
        return tables_dev
    return tables_to_peaks(np.asarray(tables_dev), capbufs, fc_list,
                           f_search_set, fs_programmed, ds_comb_arm,
                           max_peaks, fc_prog_list=fcp)


def tables_to_peaks(tables: np.ndarray, capbufs, fc_list: Sequence[float],
                    f_search_set: np.ndarray, fs_programmed: float = 1.92e6,
                    ds_comb_arm: int = DS_COMB_ARM,
                    max_peaks: int = MAX_PEAKS,
                    fc_prog_list: Sequence[float] = None
                    ) -> List[List[Cell]]:
    """Host tail of the DP scan: per-capture peak tables -> Cell
    candidates, with the unbounded host rescan fallback when a device
    table filled up (mirrors search/cell_search.py's fallback for the
    fused single-capture path; reference peak loop
    src/CellSearch.cpp:471-569).

    ``capbufs`` may be the (B, 2, n)/(B, n) capture array, or a callable
    ``b -> one capture`` ((2, n) planes or (n,) complex) so callers
    holding large batches (search/pipeline.py) don't materialize a copy
    for the rare fallback."""
    fcp = list(fc_list) if fc_prog_list is None else list(fc_prog_list)
    out: List[List[Cell]] = []
    for b, fc in enumerate(fc_list):
        cells = peaks_to_cells(tables[b], f_search_set, fc, fcp[b],
                               fs_programmed)
        if len(cells) >= max_peaks:
            # Device peak table full: the fixed-trip loop may have
            # truncated a denser capture — redo this capture with the
            # unbounded host scan.
            from lte_cell_scanner_tpu.ops.peak import peak_search
            from lte_cell_scanner_tpu.ops.xcorr import xcorr_pss
            from lte_cell_scanner_tpu.search.cell_search import \
                detection_threshold

            cap_b = (_to_complex(np.asarray(capbufs(b))[None], 0)
                     if callable(capbufs)
                     else _to_complex(np.asarray(capbufs), b))
            r = xcorr_pss(cap_b,
                          f_search_set,
                          ds_comb_arm, fc, fcp[b],
                          fs_programmed, backend="numpy")
            z_th1 = detection_threshold(r.sp_incoherent, r.n_comb_xc,
                                        ds_comb_arm)
            cells = peak_search(r.xc_incoherent_collapsed_pow,
                                r.xc_incoherent_collapsed_frq, z_th1,
                                f_search_set, fc, fcp[b],
                                r.xc_incoherent_single, ds_comb_arm,
                                fs_programmed)
        out.append(cells)
    return out


def sharded_search_sweep(capbufs: np.ndarray, fc_list: Sequence[float],
                         f_search_set: np.ndarray, mesh: Mesh,
                         fs_programmed: float = 1.92e6,
                         thresh2_n_sigma: float = None,
                         dedup_cells: bool = True,
                         fc_prog_list: Sequence[float] = None,
                         share_banks: bool = False):
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
    is_dev = isinstance(capbufs, jax.Array)
    if not is_dev:
        capbufs = np.asarray(capbufs)
    if capbufs.ndim == 3:
        B, _, n_cap = capbufs.shape
    else:
        B, n_cap = capbufs.shape
    peaks = sharded_fc_sweep(capbufs, fc_list, f_search_set, mesh,
                             fs_programmed, fc_prog_list=fc_prog_list,
                             share_banks=share_banks)

    # One flattened capture stack; every candidate carries its base.
    if is_dev:
        cap_dev = jax.jit(
            lambda u: jnp.moveaxis(u, 1, 2).reshape(B * n_cap, 2)
        )(capbufs)
    elif capbufs.dtype == np.uint8:
        cap_dev = jax.jit(
            lambda u: jnp.moveaxis((u.astype(jnp.float32) - 127.0)
                                   / 128.0, 1, 2).reshape(B * n_cap, 2)
        )(jnp.asarray(capbufs))
    else:
        flat = np.stack([capbufs.real, capbufs.imag],
                        -1).astype(np.float32)
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
        decoded.extend(zip(res, (base for _, base in group)))
    good = [(c, base) for c, base in decoded if c.n_rb_dl >= 0]

    per_cap: List[List[Cell]] = [[] for _ in range(B)]
    for c, base in good:
        per_cap[base // n_cap].append(c)
    good_cells = [c for c, _ in good]
    return per_cap, (dedup(good_cells) if dedup_cells else good_cells)
