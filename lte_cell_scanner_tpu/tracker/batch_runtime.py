"""Batched multi-cell tracker engine.

The host CellTracker (tracker/cell_tracker.py) is the reference-faithful
event-driven implementation: one Python object per cell, one symbol at a
time. This engine is the TPU-native data plane promised in SURVEY §2.9:
every per-symbol and per-RS computation for ALL tracked cells runs in a
few fixed-shape device dispatches per processing cycle —

  dispatch 1: symbol demod + raw-CE extraction for every pending
              (cell, symbol, port)            [batch_frontend.get_fd_batch]
  dispatch 2: CE filtering + FOE/TOE/AC statistics for every complete
              RS triple                       [batch_frontend.*_batch]
  dispatch 3: PSS/SSS sync measurements for every finalized half-frame
              pair                            [batch_frontend.sync_meas]
  dispatch 4: batched tail-biting Viterbi for every cell with a full
              4-frame PBCH window             [models.convcode_jax]

while the host keeps only the sequential control plane: the
inverse-variance feedback blends (global FO, per-cell frame timing) are
applied in the same (cell-major, time-ordered) sequence as the host
tracker, so both implementations converge the same way; FIFO bookkeeping,
MIB health counters and drop logic are shared semantics with
cell_tracker.py (reference: src/tracker_thread.cpp).

Scope note: the per-symbol interpolated channel estimate, which the host
tracker materializes for every OFDM symbol (interp2d,
src/tracker_thread.cpp:372-477), is only evaluated at the symbols that
consume it — PBCH symbols (slot 1, syms 0-3) and the CRS measurement
gate (slots 0/10, syms 5/6). Identical values, a fraction of the
interpolation work, and no per-symbol host loop. Ordering is preserved
with per-symbol sequence numbers: a symbol is finalized (measurements,
PBCH collection) only once every port's interpolation horizon — the
sequence number of its latest filtered CE — has passed it, exactly the
host tracker's "every port has interpolated CE" gate.
"""

from __future__ import annotations

import dataclasses
import functools
from collections import deque
from typing import Deque, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lte_cell_scanner_tpu.constants import FS_LTE
from lte_cell_scanner_tpu.models.convcode_jax import lte_conv_decode_batch
from lte_cell_scanner_tpu.models.crc import lte_calc_crc
from lte_cell_scanner_tpu.models.modulation import lte_demodulate
from lte_cell_scanner_tpu.models.pn import lte_pn
from lte_cell_scanner_tpu.models.pss import pss_fd
from lte_cell_scanner_tpu.models.ratematch import lte_conv_deratematch
from lte_cell_scanner_tpu.models.rs import RSDL
from lte_cell_scanner_tpu.models.sss import sss_fd
from lte_cell_scanner_tpu.ops.pbch import N_RB_DL_TABLE, PHICH_RES_TABLE
from lte_cell_scanner_tpu.tracker import batch_frontend as bf
from lte_cell_scanner_tpu.tracker.state import GlobalState, TrackedCell

_WRAP = 19200.0


def _bucket(n: int, lo: int = 4) -> int:
    """Round up to ~1.25-step bucket sizes so jit cache keys stay few
    while padding waste stays under 25%."""
    b = lo
    while b < n:
        b = max(b + 1, (b * 5) // 4)
        b = -(-b // 4) * 4  # keep multiples of 4
    return b


@dataclasses.dataclass
class _RawCE:
    seq: int
    shift: int
    slot_num: int
    sym_num: int
    ce: np.ndarray
    frequency_offset: float
    frame_timing: float


@dataclasses.dataclass
class _FiltCE:
    seq: int
    shift: int
    slot_num: int
    sym_num: int
    tp: float
    sp: float
    sp_raw: float
    np_: float
    ce_filt: np.ndarray


class _CellCtx:
    """Per-cell bookkeeping the batch engine keeps on host."""

    def __init__(self, cell: TrackedCell):
        self.cell = cell
        self.rs_dl = RSDL(cell.n_id_cell, 6, cell.cp_type)
        m_bit = 1920 if cell.cp_type == "normal" else 1728
        self.scr = lte_pn(cell.n_id_cell, m_bit)
        self.bpo = 0.0  # float64 bulk-phase carry
        self.seq = 0
        n_ports = cell.n_ports
        self.ce_raw_fifo: List[Deque[_RawCE]] = [
            deque() for _ in range(n_ports)]
        self.ce_filt_last: List[Optional[_FiltCE]] = [None] * n_ports
        self.backfilled = [False] * n_ports
        self.horizon = [-1] * n_ports      # seq of latest filtered CE
        self.interp_points: Dict[int, dict] = {}   # seq -> {port: (ce, vals)}
        self.ce_history = [deque(maxlen=72) for _ in range(n_ports)]
        self.pending_syms: Deque = deque()  # (seq, slot, sym, syms72)
        self.mib_fifo: Deque = deque()
        self.mib_fifo_synchronized = False
        self.sss_sym: Optional[np.ndarray] = None

        n1, n2 = divmod(cell.n_id_cell, 3)
        self.pss_conj = np.conj(pss_fd(n2))
        self.sss0 = sss_fd(n1, n2, 0).astype(np.float64)
        self.sss10 = sss_fd(n1, n2, 10).astype(np.float64)


def _key(cell: TrackedCell):
    return (cell.n_id_cell, cell.serial_num)


class BatchTrackerEngine:
    """Tracks any number of cells with shared device dispatches."""

    def __init__(self, state: GlobalState):
        self.state = state
        self.ctx: Dict[tuple, _CellCtx] = {}
        # Raw uint8 sample ring for descriptor-mode PDUs: the stream is
        # uploaded ONCE per cycle and every cell's symbol windows are
        # gathered from it on device — host->device traffic is
        # ~3.8 MB per signal-second TOTAL, independent of cell count.
        self._blocks: Deque = deque()      # (abs_base, (n, 2) uint8)
        self._stream_end = 0

    # ------------------------------------------------------------------
    def push_raw(self, raw_block: np.ndarray) -> None:
        """Append one block of interleaved uint8 IQ to the sample ring."""
        arr = np.asarray(raw_block, dtype=np.uint8).reshape(-1, 2)
        self._blocks.append((self._stream_end, arr))
        self._stream_end += len(arr)

    def _stream_segment(self, lo: int, hi: int) -> np.ndarray:
        """Materialize stream samples [lo, hi) and prune older blocks."""
        while self._blocks and self._blocks[0][0] + len(
                self._blocks[0][1]) <= lo:
            self._blocks.popleft()
        parts = []
        for base, arr in self._blocks:
            if base >= hi:
                break
            a = max(0, lo - base)
            b = min(len(arr), hi - base)
            if a < b:
                parts.append(arr[a:b])
        seg = np.concatenate(parts) if parts else np.zeros((0, 2), np.uint8)
        assert len(seg) == hi - lo, "stream ring is missing samples"
        return seg

    # ------------------------------------------------------------------
    def process_all(self, cells: List[TrackedCell]) -> None:
        cells = [c for c in cells if not c.kill_me]
        live = {_key(c) for c in cells}
        for k in list(self.ctx):
            if k not in live:
                del self.ctx[k]
        for c in cells:
            if _key(c) not in self.ctx:
                self.ctx[_key(c)] = _CellCtx(c)
            # Overload policy (reference: tracker_thread.cpp:856-867).
            n_ofdm_1s = c.n_symb_dl * 2 * 1000
            while len(c.fifo) > n_ofdm_1s * 1.5:
                for _ in range(n_ofdm_1s):
                    c.fifo.popleft()
                self.state.cell_seconds_dropped += 1

        work = [(c, list(c.fifo)) for c in cells if c.fifo]
        for c, _ in work:
            c.fifo.clear()
        if work:
            syms_kept, ce_rows, keep_lists, rs_lists = \
                self._dispatch_demod(work)
            self._host_route(work, syms_kept, ce_rows, keep_lists, rs_lists)
            self._dispatch_stats(work)
        self._finalize(cells)

    # ------------------------------------------------------------------
    def _dispatch_demod(self, work):
        """Dispatch 1: demod every pending symbol of every cell; extract
        raw CE at every RS position. Only the symbols the host actually
        consumes — sync-channel and PBCH symbols — and the RS-position
        CEs come back to the host (device-side gather; the full symbol
        grid never leaves the chip)."""
        state = self.state
        C = len(work)
        S = _bucket(max(len(p) for _, p in work))
        P = max(c.n_ports for c, _ in work)

        # The descriptor mode ships the raw uint8 stream ONCE and gathers
        # every cell's windows from it on device; legacy data-carrying
        # PDUs are quantized back to the uint8 grid they came from (the
        # tracker input contract is the uint8 sample FIFO, reference:
        # src/LTE-Tracker.cpp:833-866) and uploaded per window.
        stream_mode = work[0][1][0].start is not None
        if stream_mode:
            starts = np.zeros((C, S), np.int64)
        else:
            data = np.zeros((C, S, 128, 2), np.uint8)
        foc_rate = np.zeros((C, S), np.float32)
        late = np.zeros((C, S), np.float32)
        fo = np.zeros((C, S), np.float64)
        n_samp = np.full((C, S), 128.0 + 9.0)
        bpo0 = np.zeros(C, np.float64)
        keep_lists = []     # per cell: si of sync/PBCH symbols
        rs_lists = []       # per cell: (si, [ports]) of RS symbols

        for ci, (cell, pdus) in enumerate(work):
            ctx = self.ctx[_key(cell)]
            bpo0[ci] = ctx.bpo
            n_symb_dl = cell.n_symb_dl
            n = len(pdus)
            if stream_mode:
                starts[ci, :n] = np.fromiter(
                    (p.start for p in pdus), np.int64, n)
            else:
                blk = np.stack([p.data for p in pdus])      # (n, 128) cplx
                data[ci, :n, :, 0] = np.round(blk.real * 128.0 + 127.0)
                data[ci, :n, :, 1] = np.round(blk.imag * 128.0 + 127.0)
            fo_c = np.fromiter((p.frequency_offset for p in pdus),
                               np.float64, n)
            fo[ci, :n] = fo_c
            k = (state.fc_requested - fo_c) / state.fc_programmed
            foc_rate[ci, :n] = -2 * np.pi * fo_c / (state.fs_programmed * k)
            late[ci, :n] = np.fromiter((p.late for p in pdus), np.float64, n)
            syms_n = np.fromiter((p.sym_num for p in pdus), np.int64, n)
            slots = np.fromiter((p.slot_num for p in pdus), np.int64, n)
            if cell.cp_type == "extended":
                n_samp[ci, :n] = 128 + 32
            else:
                n_samp[ci, :n] = np.where(syms_n == 0, 128 + 10, 128 + 9)
            keep = np.nonzero(
                (((slots == 0) | (slots == 10)) & (syms_n >= n_symb_dl - 2))
                | ((slots == 1) & (syms_n <= 3)))[0].tolist()
            rs_l = []
            for si in np.nonzero(
                    (syms_n == 0) | (syms_n == n_symb_dl - 3)
                    | (syms_n == 1))[0]:
                ports = [p for p in range(cell.n_ports) if not np.isnan(
                    ctx.rs_dl.get_shift(slots[si], syms_n[si], p))]
                if ports:
                    rs_l.append((int(si), ports))
            keep_lists.append(keep)
            rs_lists.append(rs_l)

        Q = _bucket(max((len(k) for k in keep_lists), default=1), lo=2)
        R = _bucket(max((len(r) for r in rs_lists), default=1), lo=2)
        keep_idx = np.zeros((C, Q), np.int32)
        rs_idx = np.zeros((C, R), np.int32)
        shift = np.zeros((C, R, P), np.int32)
        rs_conj = np.zeros((C, R, P, 12, 2), np.float32)
        for ci, (cell, pdus) in enumerate(work):
            ctx = self.ctx[_key(cell)]
            for qi, si in enumerate(keep_lists[ci]):
                keep_idx[ci, qi] = si
            for ri, (si, ports) in enumerate(rs_lists[ci]):
                rs_idx[ci, ri] = si
                pdu = pdus[si]
                rs = ctx.rs_dl.get_rs(pdu.slot_num, pdu.sym_num)
                rc = bf.to_ri(np.conj(rs))
                for p in ports:
                    shift[ci, ri, p] = int(
                        ctx.rs_dl.get_shift(pdu.slot_num, pdu.sym_num, p))
                    rs_conj[ci, ri, p] = rc

        bpo, _carry = bf.bulk_phase_offsets(bpo0, fo, n_samp)
        for ci, (cell, pdus) in enumerate(work):
            self.ctx[_key(cell)].bpo = float(bpo[ci, len(pdus) - 1])

        if stream_mode:
            lo = min(int(starts[ci, :len(p)].min())
                     for ci, (_, p) in enumerate(work))
            hi = max(int(starts[ci, :len(p)].max())
                     for ci, (_, p) in enumerate(work)) + 128
            seg = self._stream_segment(lo, hi)
            # Pad the segment to a bucketed length: jit cache stability.
            L = _bucket(len(seg), lo=4096)
            seg = np.concatenate(
                [seg, np.zeros((L - len(seg), 2), np.uint8)])
            flat = _demod_stream_jit(
                jnp.asarray(seg),
                jnp.asarray((starts - lo).clip(0).astype(np.int32)),
                jnp.asarray(foc_rate),
                jnp.asarray(bpo.astype(np.float32)), jnp.asarray(late),
                jnp.asarray(rs_conj), jnp.asarray(shift),
                jnp.asarray(keep_idx), jnp.asarray(rs_idx))
        else:
            flat = _demod_jit(
                jnp.asarray(data), jnp.asarray(foc_rate),
                jnp.asarray(bpo.astype(np.float32)), jnp.asarray(late),
                jnp.asarray(rs_conj), jnp.asarray(shift),
                jnp.asarray(keep_idx), jnp.asarray(rs_idx))
        syms_kept, ce = _unpack(flat, [(C, Q, 72, 2), (C, R, P, 12, 2)])
        return syms_kept, ce, keep_lists, rs_lists

    # ------------------------------------------------------------------
    def _host_route(self, work, syms_kept, ce_rows, keep_lists,
                    rs_lists) -> None:
        """Route demodulated symbols and raw CEs into per-cell fifos."""
        for ci, (cell, pdus) in enumerate(work):
            ctx = self.ctx[_key(cell)]
            kept = {si: qi for qi, si in enumerate(keep_lists[ci])}
            seq0 = ctx.seq
            ctx.seq += len(pdus)
            for si, pdu in enumerate(pdus):
                qi = kept.get(si)
                syms = (bf.from_ri(syms_kept[ci, qi])
                        if qi is not None else None)
                ctx.pending_syms.append(
                    (seq0 + si, pdu.slot_num, pdu.sym_num, syms))
            for ri, (si, ports) in enumerate(rs_lists[ci]):
                pdu = pdus[si]
                for port in ports:
                    ctx.ce_raw_fifo[port].append(_RawCE(
                        seq0 + si, int(ctx.rs_dl.get_shift(
                            pdu.slot_num, pdu.sym_num, port)),
                        pdu.slot_num, pdu.sym_num,
                        bf.from_ri(ce_rows[ci, ri, port]),
                        pdu.frequency_offset, pdu.frame_timing))

    # ------------------------------------------------------------------
    def _dispatch_stats(self, work) -> None:
        """Dispatch 2: every complete RS triple, all cells at once; then
        apply the feedback blends sequentially in host order."""
        triples = []   # (ctx, port, prev, curr, next)
        for cell, _ in work:
            ctx = self.ctx[_key(cell)]
            for port in range(cell.n_ports):
                q = ctx.ce_raw_fifo[port]
                while len(q) >= 3:
                    triples.append((ctx, port, q[0], q[1], q[2]))
                    q.popleft()
        if not triples:
            return

        T = _bucket(len(triples))
        cp = np.zeros((T, 12, 2), np.float32)
        cc = np.zeros((T, 12, 2), np.float32)
        cn = np.zeros((T, 12, 2), np.float32)
        pl = np.zeros(T, bool)
        for i, (_, _, p, c, n) in enumerate(triples):
            cp[i] = bf.to_ri(p.ce)
            cc[i] = bf.to_ri(c.ce)
            cn[i] = bf.to_ri(n.ce)
            pl[i] = p.shift < c.shift
        flat = _stats_jit(jnp.asarray(cp), jnp.asarray(cc),
                          jnp.asarray(cn), jnp.asarray(pl))
        (ce_filt, np_c, tp_c, sp_c, sp_raw, foe_comb, foe_np, delay,
         delay_np, ac, ac_np) = _unpack(flat, [
             (T, 12, 2), (T,), (T,), (T,), (T,), (T, 2), (T,), (T,),
             (T,), (T, 12, 2), (T, 12)])

        state = self.state
        for i, (ctx, port, p, c, n) in enumerate(triples):
            cell = ctx.cell
            filt = _FiltCE(c.seq, c.shift, c.slot_num, c.sym_num,
                           float(tp_c[i]), float(sp_c[i]),
                           float(sp_raw[i]), float(np_c[i]),
                           bf.from_ri(ce_filt[i]))
            # FOE blend (reference: tracker_thread.cpp:235-242)
            fo = p.frequency_offset
            k = (state.fc_requested - fo) / state.fc_programmed
            dt = 0.0005 + (np.mod(n.frame_timing - p.frame_timing
                                  + _WRAP / 2, _WRAP) - _WRAP / 2) \
                / (state.fs_programmed * k)
            fc = foe_comb[i, 0] + 1j * foe_comb[i, 1]
            residual_f = float(np.angle(fc)) / (2 * np.pi) / dt
            state.update_frequency_offset(
                fo + residual_f, max(float(foe_np[i]) / 2, 0.001))
            # TOE blend
            cell.update_frame_timing(float(delay[i]), float(delay_np[i]),
                                     c.frame_timing)
            # AC measurements
            ac_i = bf.from_ri(ac[i])
            if cell.ac_fd is None:
                cell.ac_fd = ac_i
            else:
                w0 = 1 / 0.00001
                cell.ac_fd = (cell.ac_fd * w0 + ac_i / ac_np[i]) \
                    / (w0 + 1 / ac_np[i])
            hist = ctx.ce_history[port]
            hist.append(c.ce)
            if len(hist) == 72:
                last = hist[71]
                h = np.stack(hist)                    # (72, 12), h[71-t]
                xc = (h[::-1] @ np.conj(last)) / 12.0 / float(sp_c[i])
                if cell.ac_td is None:
                    cell.ac_td = xc
                else:
                    w0 = 1 / 0.00001
                    cell.ac_td = (cell.ac_td * w0 + xc) / (w0 + 1)
            self._consume_filt(ctx, port, filt)

    # ------------------------------------------------------------------
    def _consume_filt(self, ctx: _CellCtx, port: int, filt: _FiltCE) -> None:
        """Bracketing interpolation at the symbols that need CE, keyed by
        sequence number; advances the port's interpolation horizon."""
        prev = ctx.ce_filt_last[port]
        ctx.ce_filt_last[port] = filt
        ctx.horizon[port] = filt.seq
        if prev is None:
            return
        cell = ctx.cell
        n_symb_dl = cell.n_symb_dl

        if port > 2:
            time_diff = 0.0005
        elif cell.cp_type == "extended":
            time_diff = 3 * (128 + 32) / (FS_LTE / 16)
        elif prev.sym_num == 0:
            time_diff = 4 * (128 + 9) / (FS_LTE / 16)
        else:
            time_diff = (2 * (128 + 9) + (128 + 10)) / (FS_LTE / 16)

        prev_i = _interp72(prev)
        curr_i = _interp72(filt)

        def emit(seq, slot_num, sym_num, a):
            if not ((slot_num == 1 and sym_num <= 3)
                    or (slot_num in (0, 10) and sym_num in (5, 6))):
                return
            ce = prev_i + (curr_i - prev_i) * a
            vals = {k: getattr(prev, k)
                    + (getattr(filt, k) - getattr(prev, k)) * a
                    for k in ("tp", "sp", "sp_raw", "np_")}
            ctx.interp_points.setdefault(seq, {})[port] = (ce, vals)

        if not ctx.backfilled[port]:
            # Backfill from the first tracked symbol up to `prev` with the
            # a=0 value (reference: ce_interp backfill, cell_tracker.py).
            ctx.backfilled[port] = True
            slot_b, sym_b = prev.slot_num, prev.sym_num
            for seq_b in range(prev.seq - 1, -1, -1):
                sym_b -= 1
                if sym_b < 0:
                    sym_b = n_symb_dl - 1
                    slot_b = (slot_b - 1) % 20
                emit(seq_b, slot_b, sym_b, 0.0)

        slot_num, sym_num = prev.slot_num, prev.sym_num
        seq = prev.seq
        time_offset = 0.0
        while seq != filt.seq:
            emit(seq, slot_num, sym_num, time_offset / time_diff)
            if cell.cp_type == "extended":
                time_offset += (128 + 32) / (FS_LTE / 16)
            else:
                time_offset += ((128 + 10) if sym_num == 6 else (128 + 9)) \
                    / (FS_LTE / 16)
            sym_num = (sym_num + 1) % n_symb_dl
            if sym_num == 0:
                slot_num = (slot_num + 1) % 20
            seq += 1

    # ------------------------------------------------------------------
    def _finalize(self, cells: List[TrackedCell]) -> None:
        """Consume finalized symbols in order: CRS measurement updates,
        sync pairs (dispatch 3), PBCH collection and the batched MIB
        decode (dispatch 4)."""
        pairs = []     # (ctx, slot_num, sss_syms, pss_syms)
        for cell in cells:
            ctx = self.ctx.get(_key(cell))
            if ctx is None:
                continue
            n_ports = cell.n_ports
            horizon = min(ctx.horizon[:n_ports]) if n_ports else -1
            n_symb_dl = cell.n_symb_dl
            while ctx.pending_syms and ctx.pending_syms[0][0] < horizon:
                seq, slot_num, sym_num, syms = ctx.pending_syms.popleft()
                pt = ctx.interp_points.pop(seq, None)
                if slot_num in (0, 10):
                    if sym_num == n_symb_dl - 2:
                        ctx.sss_sym = syms
                    elif (sym_num == n_symb_dl - 1
                          and ctx.sss_sym is not None):
                        pairs.append((ctx, slot_num, ctx.sss_sym, syms))
                    if sym_num in (5, 6) and pt is not None \
                            and len(pt) == n_ports:
                        self._crs_update(cell, pt)
                if slot_num == 1 and sym_num <= 3:
                    if pt is None or len(pt) < n_ports:
                        continue
                    ce = np.stack([pt[p][0] for p in range(n_ports)])
                    np_ = np.array([pt[p][1]["np_"] for p in range(n_ports)])
                    ctx.mib_fifo.append((syms, ce, np_))

        if pairs:
            self._dispatch_sync(pairs)
        self._dispatch_mib(cells)

    # ------------------------------------------------------------------
    def _dispatch_sync(self, pairs) -> None:
        K = _bucket(len(pairs))
        ps = np.zeros((K, 72, 2), np.float32)
        ss = np.zeros((K, 72, 2), np.float32)
        pc = np.zeros((K, 62, 2), np.float32)
        sq = np.zeros((K, 62), np.float32)
        for i, (ctx, slot_num, sss_syms, pss_syms) in enumerate(pairs):
            ps[i] = bf.to_ri(pss_syms)
            ss[i] = bf.to_ri(sss_syms)
            pc[i] = bf.to_ri(ctx.pss_conj)
            sq[i] = ctx.sss0 if slot_num == 0 else ctx.sss10
        flat = _sync_jit(jnp.asarray(ps), jnp.asarray(ss), jnp.asarray(pc),
                         jnp.asarray(sq))
        tp, sp, np_e, np_b, ce_sm = _unpack(flat, [
            (K,), (K,), (K,), (K,), (K, 62, 2)])
        for i, (ctx, slot_num, *_unused) in enumerate(pairs):
            cell = ctx.cell
            cell.sync_tp, cell.sync_sp = float(tp[i]), float(sp[i])
            cell.sync_np = float(np_e[i])
            cell.sync_np_blank = float(np_b[i])
            cell.sync_ce = np.concatenate(
                [np.zeros(5), bf.from_ri(ce_sm[i]), np.zeros(5)])
            if np.isnan(cell.sync_sp_av):
                cell.sync_tp_av, cell.sync_sp_av = cell.sync_tp, cell.sync_sp
                cell.sync_np_av = cell.sync_np
                cell.sync_np_blank_av = cell.sync_np_blank
            else:
                cell.sync_tp_av = 0.999 * cell.sync_tp_av + 0.001 * cell.sync_tp
                cell.sync_sp_av = 0.999 * cell.sync_sp_av + 0.001 * cell.sync_sp
                cell.sync_np_av = 0.999 * cell.sync_np_av + 0.001 * cell.sync_np
                cell.sync_np_blank_av = (0.999 * cell.sync_np_blank_av
                                         + 0.001 * cell.sync_np_blank)

    # ------------------------------------------------------------------
    def _dispatch_mib(self, cells: List[TrackedCell]) -> None:
        # Drain every full 4-frame window (a long processing cycle can
        # deliver several).
        while self._mib_round(cells):
            pass

    def _mib_round(self, cells: List[TrackedCell]) -> bool:
        ready = []
        for cell in cells:
            ctx = self.ctx.get(_key(cell))
            if (ctx is not None and not cell.kill_me
                    and len(ctx.mib_fifo) >= 16):
                ready.append((ctx, cell))
        if not ready:
            return False
        llrs = [_mib_soft(ctx, cell) for ctx, cell in ready]
        B = _bucket(len(llrs))
        batch = np.zeros((B,) + llrs[0].shape, np.float32)
        for i, x in enumerate(llrs):
            batch[i] = x
        dec = np.asarray(lte_conv_decode_batch(jnp.asarray(batch)))
        for (ctx, cell), c_est in zip(ready, dec):
            ok = _mib_check(cell, c_est.astype(np.uint8))
            if ok:
                ctx.mib_fifo_synchronized = True
                cell.mib_decode_failures = 0.0
                cell.mib_decode_successes += 1
                for _ in range(16):
                    ctx.mib_fifo.popleft()
            elif ctx.mib_fifo_synchronized:
                cell.mib_decode_failures += 1
                for _ in range(16):
                    ctx.mib_fifo.popleft()
            else:
                cell.mib_decode_failures += 0.25
                for _ in range(4):
                    ctx.mib_fifo.popleft()
            if cell.mib_decode_failures >= cell.drop_threshold:
                cell.kill_me = True
        return True

    def _crs_update(self, cell: TrackedCell, pt) -> None:
        tp = np.array([pt[p][1]["tp"] for p in range(cell.n_ports)])
        sp_raw = np.array([pt[p][1]["sp_raw"] for p in range(cell.n_ports)])
        np_ = np.array([pt[p][1]["np_"] for p in range(cell.n_ports)])
        cell.ce = np.stack([pt[p][0] for p in range(cell.n_ports)])
        if cell.crs_tp_av is None:
            cell.crs_tp_av, cell.crs_sp_raw_av, cell.crs_np_av = tp, sp_raw, np_
        else:
            cell.crs_tp_av = 0.999 * cell.crs_tp_av + 0.001 * tp
            cell.crs_sp_raw_av = 0.999 * cell.crs_sp_raw_av + 0.001 * sp_raw
            cell.crs_np_av = 0.999 * cell.crs_np_av + 0.001 * np_


# ----------------------------------------------------------------------
# Jitted device programs (module-level so the cache is shared).


def _pack(*arrays):
    """Flatten+concatenate device outputs in float16: ONE host fetch per
    dispatch (each fetch costs a full round trip on PCIe/tunnel links)
    at half the bytes. The quantities here are noise-limited estimates —
    f16's ~1e-3 relative error sits far below the estimation noise; the
    phase-critical accumulations (bulk phase, FOE/TOE blends) happen in
    float64 on host either way."""
    return jnp.concatenate([a.astype(jnp.float16).reshape(-1)
                            for a in arrays])


def _unpack(flat, shapes):
    out, off = [], 0
    flat = np.asarray(flat, np.float64)
    for sh in shapes:
        n = int(np.prod(sh))
        out.append(flat[off:off + n].reshape(sh))
        off += n
    return out


def _demod_core(data, foc_rate, bpo, late, rs_conj, shift, keep_idx, rs_idx):
    syms = bf.get_fd_batch(data, foc_rate, bpo, late)     # (C, S, 72, 2)
    # Device-side gathers: only sync/PBCH symbols and RS-position CEs go
    # back to the host.
    kept = jnp.take_along_axis(syms, keep_idx[:, :, None, None], axis=1)
    syms_rs = jnp.take_along_axis(syms, rs_idx[:, :, None, None], axis=1)
    ce = bf.raw_ce_batch(syms_rs[:, :, None], rs_conj, shift)
    return _pack(kept, ce)


@jax.jit
def _demod_jit(data, foc_rate, bpo, late, rs_conj, shift, keep_idx, rs_idx):
    data = (data.astype(jnp.float32) - 127.0) * (1.0 / 128.0)
    return _demod_core(data, foc_rate, bpo, late, rs_conj, shift,
                       keep_idx, rs_idx)


@jax.jit
def _demod_stream_jit(seg, starts, foc_rate, bpo, late, rs_conj, shift,
                      keep_idx, rs_idx):
    """Stream-gather demod: every cell's windows are sliced out of the
    once-uploaded raw stream on device."""
    x = (seg.astype(jnp.float32) - 127.0) * (1.0 / 128.0)   # (L, 2)
    idx = starts[:, :, None] + jnp.arange(128, dtype=jnp.int32)
    data = x[idx]                                           # (C, S, 128, 2)
    return _demod_core(data, foc_rate, bpo, late, rs_conj, shift,
                       keep_idx, rs_idx)


@jax.jit
def _stats_jit(cp, cc, cn, pl):
    ce_filt, np_c, tp_c, sp_c, sp_raw = bf.filter_ce_batch(cp, cc, cn, pl)
    foe_comb, foe_np = bf.foe_stats_batch(cp, cn, ce_filt, np_c)
    delay, delay_np = bf.toe_stats_batch(cp, cc, sp_c, np_c, pl)
    ac, ac_np = bf.ac_fd_batch(cc, sp_c, np_c)
    return _pack(ce_filt, np_c, tp_c, sp_c, sp_raw, foe_comb, foe_np,
                 delay, delay_np, ac, ac_np)


@jax.jit
def _sync_jit(pss_sym, sss_sym, pss_conj, sss_seq):
    out = bf.sync_meas_batch(pss_sym, sss_sym, pss_conj, sss_seq)
    return _pack(out["tp"], out["sp"], out["np"], out["np_blank"],
                 out["ce_smooth"])


# ----------------------------------------------------------------------
# Host helpers (identical math to cell_tracker.py).


@functools.lru_cache(maxsize=8)
def _interp72_mat(shift: int) -> np.ndarray:
    """(72, 12) matrix form of the comb->full-band linear interpolation
    (with linear extrapolation at the edges, matching interp72)."""
    x = np.arange(shift, 72, 6, dtype=float)
    xi = np.arange(72, dtype=float)
    idx = np.clip(np.searchsorted(x, xi, side="right") - 1, 0, 10)
    frac = (xi - x[idx]) / 6.0
    m = np.zeros((72, 12))
    m[np.arange(72), idx] = 1.0 - frac
    m[np.arange(72), idx + 1] += frac
    return m


def _interp72(rs: _FiltCE) -> np.ndarray:
    return _interp72_mat(rs.shift) @ rs.ce_filt


def _mib_soft(ctx: _CellCtx, cell: TrackedCell) -> np.ndarray:
    """SFBC compensation + soft demod + descramble + deratematch for one
    cell's 16-PDU window (same math as CellTracker._try_decode_mib up to
    the Viterbi, which runs batched on device)."""
    n_syms = 960 if cell.cp_type == "normal" else 864
    v_shift_m3 = cell.n_id_cell % 3
    sc = np.arange(72)
    pbch_sym = np.empty(n_syms, dtype=complex)
    pbch_ce = np.empty((cell.n_ports, n_syms), dtype=complex)
    np_pre = np.empty((cell.n_ports, n_syms))
    idx = 0
    for fr in range(4):
        for symn in range(4):
            rs_here = symn in (0, 1) or (symn == 3
                                         and cell.cp_type == "extended")
            mask = ~((sc % 3 == v_shift_m3) & rs_here)
            syms, ce, np_ = ctx.mib_fifo[fr * 4 + symn]
            cnt = int(mask.sum())
            pbch_sym[idx:idx + cnt] = syms[mask]
            pbch_ce[:, idx:idx + cnt] = ce[:cell.n_ports][:, mask]
            np_pre[:, idx:idx + cnt] = np_[:cell.n_ports, None]
            idx += cnt

    if cell.n_ports == 1:
        h = pbch_ce[0]
        gain = np.conj(h) / (np.abs(h) ** 2)
        syms_mib = pbch_sym * gain
        np_mib = np_pre[0] * np.abs(gain) ** 2
    else:
        x1, x2 = pbch_sym[0::2], pbch_sym[1::2]
        if cell.n_ports == 2:
            h1 = 0.5 * (pbch_ce[0, 0::2] + pbch_ce[0, 1::2])
            h2 = 0.5 * (pbch_ce[1, 0::2] + pbch_ce[1, 1::2])
            np_t = 0.5 * (np_pre[0, 0::2] + np_pre[1, 0::2])
        else:
            pairs = n_syms // 2
            use_a = (np.arange(pairs) % 2) == 0
            h1 = np.where(use_a,
                          0.5 * (pbch_ce[0, 0::2] + pbch_ce[0, 1::2]),
                          0.5 * (pbch_ce[1, 0::2] + pbch_ce[1, 1::2]))
            h2 = np.where(use_a,
                          0.5 * (pbch_ce[2, 0::2] + pbch_ce[2, 1::2]),
                          0.5 * (pbch_ce[3, 0::2] + pbch_ce[3, 1::2]))
            np_t = np.where(use_a,
                            0.5 * (np_pre[0, 0::2] + np_pre[2, 0::2]),
                            0.5 * (np_pre[1, 0::2] + np_pre[3, 0::2]))
        scale = np.abs(h1) ** 2 + np.abs(h2) ** 2
        s1 = (np.conj(h1) * x1 + h2 * np.conj(x2)) / scale
        s2 = np.conj((-np.conj(h2) * x1 + h1 * np.conj(x2)) / scale)
        syms_mib = np.empty(n_syms, dtype=complex)
        syms_mib[0::2], syms_mib[1::2] = s1, s2
        syms_mib *= np.sqrt(2.0)
        np_pair = ((np.abs(h1) / scale) ** 2
                   + (np.abs(h2) / scale) ** 2) * np_t
        np_mib = np.repeat(np_pair, 2)

    e_est = lte_demodulate(syms_mib, np_mib, "qpsk")
    e_est = np.where(ctx.scr == 1, -e_est, e_est)
    return lte_conv_deratematch(e_est, 40)


def _mib_check(cell: TrackedCell, c_est: np.ndarray) -> bool:
    crc_est = lte_calc_crc(c_est[:24], "crc16")
    if cell.n_ports == 2:
        crc_est = 1 - crc_est
    elif cell.n_ports == 4:
        crc_est = crc_est.copy()
        crc_est[1::2] = 1 - crc_est[1::2]
    if not np.array_equal(crc_est, c_est[24:]):
        return False
    bw = int(c_est[0]) * 4 + int(c_est[1]) * 2 + int(c_est[2])
    if N_RB_DL_TABLE.get(bw, -1) != cell.n_rb_dl:
        return False
    dur = "extended" if c_est[3] else "normal"
    if dur != cell.phich_duration:
        return False
    return PHICH_RES_TABLE[int(c_est[4]) * 2 + int(c_est[5])] \
        == cell.phich_resource
