"""Pallas TPU kernel: fused PSS correlation bank + incoherent k_factor fold.

The XLA path (ops/xcorr_jax.py) materializes the im2col window matrix
(274 x n_lags ~ 168 MB), the complex correlation (2*n_ch x n_lags ~ 228 MB)
and its magnitude in HBM — ~1 GB of HBM traffic per capture that dominates
its runtime. This kernel keeps everything in VMEM: the whole 80 ms capture
is only 1.2 MB, so each grid step slices its correlation window directly
from the VMEM-resident capture, runs the (2*n_ch, 2*WIN_ROWS) template bank
against it on the MXU, squares, and accumulates the per-hypothesis
k_factor-shifted half-frame fold in place. HBM traffic drops to
read-capture + write-fold (~5 MB); the intermediate correlation never
exists outside VMEM.

Grid: (n_tile, n_fold) with the fold axis innermost, so each output tile
stays resident while its n_comb_xc fold contributions accumulate.
Per-hypothesis fold alignment (actual_start_index = round(m*9600*k_factor),
src/searcher.cpp:298) differs from the nominal m*9600 by at most a few
samples (|d| <= ~16 at ppm=100), so each step computes the correlation on a
halo-extended tile and every hypothesis takes its own shifted slice.

Numerics match ops.xcorr_jax to float32 rounding: same template bank, same
fold order, f32 MXU accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lte_cell_scanner_tpu.constants import HALF_FRAME, PSS_TD_LEN

DEFAULT_TILE = 3200  # divides HALF_FRAME; W=tile+2*halo keeps VMEM < 16 MB
                     # (measured ~15% faster than 1920 on v5e: fewer grid
                     # steps amortize the per-step roll/accumulate work;
                     # 4800 overflows VMEM)

# Sublane-aligned window-matrix height: the 137 template taps live in a
# (144, w) block built by ONE strided roll per plane (see _kernel).
WIN_ROWS = 144
# Lane width of the roll input must be 128-aligned for Mosaic's strided
# dynamic_rotate; 256 >= WIN_ROWS-1 extra lanes keep every row's slice
# in-bounds.
WIN_PAD = 256


def _kernel(bases_ref, offs_ref, cap_ref, tpl_ref, acc_ref,
            mag_ref, upd_ref, *, n_f, tile, halo, n_tile):
    """One (tile, fold) step. See module docstring.

    bases_ref: (n_prog,) i32 SMEM — capture offset of each step's window.
    offs_ref:  (n_f, n_prog) i32 SMEM — per-hypothesis slice offset into
               the halo'd magnitude tile (= fold misalignment d + halo).
    cap_ref:   (2, n_cap) f32 VMEM — re/im planes of the capture.
    tpl_ref:   (2*n_ch, 2*WIN_ROWS) f32 VMEM — real-block template bank
               [[re, -im], [im, re]] of the 3*n_f shifted PSS templates,
               columns permuted to the roll-built window row order
               (shift j lives in row WIN_ROWS-1-j; rows for j > 136 are
               zero padding).
    acc_ref:   (n_ch, HALF_FRAME) f32 VMEM — fold accumulator (revisited
               across the fold axis; divided by n_comb_xc by the caller).
    mag_ref:   (n_ch, w) f32 VMEM scratch — |xc|^2 of the halo'd tile.
    upd_ref:   (n_ch, tile) f32 VMEM scratch — hypothesis-aligned update.

    tpl_ref may be bfloat16: uint8 radio samples (x-127)/128 are EXACT
    in bf16 (<= 8 significant bits), so casting the window matrix to
    bf16 at the MXU is lossless for the capture and only the template
    rounds (~2^-8 relative, ~40 dB below the radio's own 8-bit
    quantization noise); the |xc|^2 fold still accumulates in f32. The
    capture itself stays f32 because Mosaic's strided rotate is
    32-bit-only.
    """
    t = pl.program_id(0)
    m = pl.program_id(1)
    prog = t * pl.num_programs(1) + m
    n_ch = 3 * n_f
    w = tile + 2 * halo

    base = pl.multiple_of(bases_ref[prog], 128)
    local = cap_ref[:, pl.ds(base, w + WIN_PAD)]             # (2, w+256)

    # im2col without the 274-row copy loop: broadcast each plane across
    # WIN_ROWS sublanes and apply ONE strided cyclic roll — row r ends up
    # left-shifted by (WIN_ROWS-1-r), i.e. row r = x[WIN_ROWS-1-r : +w].
    # (pltpu.roll requires non-negative shift/stride, hence the reversed
    # row order, which the host bakes into the template permutation; the
    # roll's lane width must stay 128-aligned, hence WIN_PAD.)
    def win(p):
        b = jnp.broadcast_to(local[p][None, :], (WIN_ROWS, w + WIN_PAD))
        return pltpu.roll(b, w + WIN_PAD - (WIN_ROWS - 1), axis=1,
                          stride=1, stride_axis=0)[:, :w]

    # Mosaic's strided rotate is 32-bit only, so the capture stays f32
    # and the window matrix is cast to the bank dtype (bf16 mode) only
    # at the MXU's doorstep.
    wmat = jnp.concatenate([win(0), win(1)], axis=0).astype(tpl_ref.dtype)
    xc = jnp.dot(tpl_ref[:], wmat, preferred_element_type=jnp.float32)
    mag_ref[:, :] = xc[:n_ch] ** 2 + xc[n_ch:] ** 2           # (n_ch, w)

    # Per-hypothesis k_factor shift, restacked in channel order. Dynamic
    # lane-dim slices must be 128-aligned on TPU, so realize the
    # sample-granular shift as a dynamic rotate + static slice (the rolled
    # tail can't wrap into [0, tile) because off <= w - tile).
    for f in range(n_f):
        upd_ref[3 * f:3 * f + 3, :] = pltpu.roll(
            mag_ref[3 * f:3 * f + 3, :], w - offs_ref[f, prog],
            axis=1)[:, :tile]

    tcol = pl.multiple_of(t * tile, 128)

    @pl.when(m == 0)
    def _init():
        acc_ref[:, pl.ds(tcol, tile)] = upd_ref[:, :]

    @pl.when(m > 0)
    def _accum():
        acc_ref[:, pl.ds(tcol, tile)] += upd_ref[:, :]


def _kernel_tea(bases_ref, cap_ref, tpl_ref, acc_ref, *, n_ch, tile,
                s_col, win_rows):
    """Template-embedded-alignment variant of _kernel.

    HALF_FRAME and the tile are multiples of 128, so with a 128-sample
    front pad every window base (m*HALF_FRAME + t*tile) is naturally
    128-aligned, and the per-hypothesis fold misalignment d (|d| <= ~16
    at ppm=100) is baked into the TEMPLATE bank instead: fold m's bank
    places hypothesis f's taps at K-rows win_rows-1-s0-d(f,m)-j, so the
    matmul's output columns are already fold-aligned for every
    hypothesis at once. This removes the 31 per-hypothesis rolls and
    the upd scratch of _kernel at the cost of a slightly taller K dim
    (2*win_rows ~ 352 vs 288) and a per-fold bank block streamed from
    HBM (~130 KB, prefetched across grid steps).

    tpl_ref: (1, 2*n_ch, 2*win_rows) — fold m's bank block.
    s_col:   static column of the first in-tile lag (= 128 - s0).
    """
    t = pl.program_id(0)
    m = pl.program_id(1)
    prog = t * pl.num_programs(1) + m
    w = tile + 128

    base = pl.multiple_of(bases_ref[prog], 128)
    local = cap_ref[:, pl.ds(base, w + WIN_PAD)]

    def win(p):
        b = jnp.broadcast_to(local[p][None, :], (win_rows, w + WIN_PAD))
        return pltpu.roll(b, w + WIN_PAD - (win_rows - 1), axis=1,
                          stride=1, stride_axis=0)[:, :w]

    wmat = jnp.concatenate([win(0), win(1)], axis=0).astype(tpl_ref.dtype)
    xc = jnp.dot(tpl_ref[0], wmat, preferred_element_type=jnp.float32)
    mag = xc[:n_ch] ** 2 + xc[n_ch:] ** 2                 # (n_ch, w)
    if s_col % 128 == 0:
        upd = mag[:, s_col:s_col + tile]
    else:
        upd = pltpu.roll(mag, w - s_col, axis=1)[:, :tile]

    tcol = pl.multiple_of(t * tile, 128)

    @pl.when(m == 0)
    def _init():
        acc_ref[:, pl.ds(tcol, tile)] = upd

    @pl.when(m > 0)
    def _accum():
        acc_ref[:, pl.ds(tcol, tile)] += upd


def _kernel_tea3(bases_ref, cap_ref, tpl_ref, acc_ref, *, n_ch, tile,
                 s_col, win_rows):
    """Karatsuba (3-real-matmul) variant of _kernel_tea.

    The complex correlation re+j*im = (Re+j*Im) (Xr+j*Xi) is computed
    from three real products instead of the 2x2 real-block form's four:
        m1 = Re @ Xr,  m2 = Im @ Xi,  m3 = (Re+Im) @ (Xr+Xi),
        re = m1 - m2,  im = m3 - m1 - m2.
    Nominal flops drop 25% (3*W vs 4*W contraction rows); whether that
    survives the MXU's 128-deep K-dim padding (W ~ 176 pads to 256 in
    three small dots vs 2W ~ 352 padding to 384 in one) is measured by
    tools/bench_scan.py --layout tea3 — this kernel exists to make the
    trade measurable, and the default layout is whichever wins.

    tpl_ref: (1, 3*n_ch, win_rows) — fold m's bank [Re; Im; Re+Im].
    """
    t = pl.program_id(0)
    m = pl.program_id(1)
    prog = t * pl.num_programs(1) + m
    w = tile + 128

    base = pl.multiple_of(bases_ref[prog], 128)
    local = cap_ref[:, pl.ds(base, w + WIN_PAD)]

    def win(p):
        b = jnp.broadcast_to(local[p][None, :], (win_rows, w + WIN_PAD))
        return pltpu.roll(b, w + WIN_PAD - (win_rows - 1), axis=1,
                          stride=1, stride_axis=0)[:, :w]

    xr = win(0)
    xi = win(1)
    xs = (xr + xi).astype(tpl_ref.dtype)
    xr = xr.astype(tpl_ref.dtype)
    xi = xi.astype(tpl_ref.dtype)
    m1 = jnp.dot(tpl_ref[0, :n_ch], xr,
                 preferred_element_type=jnp.float32)
    m2 = jnp.dot(tpl_ref[0, n_ch:2 * n_ch], xi,
                 preferred_element_type=jnp.float32)
    m3 = jnp.dot(tpl_ref[0, 2 * n_ch:], xs,
                 preferred_element_type=jnp.float32)
    re = m1 - m2
    im = m3 - m1 - m2
    mag = re ** 2 + im ** 2                               # (n_ch, w)
    if s_col % 128 == 0:
        upd = mag[:, s_col:s_col + tile]
    else:
        upd = pltpu.roll(mag, w - s_col, axis=1)[:, :tile]

    tcol = pl.multiple_of(t * tile, 128)

    @pl.when(m == 0)
    def _init():
        acc_ref[:, pl.ds(tcol, tile)] = upd

    @pl.when(m > 0)
    def _accum():
        acc_ref[:, pl.ds(tcol, tile)] += upd


def _tea_fits(starts: np.ndarray) -> bool:
    """True if the fold misalignment range fits a TEA template bank.

    d grows with ppm and with capture length (d ~ m*9600*|1-k|), and the
    embedded bank needs win_rows ~ 137 + 2*max|d| <= WIN_PAD + 1; beyond
    that (ppm > ~450 at 80 ms, or captures several times longer) the
    caller falls back to the roll layout, whose halo grows freely."""
    n_fold = starts.shape[-1]
    d = starts - np.arange(n_fold)[None, :] * HALF_FRAME
    s0 = int(max(0, -d.min()))
    win_rows = 137 + s0 + int(max(0, d.max()))
    return -(-win_rows // 16) * 16 <= WIN_PAD + 1 and 128 - s0 >= 0


def plan_tiles_tea(n_cap: int, starts: np.ndarray, tile: int = DEFAULT_TILE):
    """Host-side schedule for the TEA kernel.

    Returns (bases, d, s0, s_col, win_rows, n_tile, pad) with
    pad = (front, total): the capture must be front-padded by 128 so
    every base is >= 0 and 128-aligned without clipping.
    """
    n_f, n_fold = starts.shape
    nominal = np.arange(n_fold) * HALF_FRAME
    d = (starts - nominal[None, :]).astype(np.int64)      # (n_f, n_fold)
    s0 = int(max(0, -d.min()))
    win_rows = 137 + s0 + int(max(0, d.max()))
    win_rows = -(-win_rows // 16) * 16                    # bf16 sublanes
    assert win_rows <= WIN_PAD + 1, "fold misalignment too large for TEA"
    s_col = 128 - s0
    assert s_col >= 0
    assert HALF_FRAME % tile == 0 and tile % 128 == 0
    n_tile = HALF_FRAME // tile
    front = 128
    w = tile + 128
    bases = (np.arange(n_tile)[:, None] * tile
             + np.arange(n_fold)[None, :] * HALF_FRAME)   # padded coords
    pad_len = int(bases.max()) + w + WIN_PAD
    bases = bases.reshape(-1).astype(np.int32)            # prog = t*n_fold+m
    return bases, d, s0, s_col, win_rows, n_tile, (front,
                                                   max(pad_len,
                                                       front + n_cap))


def _tea_embed(tpl: np.ndarray, d: np.ndarray, s0: int, win_rows: int):
    """Embed the fold-aligned taps: (n_fold, n_ch, win_rows) re/im.

    Hypothesis f's taps sit at K-rows win_rows-1-s0-d(f,m)-j so the TEA
    matmul's columns come out fold-aligned (see _kernel_tea)."""
    n_ch = tpl.shape[0]
    ch_d = np.repeat(d, 3, axis=0)                        # (n_ch, n_fold)
    j = np.arange(PSS_TD_LEN)
    rows = win_rows - 1 - s0 - ch_d.T[:, :, None] - j     # (n_fold,n_ch,137)
    assert rows.min() >= 0 and rows.max() < win_rows
    n_fold = d.shape[1]
    m_i = np.arange(n_fold)[:, None, None]
    c_i = np.arange(n_ch)[None, :, None]
    re = np.zeros((n_fold, n_ch, win_rows), np.float64)
    im = np.zeros_like(re)
    re[m_i, c_i, rows] = tpl.real[None]
    im[m_i, c_i, rows] = tpl.imag[None]
    return re, im


def _bank_cast(bank: np.ndarray, precision: str) -> np.ndarray:
    if precision == "bf16":
        import ml_dtypes

        return bank.astype(ml_dtypes.bfloat16)
    return bank


def _tea_bank(tpl: np.ndarray, d: np.ndarray, s0: int, win_rows: int,
              precision: str) -> np.ndarray:
    """Per-fold 2x2 real-block banks: (n_fold, 2*n_ch, 2*win_rows)."""
    re, im = _tea_embed(tpl, d, s0, win_rows)
    n_fold, n_ch, _ = re.shape
    bank = np.zeros((n_fold, 2 * n_ch, 2 * win_rows), np.float32)
    bank[:, :n_ch, :win_rows] = re
    bank[:, :n_ch, win_rows:] = -im
    bank[:, n_ch:, :win_rows] = im
    bank[:, n_ch:, win_rows:] = re
    return _bank_cast(bank, precision)


def _tea_bank3(tpl: np.ndarray, d: np.ndarray, s0: int, win_rows: int,
               precision: str) -> np.ndarray:
    """Per-fold Karatsuba banks: (n_fold, 3*n_ch, win_rows) =
    [Re; Im; Re+Im] (see _kernel_tea3)."""
    re, im = _tea_embed(tpl, d, s0, win_rows)
    bank = np.concatenate([re, im, re + im], axis=1).astype(np.float32)
    return _bank_cast(bank, precision)


def plan_tiles(n_cap: int, starts: np.ndarray, tile: int = DEFAULT_TILE,
               halo: int = 16):
    """Host-side schedule: window base per grid step + per-hypothesis
    slice offsets. Grows the halo if the fold misalignment demands it."""
    n_f, n_fold = starts.shape
    nominal = np.arange(n_fold) * HALF_FRAME
    d = starts - nominal[None, :]
    halo = max(halo, int(np.abs(d).max()))
    # Mosaic requires dynamic lane-slice starts to be 128-aligned: align
    # each window base down to 128 and widen the halo so the residual
    # (absorbed into the per-hypothesis offsets) stays in range; round the
    # halo so the working width w stays lane-aligned too.
    # The offset of a hypothesis inside its window is (nominal halo) +
    # (fold misalignment d, <= halo by construction) + (the down-alignment
    # residual, <= 127), and must fit in 2*halo: so the halo must absorb
    # d_max + 127, rounded so the working width stays lane-aligned.
    halo = -(-(halo + 128) // 64) * 64
    assert HALF_FRAME % tile == 0
    n_tile = HALF_FRAME // tile

    m_idx = np.arange(n_fold)[:, None]
    t_idx = np.arange(n_tile)[None, :]
    w = tile + 2 * halo
    bases = m_idx * HALF_FRAME + t_idx * tile - halo          # (n_fold, n_tile)
    # No upper clip: instead the capture is zero-padded to pad_len so the
    # final windows' halos read zeros (the fold only consumes offsets that
    # point at real samples, so the padding never reaches a result).
    bases = np.maximum(bases, 0)
    bases = (bases // 128) * 128
    pad_len = int(bases.max()) + w + WIN_PAD
    # offs[f, m, t]: hypothesis f's tile start inside the window.
    offs = (starts[:, :, None] + t_idx[None] * tile - bases[None])
    assert (offs >= 0).all() and (offs + tile <= w).all(), \
        "fold misalignment exceeds the planned halo"
    # Flatten to grid order prog = t * n_fold + m.
    bases = np.ascontiguousarray(bases.T).reshape(-1).astype(np.int32)
    offs = np.ascontiguousarray(np.transpose(offs, (0, 2, 1))).reshape(
        n_f, -1).astype(np.int32)
    return bases, offs, halo, n_tile, max(pad_len, n_cap)


@functools.partial(jax.jit, static_argnames=("n_comb_xc", "tile", "halo",
                                             "n_tile", "interpret"))
def xcorr_fold_pallas(cap2, tpl_bank, bases, offs, n_comb_xc,
                      tile=DEFAULT_TILE, halo=16, n_tile=5,
                      interpret=False):
    """Fused correlation + incoherent fold.

    cap2: (2, n_cap) f32. tpl_bank: (2*n_ch, 2*WIN_ROWS) f32. bases/offs
    plan_tiles. Returns single: (3, HALF_FRAME, n_f) f32 — the same
    xc_incoherent_single as ops.xcorr_jax._fold.
    """
    if tpl_bank.ndim == 3:                                # TEA layouts
        # Karatsuba banks are (n_fold, 3*n_ch, win_rows), 2x2-block
        # banks (n_fold, 2*n_ch, 2*win_rows); win_rows <= WIN_PAD + 1
        # (_tea_fits) and >= 144, so the K dim separates them.
        tea3 = tpl_bank.shape[2] <= WIN_PAD + 1
        if tea3:
            n_ch = tpl_bank.shape[1] // 3
            win_rows = tpl_bank.shape[2]
            kern = functools.partial(_kernel_tea3, n_ch=n_ch, tile=tile,
                                     s_col=halo, win_rows=win_rows)
            kdim = win_rows
        else:
            n_ch = tpl_bank.shape[1] // 2
            win_rows = tpl_bank.shape[2] // 2
            kern = functools.partial(_kernel_tea, n_ch=n_ch, tile=tile,
                                     s_col=halo, win_rows=win_rows)
            kdim = 2 * win_rows
        n_f = n_ch // 3
        acc = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_tile, n_comb_xc),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, tpl_bank.shape[1], tpl_bank.shape[2]),
                                 lambda t, m, *_: (m, 0, 0)),
                ],
                out_specs=pl.BlockSpec(
                    (n_ch, HALF_FRAME), lambda t, m, *_: (0, 0),
                    memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((n_ch, HALF_FRAME),
                                           jnp.float32),
            interpret=interpret,
            cost_estimate=pl.CostEstimate(
                flops=2 * tpl_bank.shape[1] * kdim * (tile + 128)
                * n_tile * n_comb_xc,
                bytes_accessed=4 * (2 * cap2.shape[1] + n_ch * HALF_FRAME)
                + tpl_bank.dtype.itemsize * tpl_bank.size * n_tile,
                transcendentals=0,
            ),
        )(bases, cap2, tpl_bank)
        single = (acc / n_comb_xc).reshape(n_f, 3, HALF_FRAME)
        return jnp.transpose(single, (1, 2, 0))

    n_ch = tpl_bank.shape[0] // 2
    n_f = n_ch // 3
    kern = functools.partial(_kernel, n_f=n_f, tile=tile, halo=halo,
                             n_tile=n_tile)
    acc = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_tile, n_comb_xc),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (n_ch, HALF_FRAME), lambda t, m, *_: (0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((n_ch, tile + 2 * halo), jnp.float32),
                pltpu.VMEM((n_ch, tile), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((n_ch, HALF_FRAME), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * n_ch * 2 * WIN_ROWS * (tile + 2 * halo)
            * n_tile * n_comb_xc,
            bytes_accessed=4 * (2 * cap2.shape[1] + n_ch * HALF_FRAME),
            transcendentals=0,
        ),
    )(bases, offs, cap2, tpl_bank)
    single = (acc / n_comb_xc).reshape(n_f, 3, HALF_FRAME)
    return jnp.transpose(single, (1, 2, 0))


@functools.partial(jax.jit, static_argnames=("n_comb_xc", "n_comb_sp",
                                             "ds_comb_arm", "tile", "halo",
                                             "n_tile", "interpret"))
def xcorr_core_pallas(cap2, bank, bases, offs, n_comb_xc, n_comb_sp,
                      ds_comb_arm, tile=DEFAULT_TILE, halo=16, n_tile=5,
                      interpret=False):
    """Full device scan with the fused Pallas correlate+fold at its core.

    Mirrors ops.xcorr_jax._xcorr_core's (packed, single, inc) contract.
    cap2 is (2, n_cap) float32 — or uint8 raw IQ bytes, converted to
    (x-127)/128 on device (4x less host->device traffic; the radio's
    native sample format, src/capbuf.cpp:172-181).
    """
    from lte_cell_scanner_tpu.ops.xcorr_jax import (_delay_spread,
                                                    _sp_est_from_pw)

    if cap2.dtype == jnp.uint8:
        cap2 = (cap2.astype(jnp.float32) - 127.0) * (1.0 / 128.0)
    single = xcorr_fold_pallas(cap2, bank, bases, offs, n_comb_xc,
                               tile=tile, halo=halo, n_tile=n_tile,
                               interpret=interpret)
    inc = _delay_spread(single, ds_comb_arm)
    front = 128 if bank.ndim == 3 else 0   # TEA layout front pad
    pw = cap2[0, front:] ** 2 + cap2[1, front:] ** 2
    sp_inc = _sp_est_from_pw(pw, n_comb_sp)
    pow_ = inc.max(axis=2)
    frq = inc.argmax(axis=2).astype(pow_.dtype)
    packed = jnp.concatenate([pow_, frq, sp_inc[None, :]], axis=0)
    return packed, single, inc


def pad_capture(cap2: np.ndarray, pad_len) -> np.ndarray:
    """Zero-pad the capture's sample axis (last) to plan_tiles'
    pad_len so the final correlation windows stay in bounds (uint8
    captures pad with the zero-level byte 127).

    pad_len may be an int (end padding only) or a (front, total) tuple
    from plan_tiles_tea (the TEA layout front-pads by 128 so every
    window base is 128-aligned)."""
    front = 0
    if isinstance(pad_len, tuple):
        front, pad_len = pad_len
    n = cap2.shape[-1]
    back = max(0, pad_len - front - n)
    if front == 0 and back == 0:
        return cap2
    widths = [(0, 0)] * (cap2.ndim - 1) + [(front, back)]
    fill = 127 if cap2.dtype == np.uint8 else 0
    return np.pad(cap2, widths, constant_values=fill)


def scan_plan(capbuf_len, f_search_set, fc_requested, fc_programmed,
              fs_programmed, tile=DEFAULT_TILE, precision="f32",
              layout="tea"):
    """Precompute the host-side arrays the Pallas scan needs (template
    bank + tile schedule); shared by xcorr_pss_jax and bench.

    precision="bf16" emits the template bank in bfloat16 (the kernel
    then runs the correlation matmul at the MXU's 2x bf16 rate; see
    _kernel docstring for the error analysis).

    layout="tea" (the default: measured 1.7x faster than "roll" on
    v5e — 0.157 ms vs 0.273 ms correlate+fold per capture at n_f=31)
    plans for _kernel_tea (per-fold banks with the alignment baked
    in): the returned tuple keeps the same shape with offs=None, the
    `halo` slot carrying s_col, and pad_len a (front, total) pair that
    pad_capture understands."""
    from lte_cell_scanner_tpu.ops.xcorr import (fold_start_indices,
                                                shifted_templates)

    from lte_cell_scanner_tpu.ops.xcorr import n_comb_xc_for

    n_lags = capbuf_len - (PSS_TD_LEN - 1)
    f_search_set = np.asarray(f_search_set, dtype=np.float64)
    n_comb_xc = n_comb_xc_for(n_lags, f_search_set, fc_requested,
                              fc_programmed, fs_programmed)
    tpl = shifted_templates(f_search_set, fc_requested, fc_programmed,
                            fs_programmed).reshape(-1, PSS_TD_LEN)
    starts_ = fold_start_indices(f_search_set, n_comb_xc, fc_requested,
                                 fc_programmed, fs_programmed)
    if (layout in ("tea", "tea3") and _tea_fits(starts_)
            and HALF_FRAME % tile == 0 and tile % 128 == 0):
        bases, d, s0, s_col, win_rows, n_tile, pad = plan_tiles_tea(
            capbuf_len, starts_, tile=tile)
        mk = _tea_bank3 if layout == "tea3" else _tea_bank
        bank = mk(tpl, d, s0, win_rows, precision)
        return bank, bases, None, s_col, n_tile, n_comb_xc, pad
    # Bank columns permuted to the kernel's roll-built window order:
    # template shift j sits in window row WIN_ROWS-1-j (rows j > 136 are
    # zero padding that multiplies the roll's junk rows away).
    re = np.zeros((tpl.shape[0], WIN_ROWS), tpl.real.dtype)
    im = np.zeros_like(re)
    re[:, WIN_ROWS - 1 - np.arange(PSS_TD_LEN)] = tpl.real
    im[:, WIN_ROWS - 1 - np.arange(PSS_TD_LEN)] = tpl.imag
    bank = np.block([[re, -im], [im, re]]).astype(np.float32)
    if precision == "bf16":
        import ml_dtypes

        bank = bank.astype(ml_dtypes.bfloat16)
    bases, offs, halo, n_tile, pad_len = plan_tiles(capbuf_len, starts_,
                                                    tile=tile)
    return bank, bases, offs, halo, n_tile, n_comb_xc, pad_len


def xcorr_single_pallas(capbuf, f_search_set, fc_requested, fc_programmed,
                        fs_programmed, tile=DEFAULT_TILE, interpret=False,
                        precision="f32", layout="tea"):
    """Host-facing helper mirroring correlate+fold of the XLA path.

    Returns (single, n_comb_xc) with single as float32 numpy-compatible
    (3, HALF_FRAME, n_f).
    """
    capbuf = np.asarray(capbuf)
    bank, bases, offs, halo, n_tile, n_comb_xc, pad_len = scan_plan(
        capbuf.shape[0], f_search_set, fc_requested, fc_programmed,
        fs_programmed, tile=tile, precision=precision, layout=layout)
    cap2 = pad_capture(
        np.stack([capbuf.real, capbuf.imag]).astype(np.float32), pad_len)
    single = xcorr_fold_pallas(jnp.asarray(cap2), jnp.asarray(bank),
                               jnp.asarray(bases),
                               None if offs is None else jnp.asarray(offs),
                               n_comb_xc, tile=tile, halo=halo,
                               n_tile=n_tile, interpret=interpret)
    return single, n_comb_xc
