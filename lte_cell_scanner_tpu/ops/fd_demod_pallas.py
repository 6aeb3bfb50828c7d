"""Fused symbol-demod Pallas kernel: aligned-row blend + FOC rotation +
128->72 DFT + fractional-timing/bulk-phase compensation in one VMEM pass.

The tracker engine demodulates ~3e5 OFDM symbol windows per engine cycle
(64+ cells x 4200 symbols). The XLA formulation (tracker/batch_frontend.
get_fd_batch fed by ops/sync_jax._aligned_wins) materializes every
intermediate — blended windows, per-lane sample indices, the FOC
exponential, the rotated input — to HBM: ~1.5 GB of traffic per cycle,
measured 9-10 ms on a v5e chip for work whose arithmetic floor is well
under 1 ms. This kernel keeps the whole per-window chain resident in
VMEM: only the gathered aligned u8 rows stream in (4 x 43 MB) and the
72-bin symbols stream out (2 x 97 MB f32).

The per-window math is IDENTICAL to get_fd_batch with an aligned-blend
window (reference: the tracker's get_fd, src/tracker_thread.cpp:91-174):

  g[c]  = where(c >= b, row_a[c], row_a1[c])         (cyclic blend)
  j[c]  = c - b + 128*(c < b)                        (true sample index)
  x     = (g - 127)/128 * exp(i*foc_rate*j)          (uint8 + FOC)
  y     = x @ W                                      (128 -> 72 bins,
                                                      2-sample rotation
                                                      folded into W)
  syms  = y * exp(i*(bpo - 2*pi*(late - b)*cn/128))  (ramp + bulk phase)

The row gather itself (rows a, a+1 of the 128-aligned stream) stays in
XLA — data-dependent sublane gathers are not lowerable in Mosaic — but
is done in uint8, a quarter of the f32 gather bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile: windows per grid step. 256 keeps the f32 temporaries ~1 MB and
# the (256, 128) @ (128, 72) dots M-tile aligned.
_T = 256


@functools.lru_cache(maxsize=1)
def _consts():
    """(wr, wi) (128, 72) DFT mats (2-sample rotation folded in) and the
    cn subcarrier-index row (1, 72) — same tables as
    tracker/batch_frontend._dft_mats / ops/tfg.CN."""
    from lte_cell_scanner_tpu.ops.tfg import CN
    from lte_cell_scanner_tpu.tracker.batch_frontend import _dft_mats

    wr, wi = _dft_mats()
    cn = CN.astype(np.float32).reshape(1, 72)
    return wr, wi, cn


def _kernel(yr_ref, yi_ref, yr2_ref, yi2_ref, p_ref, wr_ref, wi_ref,
            cn_ref, or_ref, oi_ref, *, u8: bool, pre_bpo: bool):
    f32 = jnp.float32
    b = p_ref[:, 0:1]                                    # (T, 1) f32
    foc = p_ref[:, 1:2]
    bpo = p_ref[:, 2:3]
    late = p_ref[:, 3:4]

    shape = yr_ref.shape                                 # (T, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(f32)
    mask = lane >= b
    if u8:
        # Mosaic has no u8 -> f32 cast; hop through int32.
        gr = jnp.where(mask, yr_ref[:], yr2_ref[:]
                       ).astype(jnp.int32).astype(f32)
        gi = jnp.where(mask, yi_ref[:], yi2_ref[:]
                       ).astype(jnp.int32).astype(f32)
        gr = (gr - 127.0) * (1.0 / 128.0)
        gi = (gi - 127.0) * (1.0 / 128.0)
    else:
        gr = jnp.where(mask, yr_ref[:], yr2_ref[:])
        gi = jnp.where(mask, yi_ref[:], yi2_ref[:])

    j = lane - b + jnp.where(mask, 0.0, 128.0)
    # pre_bpo folds the bulk phase into the pre-DFT rotation — the
    # factorization of the search chain's extract_tfg (ops/mib_jax.py
    # run(): ang = phase0 + inwin * j), kept EXACTLY so the fused and
    # XLA paths stay bit-identical on TPU (same ops, same order).
    ph = bpo + foc * j if pre_bpo else foc * j
    c, s = jnp.cos(ph), jnp.sin(ph)
    xr = gr * c - gi * s
    xi = gr * s + gi * c

    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    wr, wi = wr_ref[:], wi_ref[:]
    yr = dot(xr, wr) - dot(xi, wi)                       # (T, K)
    yi = dot(xr, wi) + dot(xi, wr)

    if pre_bpo:   # expression order mirrors mib_jax.run()'s rot_pair arg
        ang = -2.0 * np.pi * (late - b) * cn_ref[:] / 128.0
    else:
        ang = bpo - (2.0 * np.pi / 128.0) * (late - b) * cn_ref[:]
    cr, sr = jnp.cos(ang), jnp.sin(ang)
    or_ref[:] = yr * cr - yi * sr
    oi_ref[:] = yr * sr + yi * cr


def fd_demod_pallas(yr, yi, yr2, yi2, b, foc_rate, bpo, late,
                    mats=None, pre_bpo: bool = False,
                    interpret: bool = False):
    """Blend + FOC + DFT + rotation for N windows.

    yr/yi/yr2/yi2: (N, 128) re/im planes of aligned rows a, a+1 — uint8
    raw radio bytes (converted (v-127)/128 in VMEM) or float32 values
    (used as-is); b: (N,) i32 window offset mod 128; foc_rate/bpo/late:
    (N,) f32. ``mats`` overrides the (wr (128, K), wi, cn (K,)) DFT/
    subcarrier tables (default: the tracker's 72-bin pair with the
    2-sample rotation folded in). ``pre_bpo`` applies the bulk phase
    BEFORE the DFT (the search chain's extract_tfg factorization)
    instead of after (the tracker's get_fd factorization).
    Returns syms (N, K, 2) f32 — bitwise layout identical to
    get_fd_batch's output (stacked planes).
    """
    n = yr.shape[0]
    u8 = yr.dtype == jnp.uint8
    fill = np.uint8(127) if u8 else np.float32(0)
    pad = -n % _T
    if pad:
        z = ((0, pad), (0, 0))
        yr = jnp.pad(yr, z, constant_values=fill)
        yi = jnp.pad(yi, z, constant_values=fill)
        yr2 = jnp.pad(yr2, z, constant_values=fill)
        yi2 = jnp.pad(yi2, z, constant_values=fill)
    params = jnp.stack([b.astype(jnp.float32), foc_rate, bpo, late],
                       axis=-1)                          # (N, 4)
    if pad:
        params = jnp.pad(params, ((0, pad), (0, 0)))
    wr, wi, cn = (jnp.asarray(a) for a in (mats or _consts()))
    k = wr.shape[1]
    cn = cn.reshape(1, k)

    grid = (yr.shape[0] // _T,)
    win_spec = pl.BlockSpec((_T, 128), lambda i: (i, 0))
    const2 = pl.BlockSpec((128, k), lambda i: (0, 0))
    out_re, out_im = pl.pallas_call(
        functools.partial(_kernel, u8=u8, pre_bpo=pre_bpo),
        grid=grid,
        in_specs=[win_spec, win_spec, win_spec, win_spec,
                  pl.BlockSpec((_T, 4), lambda i: (i, 0)),
                  const2, const2,
                  pl.BlockSpec((1, k), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((_T, k), lambda i: (i, 0)),
                   pl.BlockSpec((_T, k), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((yr.shape[0], k), jnp.float32),
                   jax.ShapeDtypeStruct((yr.shape[0], k), jnp.float32)],
        interpret=interpret,
    )(yr, yi, yr2, yi2, params, wr, wi, cn)
    return jnp.stack([out_re[:n], out_im[:n]], axis=-1)


def planar_rows(seg_u8, idx):
    """XLA-side aligned-row gather in uint8 (a quarter of the f32 gather
    bytes): seg_u8 (L, 2) raw radio bytes, idx (...,) i32 window starts
    (clamped like ops/sync_jax._aligned_wins).

    Returns (yr, yi, yr2, yi2, b): (..., 128) u8 planes of rows
    idx//128 and idx//128+1, plus b = idx % 128."""
    n = seg_u8.shape[0]
    if n % 128:
        seg_u8 = jnp.pad(seg_u8, ((0, 128 - n % 128), (0, 0)),
                         constant_values=np.uint8(127))
    v = jnp.moveaxis(seg_u8, 1, 0).reshape(2, -1, 128)   # (2, Lr, 128)
    a = jnp.clip(idx // 128, 0, v.shape[1] - 1)
    a1 = jnp.clip(idx // 128 + 1, 0, v.shape[1] - 1)
    return (v[0][a], v[1][a], v[0][a1], v[1][a1],
            (idx % 128).astype(jnp.int32))


def planar_rows_f32(cap, idx):
    """Float32 variant of :func:`planar_rows` for captures that are
    device-resident as (L, 2) f32 value planes (the search decode
    chain's cap_dev contract, ops/sync_jax.sss_foe_batch): same aligned
    rows a, a+1 and b = idx % 128, with the same zero pad and row clamp
    as ops/sync_jax._aligned_wins so the kernel's blend reproduces its
    windows exactly."""
    n = cap.shape[0]
    if n % 128:
        cap = jnp.pad(cap, ((0, 128 - n % 128), (0, 0)))
    v = jnp.moveaxis(cap, 1, 0).reshape(2, -1, 128)      # (2, Lr, 128)
    a = jnp.clip(idx // 128, 0, v.shape[1] - 1)
    a1 = jnp.clip(idx // 128 + 1, 0, v.shape[1] - 1)
    return (v[0][a], v[1][a], v[0][a1], v[1][a1],
            (idx % 128).astype(jnp.int32))
