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
            cn_ref, or_ref, oi_ref):
    f32 = jnp.float32
    b = p_ref[:, 0:1]                                    # (T, 1) f32
    foc = p_ref[:, 1:2]
    bpo = p_ref[:, 2:3]
    late = p_ref[:, 3:4]

    shape = yr_ref.shape                                 # (T, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(f32)
    mask = lane >= b
    # Mosaic has no u8 -> f32 cast; hop through int32.
    gr = jnp.where(mask, yr_ref[:], yr2_ref[:]).astype(jnp.int32).astype(f32)
    gi = jnp.where(mask, yi_ref[:], yi2_ref[:]).astype(jnp.int32).astype(f32)
    gr = (gr - 127.0) * (1.0 / 128.0)
    gi = (gi - 127.0) * (1.0 / 128.0)

    j = lane - b + jnp.where(mask, 0.0, 128.0)
    ph = foc * j
    c, s = jnp.cos(ph), jnp.sin(ph)
    xr = gr * c - gi * s
    xi = gr * s + gi * c

    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=f32)
    wr, wi = wr_ref[:], wi_ref[:]
    yr = dot(xr, wr) - dot(xi, wi)                       # (T, 72)
    yi = dot(xr, wi) + dot(xi, wr)

    ang = bpo - (2.0 * np.pi / 128.0) * (late - b) * cn_ref[:]
    cr, sr = jnp.cos(ang), jnp.sin(ang)
    or_ref[:] = yr * cr - yi * sr
    oi_ref[:] = yr * sr + yi * cr


def fd_demod_pallas(yr, yi, yr2, yi2, b, foc_rate, bpo, late,
                    interpret: bool = False):
    """Blend + FOC + DFT + rotation for N windows.

    yr/yi/yr2/yi2: (N, 128) uint8 — re/im planes of aligned rows a, a+1;
    b: (N,) i32 window offset mod 128; foc_rate/bpo/late: (N,) f32.
    Returns syms (N, 72, 2) f32 — bitwise layout identical to
    get_fd_batch's output (stacked planes).
    """
    n = yr.shape[0]
    pad = -n % _T
    if pad:
        z = ((0, pad), (0, 0))
        yr = jnp.pad(yr, z, constant_values=np.uint8(127))
        yi = jnp.pad(yi, z, constant_values=np.uint8(127))
        yr2 = jnp.pad(yr2, z, constant_values=np.uint8(127))
        yi2 = jnp.pad(yi2, z, constant_values=np.uint8(127))
    params = jnp.stack([b.astype(jnp.float32), foc_rate, bpo, late],
                       axis=-1)                          # (N, 4)
    if pad:
        params = jnp.pad(params, ((0, pad), (0, 0)))
    wr, wi, cn = (jnp.asarray(a) for a in _consts())

    grid = (yr.shape[0] // _T,)
    win_spec = pl.BlockSpec((_T, 128), lambda i: (i, 0))
    const2 = pl.BlockSpec((128, 72), lambda i: (0, 0))
    out_re, out_im = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[win_spec, win_spec, win_spec, win_spec,
                  pl.BlockSpec((_T, 4), lambda i: (i, 0)),
                  const2, const2,
                  pl.BlockSpec((1, 72), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((_T, 72), lambda i: (i, 0)),
                   pl.BlockSpec((_T, 72), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((yr.shape[0], 72), jnp.float32),
                   jax.ShapeDtypeStruct((yr.shape[0], 72), jnp.float32)],
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
