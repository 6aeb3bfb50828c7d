"""Wideband cell search: one wide capture -> a whole fc sweep.

The reference tunes the dongle to every carrier in turn and captures
80 ms each (src/CellSearch.cpp:471-481) — the sweep costs
N_carriers x (tune + settle + capture) of radio time. A wideband SDR
recording (any integer multiple of 1.92 Msps, e.g. a 15.36 or
30.72 Msps full-band LTE capture) contains every carrier of the band at
once: this module channelizes it (io/frontend.py: frequency shift +
polyphase decimating FIR, one MXU matmul per carrier) and feeds the
resulting per-carrier 1.92 Msps captures to the data-parallel sharded
sweep (parallel/fc_sweep.py), so a single 80 ms recording yields every
cell in the band. No reference equivalent — this is the TPU
deployment's high-throughput front end.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

from lte_cell_scanner_tpu.constants import FS_SEARCH
from lte_cell_scanner_tpu.io.frontend import PASSBAND_HZ, decimate_capture
from lte_cell_scanner_tpu.models.cell import Cell

CAPLENGTH = 153600   # the searcher's 80 ms analysis window


def channelize_batch(wide: np.ndarray, fs_in: float, fc_center: float,
                     fc_list: Sequence[float], n_out: int = None):
    """Channelize every carrier in ONE device dispatch.

    The wide capture (complex, fs_in Sps) crosses the link once as f32
    planes; each carrier's frequency shift + polyphase decimating FIR
    (identical math to io/frontend.decimate_capture) runs as a lax.map
    iteration on device. Returns a device-resident (B, 2, n_out) f32
    array of 1.92 Msps channels — ready to feed sharded_fc_sweep
    without ever fetching the narrowband data to host.
    """
    import jax
    import jax.numpy as jnp

    from lte_cell_scanner_tpu.io.frontend import design_decimation_fir

    decim = fs_in / FS_SEARCH
    assert abs(decim - round(decim)) < 1e-9, "fs_in not a 1.92M multiple"
    decim = int(round(decim))
    wide = np.asarray(wide, dtype=complex)
    h = design_decimation_fir(decim)
    taps = h[::-1].copy()
    phases = -(-len(taps) // decim)
    taps = np.pad(taps, (0, phases * decim - len(taps))).reshape(
        phases, decim).astype(np.float32)
    n_blocks = len(wide) // decim
    avail = n_blocks - phases + 1
    if n_out is None:
        n_out = min(CAPLENGTH, avail)
    assert avail >= n_out, "wide capture too short"

    planes = np.stack([wide.real, wide.imag]).astype(np.float32)
    # The rotation angle -2*pi*shift*t/fs_in grows to ~1e5 rad over the
    # capture — hopeless in f32. Integer-Hz shifts make it exactly
    # periodic with period fs/gcd(shift, fs) samples, so the device
    # wraps the sample index with an exact integer mod first and the
    # f32 angle stays < a few cycles (shifts round to the nearest Hz —
    # < 1 Hz error, far below the 5 kHz hypothesis grid).
    fs_int = int(round(fs_in))
    sh_int = np.round([fc - fc_center for fc in fc_list]).astype(np.int64)
    g = np.maximum(np.gcd(np.abs(sh_int), fs_int), 1)
    per = np.where(sh_int != 0, fs_int // g, 1).astype(np.int32)
    rate = (sh_int / fs_int).astype(np.float32)

    n_used = (n_out + phases - 1) * decim

    @jax.jit
    def run(pl, tp):
        t = jnp.arange(n_used, dtype=jnp.int32)

        def one(args):
            rt, pr = args
            tm = jnp.mod(t, pr).astype(jnp.float32)
            ang = (-2.0 * jnp.pi) * rt * tm
            c, s = jnp.cos(ang), jnp.sin(ang)
            xr = pl[0, :n_used] * c - pl[1, :n_used] * s
            xi = pl[0, :n_used] * s + pl[1, :n_used] * c
            xb = jnp.stack([xr, xi]).reshape(2, -1, decim)
            acc = jnp.zeros((2, n_out), jnp.float32)
            for q in range(tp.shape[0]):
                acc = acc + xb[:, q:q + n_out] @ tp[q]
            return acc

        return jax.lax.map(one, (jnp.asarray(rate), jnp.asarray(per)))

    return run(jnp.asarray(planes), jnp.asarray(taps))


def wideband_carriers(fs_in: float, fc_center: float,
                      freq_start: float, freq_end: float,
                      raster: float = 100e3) -> List[float]:
    """The 100 kHz-raster carriers inside [freq_start, freq_end] whose
    600 kHz occupancy fits the recording's usable bandwidth."""
    usable = fs_in / 2.0 - PASSBAND_HZ
    lo = max(freq_start, fc_center - usable)
    hi = min(freq_end, fc_center + usable)
    first = np.ceil(lo / raster) * raster
    return [float(f) for f in np.arange(first, hi + raster / 2, raster)]


def wideband_search_sweep(wide: np.ndarray, fs_in: float,
                          fc_center: float, fc_list: Sequence[float],
                          f_search_set: np.ndarray, mesh=None,
                          backend: str = "numpy", **sweep_kw
                          ) -> Tuple[List[List[Cell]], List[Cell]]:
    """Channelize ``wide`` (complex, fs_in Sps, centered at fc_center)
    at every carrier in fc_list and run the full DP sharded search
    sweep on the resulting 1.92 Msps captures.

    Returns (cells_per_carrier, deduped) like sharded_search_sweep.
    ``backend`` selects the channelizer implementation (the sweep itself
    picks its device path automatically).
    """
    import jax

    from lte_cell_scanner_tpu.parallel.fc_sweep import (
        make_cap_mesh, sharded_search_sweep)

    if backend == "jax":
        # One dispatch channelizes every carrier; the (B, 2, n) f32
        # channels stay device-resident through the sweep — the only
        # host traffic is the wide capture in and the cells out.
        capbufs = channelize_batch(wide, fs_in, fc_center, fc_list)
        B = capbufs.shape[0]
    else:
        caps = []
        for fc in fc_list:
            nb = decimate_capture(wide, fs_in, freq_shift=fc - fc_center,
                                  backend=backend)
            caps.append(nb[:CAPLENGTH])
        n = min(len(c) for c in caps)
        capbufs = np.stack([c[:n] for c in caps])
        B = len(caps)

    if mesh is None:
        n_shards = max(d for d in range(1, len(jax.devices()) + 1)
                       if B % d == 0)
        mesh = make_cap_mesh(n_shards)
    return sharded_search_sweep(capbufs, list(fc_list),
                                np.asarray(f_search_set), mesh,
                                **sweep_kw)
