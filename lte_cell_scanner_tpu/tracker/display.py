"""Terminal status display for the tracker.

reference: src/display_thread.cpp (ncurses realtime UI with per-cell rows,
ASCII plots of CE magnitude/phase and autocorrelations, expert mode).
This renderer draws the same information from LTETracker.status() either
as plain text (loggable) or live via `rich` when available.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def _fmt(v, spec=".1f", nan="  -  "):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return nan
    return format(v, spec)


def ascii_plot(values: np.ndarray, width: int = 60, height: int = 8,
               label: str = "") -> str:
    """Tiny ASCII plot engine (reference: display_thread.cpp:245-370)."""
    values = np.asarray(values, dtype=float)
    values = values[np.isfinite(values)]
    if values.size == 0:
        return f"{label}: (no data)"
    if len(values) > width:
        idx = np.linspace(0, len(values) - 1, width).astype(int)
        values = values[idx]
    lo, hi = float(values.min()), float(values.max())
    span = (hi - lo) or 1.0
    rows = [[" "] * len(values) for _ in range(height)]
    for x, v in enumerate(values):
        y = int((v - lo) / span * (height - 1))
        rows[height - 1 - y][x] = "*"
    out = [f"{label}  [{lo:.3g} .. {hi:.3g}]"]
    out += ["|" + "".join(r) for r in rows]
    return "\n".join(out)


def render_status(status: dict, expert: bool = False,
                  tracker=None) -> str:
    """One status frame as text."""
    lines = []
    lines.append(
        f"FO: {status['frequency_offset']:+9.1f} Hz   "
        f"searcher cycle: {_fmt(status['searcher_cycle_time'], '.2f')} s   "
        f"drops raw/cell: {status['raw_seconds_dropped']}"
        f"/{status['cell_seconds_dropped']} s")
    lines.append("CID  P CP  nRB  frame_timing  health  MIBs  fifo^  SNR(dB)")
    for c in status["cells"]:
        lines.append(
            f"{c['n_id_cell']:3d}  {c['n_ports']} "
            f"{'N' if c['cp_type'] == 'normal' else 'E':2s} "
            f"{c['n_rb_dl']:4d}  {c['frame_timing']:12.2f}  "
            f"{c['health'] * 100:5.1f}%  {c['mib_successes']:4d}  "
            f"{c['fifo_peak']:5d}  {_fmt(c['sync_snr_db'])}")
    if not status["cells"]:
        lines.append("  (no cells tracked)")

    if expert and any(status.get("debug_g", ())):
        gs = " ".join(f"g{i + 1}={v:g}"
                      for i, v in enumerate(status["debug_g"]) if v)
        lines.append(f"debug: {gs}")
    if expert and tracker is not None:
        for cell in tracker.cells:
            if cell.ce is not None:
                lines.append(ascii_plot(
                    10 * np.log10(np.abs(cell.ce[0]) ** 2 + 1e-12),
                    label=f"cell {cell.n_id_cell} port0 |CE|^2 dB"))
            if cell.ac_td is not None:
                lines.append(ascii_plot(
                    np.abs(cell.ac_td),
                    label=f"cell {cell.n_id_cell} |time autocorrelation|"))
            if cell.ac_fd is not None:
                lines.append(ascii_plot(
                    np.abs(cell.ac_fd),
                    label=f"cell {cell.n_id_cell} |freq autocorrelation|"))
    return "\n".join(lines)


def live_display(tracker, refresh_hz: float = 1.0,
                 duration: Optional[float] = None) -> None:
    """Live updating display using rich, if installed; else periodic print."""
    import time

    try:
        from rich.live import Live
        from rich.text import Text

        with Live(refresh_per_second=refresh_hz) as live:
            t0 = time.time()
            while duration is None or time.time() - t0 < duration:
                live.update(Text(render_status(tracker.status())))
                time.sleep(1.0 / refresh_hz)
    except ImportError:
        t0 = time.time()
        while duration is None or time.time() - t0 < duration:
            print(render_status(tracker.status()))
            time.sleep(1.0 / refresh_hz)
