"""3GPP 36.211 Gold-sequence (length-31) pseudo-random generator.

reference: src/lte_lib.cpp:41-147 (lte_pn). The reference fast-forwards the
two 31-bit LFSRs by 1600 steps using hard-coded GF(2) matrices; here we keep
the state in a uint64 bitmask and step it with bitwise ops, vectorized over a
batch of c_init values (the RS table construction needs 60 sequences at
once), which is both simpler and faster than matrix powers at these lengths.

Recurrences (x = [x(n) .. x(n+30)], LSB = x(n)):
    x1(n+31) = x1(n+3) + x1(n)
    x2(n+31) = x2(n+3) + x2(n+2) + x2(n+1) + x2(n)
    c(n)     = x1(n+1600) + x2(n+1600)
"""

from __future__ import annotations

import functools

import numpy as np

_NC = 1600


@functools.lru_cache(maxsize=8)
def _x1_bits(total: int) -> np.ndarray:
    """x1 output bits (same for every c_init): bit stream of length total."""
    out = np.empty(total, dtype=np.uint8)
    state = 1  # x1(0)=1, all others 0
    for n in range(total):
        out[n] = state & 1
        new = ((state >> 3) ^ state) & 1
        state = (state >> 1) | (new << 30)
    return out


def lte_pn_batch(c_inits: np.ndarray, length: int) -> np.ndarray:
    """Generate Gold sequences for a batch of c_init seeds.

    Returns uint8 array of shape (len(c_inits), length).
    """
    c_inits = np.asarray(c_inits, dtype=np.uint64)
    total = _NC + length
    x1 = _x1_bits(total)

    state = c_inits.copy()
    out2 = np.empty((len(c_inits), total), dtype=np.uint8)
    one = np.uint64(1)
    for n in range(total):
        out2[:, n] = (state & one).astype(np.uint8)
        new = ((state >> np.uint64(3)) ^ (state >> np.uint64(2))
               ^ (state >> np.uint64(1)) ^ state) & one
        state = (state >> one) | (new << np.uint64(30))

    return (x1[_NC:] ^ out2[:, _NC:]).astype(np.uint8)


def lte_pn(c_init: int, length: int) -> np.ndarray:
    """Gold sequence c(n), n = 0..length-1, for a single seed."""
    return lte_pn_batch(np.array([c_init], dtype=np.uint64), length)[0]
