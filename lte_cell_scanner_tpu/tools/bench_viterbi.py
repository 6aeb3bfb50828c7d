"""Device-only latency of the batched tail-biting Viterbi, per variant.

The MIB decode tail (models/convcode_jax.py) is the largest stage of the
device decode program (bench_decode: full - llr cut ~= 2 ms at the
64-candidate batch). This tool times the decoder VARIANTS back-to-back
in ONE process (CLAUDE.md: cross-process slope noise is ±20%) at the
production shape — B = 64 candidates x 4 frame timings x 3 port
hypotheses = 768 decodes of 40 bits — using the only honest method
through the tunneled chip: N data-dependent iterations chained inside
one jitted `lax.scan`, per-iteration latency = slope between two chain
lengths (see tools/bench_scan.py).

Variants:
  loop_gather — the XLA scan trellis with gather traceback
  loop_onehot — + one-hot traceback contractions (the XLA default;
                unroll variants measured a wash or worse — see
                _decode_one's docstring)
  pallas      — the VMEM-resident kernel (models/viterbi_pallas.py);
                measured 0.59 vs 1.27 ms at the 768-decode batch

Reference workload: src/searcher.cpp:1438-1542 (decode_mib's per-
hypothesis viterbi loop); here it is one batched device program.

Usage:
    python -m lte_cell_scanner_tpu.tools.bench_viterbi [--iters 16]
        [--batch 768]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=768)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lte_cell_scanner_tpu.models.convcode import (lte_conv_decode,
                                                      lte_conv_encode)
    from lte_cell_scanner_tpu.models.convcode_jax import _decode_one

    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (args.batch, 40)).astype(np.uint8)
    # (B, 3, 40): encode -> BPSK -> 0 dB AWGN -> LLR (as the parity test)
    llrs = np.stack([2.0 * ((1.0 - 2.0 * lte_conv_encode(b).astype(
        np.float64)) + rng.standard_normal((3, 40))) for b in bits])
    llrs32 = jnp.asarray(llrs.astype(np.float32))

    host = np.stack([lte_conv_decode(l) for l in llrs.astype(np.float32)])

    def batch_fn(unroll, onehot_tb):
        one = functools.partial(_decode_one, unroll=unroll,
                                onehot_tb=onehot_tb)
        return jax.vmap(one)

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
        for n in (max(2, args.iters // 4), args.iters):
            f = chain(body, n)
            np.asarray(f(llrs32))               # compile
            t0 = time.time()
            np.asarray(f(llrs32))
            times[n] = time.time() - t0
        n1, n2 = sorted(times)
        return (times[n2] - times[n1]) / (n2 - n1) * 1e3

    from lte_cell_scanner_tpu.models.viterbi_pallas import (
        lte_conv_decode_pallas)

    results = {"batch": args.batch, "backend": jax.default_backend()}
    variants = ((False, False, "loop_gather"),
                (False, True, "loop_onehot"),
                ("pallas", None, "pallas"))
    for unroll, onehot_tb, key in variants:
        fn = (jax.jit(lte_conv_decode_pallas) if unroll == "pallas"
              else batch_fn(unroll, onehot_tb))
        got = np.asarray(fn(llrs32))
        if not np.array_equal(got, host):
            raise SystemExit(f"variant {key} disagrees with the host "
                             f"decoder on {np.sum(np.any(got != host, 1))}"
                             f"/{args.batch} rows")

        def body(c, fn=fn):
            return jnp.sum(fn(c)).astype(jnp.float32)

        results[f"{key}_ms"] = round(slope(body), 3)
        print(f"# {key}_ms={results[f'{key}_ms']}", file=sys.stderr,
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
