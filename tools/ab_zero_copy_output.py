"""A/B: zero-copy vs .tobytes() output assembly in the vectorized
framing kernel (BENCH/BASELINE.md §Round 5; TODO #2 / round-4 verdict
item 8).

The kernel's output path builds an Arrow BinaryArray from two fresh
numpy arrays (int32 offsets + uint8 payload).  The original code wrapped
both through ``.tobytes()`` — one extra full copy of the entire output
payload per batch before Arrow ever saw it.  ``pa.py_buffer`` accepts
any buffer-protocol object, so wrapping the numpy arrays directly is
zero-copy; on this host DRAM bandwidth is the flagship bottleneck
(BENCH/BASELINE.md §"Why 8→32 is capped by the host"), so the copy is
pure tax.

Pure-Python A/B (no Spark): generate a realistic html batch with
scones.corpus, run the full vectorized kernel with each output variant
interleaved A/B/A/B, report per-variant medians.  Run on an idle host.
"""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from scones.corpus import generate_rows  # noqa: E402
from scones import extract  # noqa: E402


def make_batch(n_docs: int, seed: int = 7) -> pa.Array:
    rows = generate_rows(n_docs, seed=seed)
    return pa.array([r["html"] for r in rows], pa.binary())


def run_kernel(arr: pa.Array, zero_copy: bool) -> float:
    """One timed kernel pass; the output variant is toggled by swapping
    the buffer-wrapping step exactly as the two code versions differ."""
    t0 = time.perf_counter()
    extracted, n_lines, bytes_read = extract._frame_batch_vectorized(arr)
    if not zero_copy:
        # replay the old path's extra cost: rebuild the output array
        # through tobytes() copies of the same buffers
        bufs = extracted.buffers()
        offsets = np.frombuffer(bufs[1], dtype=np.int32)
        payload = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
        pa.Array.from_buffers(
            pa.binary(),
            len(extracted),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload.tobytes())],
        )
    t1 = time.perf_counter()
    return t1 - t0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 16_384
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    arr = make_batch(n_docs)
    payload_mb = sum(len(x or b"") for x in arr.to_pylist()) / 1e6
    # warmup both paths
    run_kernel(arr, True)
    run_kernel(arr, False)
    zc, cp = [], []
    for _ in range(passes):  # interleave to cancel host drift
        zc.append(run_kernel(arr, True))
        cp.append(run_kernel(arr, False))
    mz, mc = statistics.median(zc), statistics.median(cp)
    print(
        {
            "n_docs": n_docs,
            "payload_mb": round(payload_mb, 1),
            "zero_copy_sec": round(mz, 4),
            "with_tobytes_sec": round(mc, 4),
            "speedup": round(mc / mz, 3),
            "zc_samples": [round(x, 4) for x in zc],
            "cp_samples": [round(x, 4) for x in cp],
        }
    )


if __name__ == "__main__":
    main()
