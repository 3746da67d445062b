"""The numpy-over-Arrow-buffers framing kernel (alternative backend,
SCONES_VECTORIZED_FRAMING=1) must be byte-exact vs the oracle — including
sliced arrays, nulls, empty batches, and newline-free batches."""

import pyarrow as pa

from scones.corpus import generate_rows
from scones.extract import _frame_batch_vectorized
from scones.oracle import extract_text, frame_bytes

EDGE = [
    b"line1\nline2\n", b"line1\r\nline2\r\n", b"line1\npartial",
    b"", b"no newline", b"abc\r\r\ndef\n", b"\n\r\n", b"a\rb\nc\n",
    b"\r\r\n", b"x\r", b"\rx\n", None, b"\xff\x01\n\xfe\r\n",
]


def _check(arr):
    ex, nl, br = _frame_batch_vectorized(arr)
    for i, d in enumerate(arr.to_pylist()):
        d = d or b""
        f = frame_bytes(d, 0)
        assert bytes(ex[i].as_py()) == extract_text(d), (i, d)
        assert nl[i] == len(f.lines)
        assert br[i] == f.position


def test_vectorized_kernel_edge_cases():
    _check(pa.array(EDGE, pa.binary()))


def test_vectorized_kernel_corpus_and_slices():
    arr = pa.array(
        EDGE + [r["html"] for r in generate_rows(200, seed=3)], pa.binary()
    )
    _check(arr)
    _check(arr.slice(5, len(arr) - 9))


def test_vectorized_kernel_no_newline_batch():
    _check(pa.array([b"abc", b"def", None], pa.binary()))


def test_vectorized_kernel_empty_batch():
    ex, nl, br = _frame_batch_vectorized(pa.array([], pa.binary()))
    assert len(ex) == 0 and len(nl) == 0 and len(br) == 0
