"""Property-based framing equivalence (hypothesis): for ARBITRARY byte
strings and max_length values, all three implementations agree:

  oracle.frame_bytes  (single-threaded reference semantics)
  extract._frame_doc  (the C-call kernel used in the pipeline)
  extract._frame_batch_vectorized  (the numpy/Arrow backend, max_length=0)

No Spark session needed — these are the pure kernels.
"""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from scones.extract import _frame_batch_vectorized, _frame_doc
from scones.oracle import extract_text, frame_bytes

# bytes heavy in newline/CR to stress the framing edge cases
nl_heavy = st.binary(max_size=400).map(
    lambda b: b.replace(b"a", b"\n").replace(b"b", b"\r")
)
any_bytes = st.one_of(st.binary(max_size=400), nl_heavy)


@given(data=any_bytes, max_length=st.sampled_from([0, 1, 2, 5, 100]))
@settings(max_examples=300, deadline=None)
def test_frame_doc_matches_oracle(data, max_length):
    text, n_lines, bytes_read, n_skipped = _frame_doc(data, max_length)
    f = frame_bytes(data, max_length)
    assert text == b"\n".join(f.lines)
    assert n_lines == len(f.lines)
    assert bytes_read == f.position
    assert n_skipped == f.skipped


@given(docs=st.lists(st.one_of(any_bytes, st.none()), max_size=30))
@settings(max_examples=150, deadline=None)
def test_vectorized_batch_matches_oracle(docs):
    arr = pa.array(docs, pa.binary())
    extracted, n_lines, bytes_read = _frame_batch_vectorized(arr)
    for i, d in enumerate(docs):
        d = d or b""
        f = frame_bytes(d, 0)
        assert bytes(extracted[i].as_py()) == extract_text(d)
        assert n_lines[i] == len(f.lines)
        assert bytes_read[i] == f.position


@given(data=any_bytes)
@settings(max_examples=200, deadline=None)
def test_framing_invariants(data):
    """Structural invariants independent of any implementation."""
    f = frame_bytes(data, 0)
    # position never exceeds input length and lands after a newline
    assert 0 <= f.position <= len(data)
    if f.position:
        assert data[f.position - 1 : f.position] == b"\n"
    # emitted lines never contain newline bytes or trailing CR
    for line in f.lines:
        assert b"\n" not in line
        assert not line.endswith(b"\r")
    # re-framing the extracted text is a fixpoint (idempotence)
    text = extract_text(data)
    refr = frame_bytes(text + b"\n" if text or f.lines else b"", 0)
    assert refr.lines == f.lines
