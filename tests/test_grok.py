"""Grok structured parsing: compile, typed extraction, unmatched rows."""

import datetime

import pytest

from scones.grok import PATTERNS, compile_grok, grok_parse


def test_compile_grok():
    regex, fields = compile_grok("%{WORD:w} [x] %{INT:n:int}")
    assert fields == [("w", None), ("n", "int")]
    assert regex == r"(\w+)" + "\\ \\[x\\]\\ " + r"([+-]?\d+)"


def test_compile_grok_rejects_unknown():
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")
    with pytest.raises(KeyError):
        compile_grok("%{WORD:x:decimal128}")


def test_grok_parse_typed_fields(spark):
    lines = [
        ("2024-03-01 10:00:00 ERROR disk user=7 value=3.25",),
        ("2024-03-01 11:30:45 INFO boot user=12 value=100",),
        ("totally unparseable line",),
    ]
    df = spark.createDataFrame(lines, ["line"])
    pattern = (
        "%{TIMESTAMP_ISO8601:ts:ts} %{LOGLEVEL:level} %{WORD:unit} "
        "user=%{INT:uid:long} value=%{NUMBER:val:double}"
    )
    kept = grok_parse(df, "line", pattern, keep_unmatched=False).collect()
    assert len(kept) == 2
    by_unit = {r.unit: r for r in kept}
    assert by_unit["disk"].uid == 7 and by_unit["disk"].val == 3.25
    assert by_unit["disk"].level == "ERROR"
    assert by_unit["disk"].ts == datetime.datetime(2024, 3, 1, 10, 0, 0)
    assert by_unit["boot"].val == 100.0

    all_rows = grok_parse(df, "line", pattern, keep_unmatched=True).collect()
    assert len(all_rows) == 3
    bad = [r for r in all_rows if r.line.startswith("totally")][0]
    assert bad.uid is None and bad.val is None and bad.ts is None


def test_grok_patterns_are_groupless():
    """Library fragments must not introduce capture groups (group
    numbering is positional)."""
    import re

    for name, frag in PATTERNS.items():
        assert re.compile(frag).groups == 0, name


def test_one_pass_equals_per_field(spark):
    """The single-regexp-replace strategy must be value-identical to
    per-field regexp_extract on every input shape: matches, non-matches,
    prefix/suffix noise, empty DATA, and sentinel-containing lines."""
    from scones.grok import grok_columns

    lines = [
        ("2024-03-01 10:00:00 ERROR disk user=7 value=3.25",),
        ("noise before 2024-03-01 11:30:45 INFO boot user=12 value=100 and after",),
        ("totally unparseable line",),
        ("2024-03-01 12:00:00 WARN io\x01evil user=1 value=2",),  # sentinel
        ("",),
    ]
    df = spark.createDataFrame(lines, ["line"])
    pattern = (
        "%{TIMESTAMP_ISO8601:ts:ts} %{LOGLEVEL:level} %{WORD:unit} "
        "user=%{INT:uid:long} value=%{NUMBER:val:double}"
    )
    fast = grok_columns("line", pattern, one_pass=True)
    slow = grok_columns("line", pattern, one_pass=False)
    a = df.select("line", *[c.alias(f) for f, c in fast.items()]).collect()
    b = df.select("line", *[c.alias(f) for f, c in slow.items()]).collect()
    assert a == b
