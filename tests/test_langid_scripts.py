"""lang_id script branches (CJK/kana/Cyrillic) — the sf documents are
ASCII, so pin the non-ASCII branches against DuckDB explicitly: Java's
\\p{IsHan} and RE2's \\p{Han} must classify identically."""

import duckdb

from scones.textops import lang_id

CASES = [
    (1, "日本語のテキストです"),          # kana → ja
    (2, "中文网页内容测试"),              # Han only → zh
    (3, "это русский текст для теста"),  # Cyrillic → ru
    (4, "the quick brown fox and the dog in the yard"),  # stopwords → en
    (5, "lorem ipsum dolor sit amet consectetur"),       # none → und
    (6, "漢字とひらがな混在"),            # Han + kana → ja (kana wins)
    (7, ""),                              # empty → und
]


def test_lang_id_scripts_match_duckdb(spark):
    sdf = spark.createDataFrame(CASES, ["doc_id", "text"])
    got = {r.doc_id: r.pred_lang for r in lang_id(sdf).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", CASES)
    import __spark_entry__ as e

    want = dict(con.execute(e.oracle_sql()["lang_id"]).fetchall())
    assert got == want
    assert got[1] == "ja" and got[2] == "zh" and got[3] == "ru"
    assert got[4] == "en" and got[5] == "und" and got[6] == "ja"
    assert got[7] == "und"


def test_extract_passthrough_schema_evolution(spark):
    """Extra input columns flow through extraction untouched (schema
    evolution tolerance — downstream tables can add metadata columns
    without touching the kernel)."""
    from scones.extract import extract_documents

    df = spark.createDataFrame(
        [("u1", b"a\nb\n", "extra-val", 7)],
        "url string, html binary, custom_meta string, revision int",
    )
    out = extract_documents(df).collect()[0]
    assert out.custom_meta == "extra-val" and out.revision == 7
    assert bytes(out.extracted) == b"a\nb"
