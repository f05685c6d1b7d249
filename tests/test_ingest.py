"""JSONL ingestion (sources/ingest.py): corrupt isolation accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_sim_spark.sources.ingest import read_jsonl


def test_read_jsonl_splits_good_and_bad(spark, tmp_path):
    lines = [
        '{"id": 1, "text": "alpha"}',
        '{"id": 2, "text": "beta"}',
        '{"id": 3, "text": "gam',  # truncated mid-string
        "not json at all",
        '{"id": "not a number", "text": "delta"}',  # type mismatch
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    good, bad = read_jsonl(spark, str(p), "id long, text string")
    assert {(r["id"], r["text"]) for r in good.collect()} == {(1, "alpha"), (2, "beta")}
    bad_rows = [r["_corrupt_record"] for r in bad.collect()]
    assert len(bad_rows) == 3
    assert "not json at all" in bad_rows
    # nothing silently dropped: good + bad == input lines
    assert good.count() + len(bad_rows) == 5


def test_read_jsonl_fixture_accounting(spark, sf_small):
    """The committed contract fixture: exactly the doc_id%50==7 lines
    land in the bad set, and every bad line is the truncated original."""
    from polars_sim_spark import queries as q

    path = q.ensure_jsonl_fixture(spark, sf_small)
    good, bad = read_jsonl(spark, path, "doc_id long, text string, lang string")
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    n_bad_expected = docs.where(F.col("doc_id") % 50 == 7).count()
    assert bad.count() == n_bad_expected
    assert good.count() == docs.count() - n_bad_expected


def test_read_csv_ingest_corrupt_isolation(spark, tmp_path):
    from polars_sim_spark.sources.ingest import read_csv_ingest

    p = tmp_path / "data.csv"
    p.write_text(
        "1,en,100\n"
        "2,de,not_a_number\n"   # type mismatch -> corrupt
        "3,fr,300\n"
        "4,en\n"                # missing column -> corrupt? (arity short)
        "5,en,500\n"
    )
    good, bad = read_csv_ingest(
        spark, str(tmp_path), "doc_id long, lang string, n_chars long"
    )
    good_rows = {(r.doc_id, r.lang, r.n_chars) for r in good.collect()}
    assert (1, "en", 100) in good_rows and (3, "fr", 300) in good_rows and (5, "en", 500) in good_rows
    assert not any(r[0] == 2 for r in good_rows)
    bad_texts = {r["_corrupt_record"] for r in bad.collect()}
    assert "2,de,not_a_number" in bad_texts
