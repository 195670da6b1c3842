"""Sinks (formatted renderers + file writers) and text source tests."""

import os

from lab3_spark.operators.inverted_index import inverted_index
from lab3_spark.operators.wordcount import word_count
from lab3_spark.sinks import (
    render_inverted_index_text,
    render_keyval_text,
    write_csv,
    write_parquet,
)
from lab3_spark.sources.text import read_text_lines


def test_render_keyval_matches_printf(spark, corpus):
    # reference format: printf("%15s - %lu\n", ...) — wordCount.cpp:153
    lines = [
        r["line"] for r in render_keyval_text(word_count(corpus)).collect()
    ]
    assert all(" - " in ln for ln in lines)
    # fox appears 3x; "%15s - %lu" % ("fox", 3)
    assert "            fox - 3" in lines


def test_render_inverted_index(spark, corpus):
    lines = {
        r["line"]
        for r in render_inverted_index_text(inverted_index(corpus)).collect()
    }
    assert "fox - 0, 2" in lines


def test_parquet_csv_roundtrip(spark, corpus, tmp_path):
    out = word_count(corpus)
    pq = os.path.join(str(tmp_path), "wc_parquet")
    cs = os.path.join(str(tmp_path), "wc_csv")
    write_parquet(out, pq)
    write_csv(out, cs)
    back_pq = spark.read.parquet(pq)
    back_cs = spark.read.option("header", "true").csv(cs)
    assert sorted(map(tuple, back_pq.collect())) == sorted(map(tuple, out.collect()))
    assert back_cs.count() == out.count()


def test_read_text_lines_line_numbers(spark, tmp_path):
    p = os.path.join(str(tmp_path), "sample.txt")
    with open(p, "w") as f:
        f.write("first line\nsecond line\nthird line\n")
    df = read_text_lines(spark, p)
    rows = sorted((r["line_no"], r["text"]) for r in df.collect())
    # 0-based contiguous per file (invert.cpp:101-103)
    assert rows == [(0, "first line"), (1, "second line"), (2, "third line")]
    assert df.collect()[0]["doc_id"] == "sample.txt"


def test_reference_corpus_wordcount_if_present(spark):
    """Golden smoke on the reference's own corpus (read-only data file,
    phoenixLab/Dracula.txt) when available."""
    path = "/root/reference/phoenixLab/Dracula.txt"
    if not os.path.exists(path):
        return
    lines = read_text_lines(spark, path)
    wc = {r["word"]: r["cnt"] for r in word_count(lines).collect()}
    # hand-checked: 'dracula' appears in the text; stop words are gone
    assert wc.get("dracula", 0) > 0
    assert "the" not in wc


def test_line_numbers_match_reference_ground_truth(spark):
    """phoenixLab/File2ForLab3.txt prefixes every line with its 1-based
    line number (the lab's hand-check corpus for the inverted index,
    SURVEY §5) — our 0-based line_no must satisfy prefix == line_no+1."""
    import os

    from pyspark.sql import functions as F

    path = "/root/reference/phoenixLab/File2ForLab3.txt"
    if not os.path.exists(path):
        return
    lines = read_text_lines(spark, path)
    prefixed = lines.select(
        "line_no",
        F.regexp_extract("text", r"^(\d+)", 1).cast("long").alias("prefix"),
    ).where(F.col("prefix").isNotNull())
    mismatches = prefixed.where(
        F.col("prefix") != F.col("line_no") + 1
    ).count()
    assert mismatches == 0
    assert prefixed.count() > 20000  # ~24,693 lines all carry prefixes


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC: the other columnar format Spark ships natively — write,
    read back identically, and predicates reach the ORC scan
    (searchArgument pushdown) like parquet."""
    from lab3_spark.plans.explain import formatted_plan

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.count() == orders.count()
    assert back.schema == orders.schema
    filtered = back.where("o_orderstatus = 'F'").select("o_orderkey")
    plan = formatted_plan(filtered)
    assert "PushedFilters" in plan and "o_orderstatus" in plan, plan


def test_observe_metrics_ride_along_with_action(spark, corpus):
    """df.observe(): pipeline QA counters collected DURING the real
    action (no second scan) — the production shape for 'how many docs
    did the cleaner drop' accounting."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation("clean_stats")
    cleaned = (
        corpus.observe(
            obs,
            F.count(F.lit(1)).alias("n_in"),
            F.sum((F.length("text") < 10).cast("long")).alias("n_short"),
        )
        .where(F.length("text") >= 10)
    )
    n_out = cleaned.count()  # the action that populates the observation
    assert obs.get["n_in"] == corpus.count()
    assert obs.get["n_in"] - obs.get["n_short"] == n_out


def test_load_table_self_heals_session_confs(spark, sf_dir):
    """load_table must work on sessions we didn't configure: it pins
    UTC (date_format strings must match the TZ-less oracle) and the
    nanos conf at runtime — the round-1 driver failure mode."""
    from lab3_spark.sources.tables import load_table

    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def test_orc_roundtrip_lossless(spark, sf_dir, tmp_path):
    """ORC write → read preserves schema, row count, and values
    including timestamp microseconds."""
    from lab3_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(200)
    path = str(tmp_path / "ev_orc")
    ev.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == ev.schema
    a = sorted(ev.collect(), key=lambda r: r.event_id)
    b = sorted(back.collect(), key=lambda r: r.event_id)
    assert a == b


def test_value_histogram_partitions_all_events(spark, sf_dir):
    from lab3_spark.operators.events import value_histogram
    from lab3_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    h = value_histogram(ev).collect()
    assert sum(r.n_events for r in h) == ev.count()
    # buckets tile the range: each hi equals the next bucket's lo when
    # adjacent, and bounds are monotone
    for r in h:
        assert r.lo <= r.hi
    byb = sorted(h, key=lambda r: r.bucket)
    for x, y in zip(byb, byb[1:]):
        assert x.bucket < y.bucket
        assert x.hi <= y.lo + 1e-9 or y.bucket > x.bucket + 1


def test_value_histogram_null_and_constant_edge_cases(spark):
    from lab3_spark.operators.events import value_histogram

    rows = [(1, 5.0), (2, 5.0), (3, None), (4, 5.0)]
    ev = spark.createDataFrame(rows, "event_id long, value double")
    h = value_histogram(ev).collect()
    # nulls excluded; constant column collapses to one bucket 0
    assert len(h) == 1
    assert h[0].bucket == 0 and h[0].n_events == 3
    assert h[0].lo == h[0].hi == 5.0


def test_json_source_permissive_corrupt_records(spark, tmp_path):
    """PERMISSIVE JSONL read: malformed lines land in _corrupt_record
    instead of failing the scan — the production posture for crawled
    JSONL where a bad line must not kill a 100 TB job."""
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "good line"}\n'
        "{not json at all}\n"
        '{"doc_id": 2, "text": "also good"}\n'
        '{"doc_id": 3, "text": "trailing garbage"} extra\n'
    )
    schema = "doc_id bigint, text string, _corrupt_record string"
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    # Jackson parses the FIRST object on a line and ignores trailing
    # garbage, so line 4 counts as good — only the structurally
    # malformed line 2 is quarantined (documented parser semantics,
    # pinned here so an upgrade changing them is visible)
    assert {r.doc_id for r in good} == {1, 2, 3}
    assert len(bad) == 1
    # FAILFAST is the opposite contract: the same file must raise
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    strict = (
        spark.read.schema("doc_id bigint, text string")
        .option("mode", "FAILFAST")
        .json(str(p))
    )
    with _pytest.raises(Exception):
        strict.collect()


def test_cli_sql_subcommand(spark, sf_dir, capsys):
    """`python -m lab3_spark sql` registers the testdata views and
    runs arbitrary ANSI SQL through the same session machinery."""
    from lab3_spark.__main__ import main

    rc = main(
        [
            "sql",
            "SELECT count(*) AS n FROM documents",
            "--sf-dir",
            sf_dir,
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "sql took:" in out and "| n " in out.replace("|n  ", "| n ")
