"""Round-12 batch 1: ADVICE r11 fixes — custom-delimiter rejoin in the
line/paragraph dedup applies, codebook-store key stat-sensitivity, and
reprice.py --passes arg forms."""

from __future__ import annotations

import os

import pyspark.sql.functions as F


# ---------------------------------------------------------------------------
# ADVICE r11: apply_line_dedup / apply_paragraph_dedup rejoin survivors
# with an explicit joiner (delimiter is a regex — not invertible)
# ---------------------------------------------------------------------------


def test_line_dedup_custom_joiner_roundtrip(spark):
    from lab3_spark.operators.dedup import apply_line_dedup

    df = spark.createDataFrame(
        [
            (1, "unique alpha\tcookie banner\tunique beta"),
            (2, "cookie banner\tunique gamma"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in apply_line_dedup(df, delimiter="\t", joiner="\t").collect()
    }
    # doc 1 untouched: survivors must re-join with '\t', not '\n'
    assert out[1]["clean_text"] == "unique alpha\tcookie banner\tunique beta"
    assert out[2]["clean_text"] == "unique gamma"
    assert out[2]["removed_lines"] == 1
    # default joiner for the delimiter path stays '\n' (pre-existing
    # newline-corpus convention; gate values unchanged)
    out_default = {
        r["doc_id"]: r for r in apply_line_dedup(df, delimiter="\t").collect()
    }
    assert (
        out_default[1]["clean_text"]
        == "unique alpha\ncookie banner\nunique beta"
    )


def test_paragraph_dedup_custom_joiner_roundtrip(spark):
    from lab3_spark.operators.dedup import apply_paragraph_dedup

    # no cross-doc near-dups -> all paragraphs survive -> clean_text
    # must reproduce the input byte-for-byte including the separator
    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps##over the lazy sleeping dog")],
        "doc_id long, text string",
    )
    row = apply_paragraph_dedup(
        df, delimiter="##", joiner="##"
    ).collect()[0]
    assert row["removed_paras"] == 0
    assert (
        row["clean_text"]
        == "the quick brown fox jumps##over the lazy sleeping dog"
    )


# ---------------------------------------------------------------------------
# ADVICE r11: codebook store key folds file size+mtime, so in-place
# regeneration of the backing parquet invalidates the artifact
# ---------------------------------------------------------------------------


def test_codebook_store_key_changes_on_touch(spark, tmp_path, monkeypatch):
    from lab3_spark.operators.kmeans import _codebook_store_path

    monkeypatch.setenv("SPARK_GRAFT_CODEBOOK_STORE", "1")
    pq = str(tmp_path / "emb.parquet")
    spark.range(4).select(
        F.col("id"), F.array(F.lit(1.0), F.lit(2.0)).alias("embedding")
    ).write.parquet(pq)
    df = spark.read.parquet(pq)
    key1 = _codebook_store_path(df, 4, 3, False, "test")
    assert key1 is not None
    # same content, different mtime -> different key (in-place regen)
    part = next(
        p for p in os.listdir(pq) if p.endswith(".parquet")
    )
    full = os.path.join(pq, part)
    st = os.stat(full)
    os.utime(full, (st.st_atime + 100, st.st_mtime + 100))
    key2 = _codebook_store_path(df, 4, 3, False, "test")
    assert key2 is not None and key2 != key1
    # hyperparams still key-separate
    key3 = _codebook_store_path(df, 8, 3, False, "test")
    assert key3 != key2


# ---------------------------------------------------------------------------
# ADVICE r11: reprice.py accepts both --passes=N and --passes N
# ---------------------------------------------------------------------------


def test_reprice_passes_arg_forms():
    """parse_args is the real shipped function (not an exec'd source
    slice — the round-12 review's cleanup): both --passes forms parse,
    malformed forms exit with usage instead of a traceback."""
    import importlib.util

    import pytest

    src_path = os.path.join(
        os.path.dirname(__file__), "..", "tools", "reprice.py"
    )
    spec = importlib.util.spec_from_file_location("_reprice", src_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    parse_args = mod.parse_args

    assert parse_args(["--passes=7", "gate_a"]) == (7, ["gate_a"])
    assert parse_args(["--passes", "9", "gate_a"]) == (9, ["gate_a"])
    assert parse_args(["gate_a", "gate_b"]) == (5, ["gate_a", "gate_b"])
    with pytest.raises(SystemExit):
        parse_args(["gate_a", "--passes"])  # bare trailing flag
    with pytest.raises(SystemExit):
        parse_args(["--passes", "gate_a"])  # non-integer N


# ---------------------------------------------------------------------------
# VERDICT r11 item 4: pack_sequences sharded cumsum — exact equality
# with the single-window path
# ---------------------------------------------------------------------------


def test_pack_sequences_sharded_matches_default(spark, sf_dir):
    from lab3_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    base = {
        (r["doc_id"]): (r["n_tokens"], r["bin_id"])
        for r in pack_sequences(docs, budget=64).collect()
    }
    for width in (7, 100, 10**6):
        sharded = {
            (r["doc_id"]): (r["n_tokens"], r["bin_id"])
            for r in pack_sequences(
                docs, budget=64, shard_width=width
            ).collect()
        }
        assert sharded == base, f"shard_width={width} diverged"
