"""Python UDTF surface: parity with the Catalyst tokenizer expression."""

from pyspark.sql import functions as F

from lab3_spark.functions.text import tokenize
from lab3_spark.functions.udtfs import TokenizePositionsUDTF, register_udtfs


def test_udtf_matches_expression_tokenizer(spark, corpus):
    register_udtfs(spark)
    corpus.createOrReplaceTempView("_udtf_corpus")
    got = sorted(
        map(
            tuple,
            spark.sql(
                "SELECT t.doc_id, u.word, u.pos FROM _udtf_corpus t, "
                "LATERAL tokenize_positions(t.text) u"
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            corpus.select(
                "doc_id", F.posexplode(tokenize("text")).alias("pos", "word")
            ).select("doc_id", "word", F.col("pos").cast("int")).collect(),
        )
    )
    assert got == want and len(want) > 0


def test_udtf_direct_call(spark):
    rows = TokenizePositionsUDTF(F.lit("Don't STOP me")).collect()
    assert [(r["word"], r["pos"]) for r in rows] == [
        ("don't", 0), ("stop", 1), ("me", 2)
    ]
