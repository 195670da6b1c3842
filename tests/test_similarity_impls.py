"""The two LSH-code implementations (Catalyst integer folds vs
Arrow-batched numpy matmul) must be bit-identical."""

from lab3_spark.operators.similarity import lsh_codes, lsh_codes_pandas
from lab3_spark.sources.tables import load_table


def test_expression_and_pandas_codes_identical(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    a = {r["vec_id"]: r["code"] for r in lsh_codes(emb).collect()}
    b = {r["vec_id"]: r["code"] for r in lsh_codes_pandas(emb).collect()}
    assert a == b and len(a) > 0
