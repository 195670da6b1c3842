"""Fixed-point k-means: hand-computed Lloyd iterations + table-scale
invariants (operators/kmeans.py)."""

import pytest
from pyspark.sql import functions as F

from lab3_spark.operators.kmeans import kmeans_assign, kmeans_fixed


@pytest.fixture(scope="module")
def tiny(spark):
    # exactly-representable doubles so fixed-pointing is trivial to
    # hand-compute: floor(x * 1e6)
    rows = [
        (0, [0.0, 0.0]),
        (1, [1.0, 1.0]),
        (2, [0.25, 0.0]),
        (3, [0.75, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_hand_computed(spark, tiny):
    """k=2 seeded from vec 0/1: {0,2} and {1,3} from iteration 1 on;
    centroids are floor-averaged fixed-point components."""
    got = [tuple(r) for r in kmeans_fixed(tiny, k=2, n_iter=3).collect()]
    assert got == [
        (0, 0, 125000, 2),
        (0, 1, 0, 2),
        (1, 0, 875000, 2),
        (1, 1, 1000000, 2),
    ]


def test_kmeans_assign_matches_centroid_population(spark, tiny):
    a = kmeans_assign(tiny, k=2, n_iter=3)
    by_cl = {r["vec_id"]: r["cl"] for r in a.collect()}
    assert by_cl == {0: 0, 2: 0, 1: 1, 3: 1}


def test_kmeans_invariants_on_table(spark, sf_dir):
    """Population conservation + bounded centroid components on the
    real embeddings table."""
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    cents = kmeans_fixed(emb, k=8, n_iter=2)
    per_cluster = (
        cents.groupBy("cluster_id")
        .agg(F.min("n_members").alias("lo"), F.max("n_members").alias("hi"))
        .collect()
    )
    # n_members is constant across positions within a cluster
    assert all(r["lo"] == r["hi"] for r in per_cluster)
    assert sum(r["lo"] for r in per_cluster) == n
    # fixed-point components stay inside the unit-ball scale
    bounds = cents.agg(F.min("c").alias("lo"), F.max("c").alias("hi")).collect()[0]
    assert -1_000_000 <= bounds["lo"] and bounds["hi"] <= 1_000_000


def test_assignment_arrow_equals_expression(spark, sf_dir):
    """The Arrow batch argmin and the Catalyst expression fold are the
    same int64 arithmetic — bit-equal assignments on the real table."""
    from lab3_spark.operators.kmeans import (
        _assign_arrow,
        assign_expr_frame,
        trained_centroids,
    )
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cents = trained_centroids(emb, k=8, n_iter=2)
    a = {r["vec_id"]: r["cl"] for r in _assign_arrow(emb, cents).collect()}
    e = {r["vec_id"]: r["cl"] for r in assign_expr_frame(emb, cents).collect()}
    assert a == e


def test_ivf_recall_floor_and_multiprobe_lift(spark, sf_dir):
    """The quantizer-quality gate: trained-IVF recall@5 vs brute force
    must clear a floor, and probing 2 cells must not lose recall vs
    probing 1 (everything is deterministic — fixed seeds, fixed data —
    so these are exact pins, not statistical ones)."""
    from lab3_spark.operators.kmeans import ann_recall_vs_bruteforce
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    means = {}
    for nprobe in (1, 2):
        rows = ann_recall_vs_bruteforce(emb, nprobe=nprobe).collect()
        assert len(rows) > 0
        means[nprobe] = sum(r["recall"] for r in rows) / len(rows)
    # measured 0.54 / 0.71 at sf0.001 — floors leave headroom for
    # other scale factors, the ordering is the real invariant
    assert means[1] >= 0.4, means
    assert means[2] >= means[1], means


def test_null_embedding_fails_loudly(spark):
    """pyarrow flatten() silently drops null lists — without the shape
    guard a single NULL embedding would shift every later vector in
    the batch and corrupt assignments with no error."""
    import pytest as _pytest

    from lab3_spark.operators.kmeans import kmeans_fixed

    rows = [(0, [0.1, 0.2]), (1, [0.3, 0.4]), (2, None), (3, [0.5, 0.6])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with _pytest.raises(Exception, match="shape violation"):
        kmeans_fixed(df, k=2, n_iter=1).collect()


def test_semantic_near_duplicates_tiny(spark, tiny):
    """SemDeDup on the hand-computed clusters: pairs form only WITHIN
    a trained cell ({0,2} and {1,3}), cos is the exact unit-vector
    dot.  Vec 0 is the zero vector — its unit vector is NULL-guarded,
    so only (1,3) can pass the threshold."""
    from lab3_spark.operators.kmeans import semantic_near_duplicates

    got = semantic_near_duplicates(tiny, min_cosine=0.35, k=2, n_iter=3).collect()
    assert [(r["vec_a"], r["vec_b"]) for r in got] == [(1, 3)]
    # cos((1,1),(0.75,1)) = 1.75/(sqrt(2)*1.25) = 0.9899...
    assert abs(got[0]["cos"] - 0.9899) < 1e-9


def test_semantic_blocking_is_subset_of_allpairs(spark, sf_dir):
    """Every SemDeDup pair is a true near-dup pair (blocking never
    invents pairs): within-cell pairs ⊆ all-pairs above threshold."""
    from lab3_spark.functions.rounding import trunc
    from lab3_spark.functions.vectors import dot_product, unit_vector
    from lab3_spark.operators.kmeans import semantic_near_duplicates
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    sem = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in semantic_near_duplicates(emb, k=4, n_iter=2).collect()
    }
    e = emb.select("vec_id", unit_vector("embedding").alias("u"))
    a, b = e.alias("a"), e.alias("b")
    allpairs = {
        (r["vec_a"], r["vec_b"], r["cos"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            trunc(dot_product(F.col("a.u"), F.col("b.u")), 4).alias("cos"),
        )
        .where(F.col("cos") >= 0.35)
        .collect()
    }
    assert sem <= allpairs
    assert len(sem) > 0


def test_pq_adc_structure_and_determinism(spark, sf_dir):
    """PQ-ADC result: 5 ranked neighbors per query, adist
    non-decreasing within a query, and two runs are identical
    (all-integer path — no float nondeterminism anywhere)."""
    from lab3_spark.operators.kmeans import ann_pq_adc
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    a = [tuple(r) for r in ann_pq_adc(emb, n_iter=2).collect()]
    b = [tuple(r) for r in ann_pq_adc(emb, n_iter=2).collect()]
    assert a == b
    per_q = {}
    for (q, n, d, rnk) in a:
        per_q.setdefault(q, []).append((rnk, d))
    for q, rows in per_q.items():
        rows.sort()
        assert [r for r, _ in rows] == list(range(1, len(rows) + 1))
        dists = [d for _, d in rows]
        assert dists == sorted(dists), (q, dists)


def test_pq_recall_floor(spark, sf_dir):
    """PQ recall@5 vs exact L2 ≥ 6× the random-guess baseline — the
    quantizer-breakage detector (measured ~0.13-0.15 on the synthetic
    near-random embeddings; random ≈ 5/N ≈ 0.01)."""
    from pyspark.sql import functions as F

    from lab3_spark.operators.kmeans import ann_pq_recall
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    r = ann_pq_recall(emb, n_iter=2)
    agg = r.agg(F.sum("n_hit").alias("h"), F.sum("n_true").alias("t")).collect()[0]
    assert agg["h"] / agg["t"] >= 0.06, (agg["h"], agg["t"])


def test_ivf_pq_neighbors_come_from_probed_cells(spark, sf_dir):
    """Structural guarantee of the IVF restriction: every returned
    neighbor lies in one of its query's nprobe probed cells, and the
    ADC distances agree with the flat PQ ranking for shared pairs."""
    from pyspark.sql import functions as F

    from lab3_spark.operators.kmeans import (
        _nearest_cells_expr,
        ann_ivf_pq,
        ann_pq_adc,
        fixed_point,
        kmeans_assign,
        trained_centroids,
    )
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_ivf_pq(emb, n_queries=10, topk=5, nprobe=2).collect()
    assert out, "ivf-pq returned nothing"
    cells = {
        r.vec_id: r.cl for r in kmeans_assign(emb).select("vec_id", "cl").collect()
    }
    cents = trained_centroids(emb)
    probed = {
        r.query_id: set(r.cells)
        for r in emb.where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            fixed_point(F.col("embedding")).alias("xi"),
        )
        .select("query_id", _nearest_cells_expr(cents, 2).alias("cells"))
        .collect()
    }
    for r in out:
        assert cells[r.neighbor_id] in probed[r.query_id], (
            r.query_id, r.neighbor_id
        )
    # shared (query, neighbor) pairs carry the same ADC distance as
    # the flat PQ ranking (same codes, same tables)
    flat = {
        (r.query_id, r.neighbor_id): r.adist
        for r in ann_pq_adc(emb, n_queries=10, topk=2000).collect()
    }
    for r in out:
        assert flat[(r.query_id, r.neighbor_id)] == r.adist


def test_prescaled_training_matches_float_training(spark, sf_dir):
    """The prescaled (bigint-native) Lloyd path is bit-identical to
    the float path on the same values: training on fixed_point(emb)
    with prescaled=True must reproduce trained_centroids(emb) exactly
    — the equivalence the residual IVF-PQ oracle chain relies on."""
    from lab3_spark.operators.kmeans import fixed_point, trained_centroids
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    pre = emb.select(
        "vec_id", fixed_point(F.col("embedding")).alias("embedding")
    )
    assert trained_centroids(pre, 4, 2, prescaled=True) == trained_centroids(
        emb, 4, 2
    )


def test_ivfpq_residual_neighbors_from_probed_cells(spark, sf_dir):
    """Residual IVF-PQ keeps the IVF structural guarantee (neighbors
    only from probed cells) and is NOT the raw-vector ranking: the
    per-cell residual tables must differ from the flat ADC distances
    for at least one shared pair (else the residual path silently
    degenerated to the raw one)."""
    from lab3_spark.operators.kmeans import (
        _nearest_cells_expr,
        ann_ivf_pq,
        ann_ivf_pq_residual,
        fixed_point,
        kmeans_assign,
        trained_centroids,
    )
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_ivf_pq_residual(emb, n_queries=10, topk=5, nprobe=2).collect()
    assert out, "residual ivf-pq returned nothing"
    cells = {
        r.vec_id: r.cl for r in kmeans_assign(emb).select("vec_id", "cl").collect()
    }
    cents = trained_centroids(emb)
    probed = {
        r.query_id: set(r.cells)
        for r in emb.where(F.col("vec_id") < 10)
        .select(
            F.col("vec_id").alias("query_id"),
            fixed_point(F.col("embedding")).alias("xi"),
        )
        .select("query_id", _nearest_cells_expr(cents, 2).alias("cells"))
        .collect()
    }
    for r in out:
        assert cells[r.neighbor_id] in probed[r.query_id], (
            r.query_id, r.neighbor_id
        )
    raw = {
        (r.query_id, r.neighbor_id): r.adist
        for r in ann_ivf_pq(emb, n_queries=10, topk=5, nprobe=2).collect()
    }
    shared = [
        (k, v) for k, v in (((r.query_id, r.neighbor_id), r.adist) for r in out)
        if k in raw
    ]
    assert any(raw[k] != v for k, v in shared) or not shared


def test_ivfpq_rerank_exact_distances_within_shortlist(spark, sf_dir):
    """Stage-2 results come only from the stage-1 shortlist and carry
    EXACT fixed-point L2 distances (cross-checked against the
    brute-force frame, which shares no code with _exact_rerank)."""
    from lab3_spark.operators.kmeans import (
        ann_bruteforce_l2,
        ann_ivf_pq_residual,
        ann_ivfpq_rerank,
    )
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = ann_ivfpq_rerank(
        emb, n_queries=10, topk=3, shortlist=8, nprobe=2
    ).collect()
    assert out, "rerank returned nothing"
    short = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_pq_residual(
            emb, n_queries=10, topk=8, nprobe=2
        ).collect()
    }
    exact = {
        (r.query_id, r.neighbor_id): r.dist
        for r in ann_bruteforce_l2(emb, n_queries=10, topk=10**9).collect()
    }
    for r in out:
        assert (r.query_id, r.neighbor_id) in short
        assert exact[(r.query_id, r.neighbor_id)] == r.dist


def test_ivfpq_recall_floor(spark, sf_dir):
    """Combined IVF+PQ recall stays far above random (measured 0.12 at
    sf0.001 vs ~0.01 random-guess; collapses if the probe, residual,
    or coding path breaks)."""
    from lab3_spark.operators.kmeans import ann_ivfpq_recall
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    r = ann_ivfpq_recall(emb)
    agg = r.agg(F.sum("n_hit").alias("h"), F.sum("n_true").alias("t")).collect()[0]
    assert agg["h"] / agg["t"] >= 0.06, (agg["h"], agg["t"])


def test_frozen_append_assigns_new_vectors_without_retraining(spark, sf_dir):
    """The frozen-quantizer index: centroids come from the training
    subset only (differ from full-corpus training), yet appended
    vectors (vec_id >= limit) are present in the index and returned
    as neighbors."""
    from lab3_spark.operators.kmeans import ann_ivf_trained, trained_centroids
    from lab3_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    limit = 256
    frozen = trained_centroids(emb.where(F.col("vec_id") < limit), 8, 3)
    full = trained_centroids(emb, 8, 3)
    assert frozen != full, "subset training should move the centroids"
    out = ann_ivf_trained(emb, nprobe=2, train_limit=limit).collect()
    assert out
    assert any(r.neighbor_id >= limit for r in out), (
        "appended vectors must be queryable"
    )


def test_sql_builders_match_column_builders(spark):
    """Round-11 py4j-cost fix: the single-parse SQL forms of the
    centroid expression builders must be value-identical to the
    original nested-Column forms (kept here as the reference)."""
    from pyspark.sql import functions as F

    from lab3_spark.operators.kmeans import (
        _assign_expr,
        _cent_lookup_expr,
        _dist_table_expr,
        _nearest_cells_expr,
    )

    cents = [(0, [1, -2, 3]), (2, [4, 5, -6]), (5, [-7, 8, 9])]

    def col_dist_table(cents):
        zero = F.lit(0).cast("bigint")
        structs = []
        for cl, arr in cents:
            lits = F.array(*[F.lit(int(v)).cast("bigint") for v in arr])
            diff2 = F.zip_with(
                F.col("xi"), lits, lambda a, b: (a - b) * (a - b)
            )
            dist = F.aggregate(diff2, zero, lambda acc, v: acc + v)
            structs.append(
                F.struct(
                    dist.alias("dist"),
                    F.lit(int(cl)).cast("bigint").alias("code"),
                )
            )
        return F.array(*structs)

    def col_assign(cents):
        zero = F.lit(0).cast("bigint")
        structs = []
        for cl, arr in cents:
            lits = F.array(*[F.lit(int(v)).cast("bigint") for v in arr])
            diff2 = F.zip_with(
                F.col("xi"), lits, lambda a, b: (a - b) * (a - b)
            )
            dist = F.aggregate(diff2, zero, lambda acc, v: acc + v)
            structs.append(
                F.struct(
                    dist.alias("dist"),
                    F.lit(int(cl)).cast("bigint").alias("cl"),
                )
            )
        return F.array_min(F.array(*structs))["cl"]

    def col_lookup(cents):
        keys = F.array(*[F.lit(int(cl)).cast("bigint") for cl, _ in cents])
        vals = F.array(
            *[
                F.array(*[F.lit(int(v)).cast("bigint") for v in arr])
                for _, arr in cents
            ]
        )
        return F.element_at(F.map_from_arrays(keys, vals), F.col("cl"))

    def col_nearest(cents, nprobe):
        ordered = F.array_sort(col_dist_table(cents))
        return F.transform(F.slice(ordered, 1, nprobe), lambda s: s["code"])

    df = spark.createDataFrame(
        [(0, [1, 2, 3], 0), (1, [-4, 0, 9], 2), (2, [7, 7, 7], 5)],
        "vec_id long, xi array<bigint>, cl long",
    )
    got = df.select(
        "vec_id",
        _dist_table_expr(cents).alias("dt"),
        _assign_expr(cents).alias("asg"),
        _cent_lookup_expr(cents).alias("lk"),
        _nearest_cells_expr(cents, 2).alias("nc"),
    ).collect()
    want = df.select(
        "vec_id",
        col_dist_table(cents).alias("dt"),
        col_assign(cents).alias("asg"),
        col_lookup(cents).alias("lk"),
        col_nearest(cents, 2).alias("nc"),
    ).collect()
    assert [r.asDict(recursive=True) for r in got] == [
        r.asDict(recursive=True) for r in want
    ]


def test_kmeans_silhouette_properties(spark, sf_dir):
    """Simplified silhouette invariants on real testdata: one row per
    trained cluster, memberships partition the corpus, scores inside
    [0, 1e6] with min <= mean <= max, and at least one cluster is
    better-than-boundary (mean > 0) — the embeddings are not all
    equidistant from two centroids."""
    from lab3_spark.operators.kmeans import kmeans_silhouette

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    rows = kmeans_silhouette(emb, k=8, n_iter=3).collect()
    assert len(rows) == 8
    assert sum(r["n_members"] for r in rows) == emb.count()
    for r in rows:
        assert 0 <= r["min_sil_fp"] <= r["mean_sil_fp"] <= r["max_sil_fp"] <= 10**6
    assert any(r["mean_sil_fp"] > 0 for r in rows)
