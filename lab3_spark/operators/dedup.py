"""Deduplication operators for training-data pipelines.

Five strategies, all engine-native (no Python on the hot path) and all
deterministic/cross-engine-checkable via the portable md5 hash
(functions/text.py):

- exact:       md5 fingerprint of the normalized token stream
- MinHash+LSH: word-shingle minhash signatures, banded bucket join
- SimHash:     60-bit weighted token hash, chunk-blocked hamming pairs
- n-gram Jaccard: exact Jaccard on LSH candidate pairs
- embedding cosine: label-blocked (IVF-style) near-duplicate vectors

Scale design (the point of each strategy at 100 TB):
- exact dedup is a single hash-shuffle on the fingerprint.
- MinHash/LSH replaces the O(n²) all-pairs comparison with a
  shuffle-on-band-key join; candidates per bucket are bounded, so cost
  is ~linear in corpus size.  Signature width/bands tune recall.
- SimHash chunk blocking (pigeonhole: 4 chunks, hamming ≤ 3 ⇒ one
  chunk equal) likewise turns all-pairs hamming into an equi-join.
- embedding dedup blocks on a coarse partition (here: `label`, standing
  in for an IVF centroid id) — each block is an independent self-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark.sql.window import Window

from lab3_spark.functions.partitioning import spread
from lab3_spark.functions.rounding import trunc
from lab3_spark.functions.text import md5_long, tokenize
from lab3_spark.functions.vectors import cosine_similarity

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_N = 3
SIM_BITS = 60
SIM_CHUNKS = 4
CHUNK_BITS = SIM_BITS // SIM_CHUNKS


def exact_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp, n_copies, is_dup): is_dup=1 unless the doc is the
    min-doc_id representative of its fingerprint group.

    The keep-rule (min id) is the deterministic canonical-
    representative policy.  Shape: groupBy(fp).agg(count, min) + ONE
    equi-join back — NOT a window over fp (round-11 skew audit, same
    fix as apply_line_dedup's keep-first): a window co-locates every
    copy of a hot fingerprint in one unsplittable task, while the agg
    map-side combines a hot fp to one row per input partition and the
    join back is the shape AQE's skew-join splits.  At 100 TB the hot
    fingerprint is exactly what exact dedup exists to collapse."""
    norm = F.concat_ws(" ", tokenize(text_col))
    fps = documents.select("doc_id", F.md5(norm).alias("fp"))
    stats = fps.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min("doc_id").alias("_keep"),
    )
    return (
        fps.join(stats, "fp")
        .select(
            "doc_id",
            "fp",
            "n_copies",
            (F.col("doc_id") != F.col("_keep")).cast("int").alias("is_dup"),
        )
        .orderBy("doc_id")
    )


def copy_spectrum(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(n_copies, n_groups, n_docs): the corpus duplication SPECTRUM —
    how many distinct contents exist at each copy count (1 = unique,
    2 = one duplicate, …) and how many documents they bind.  The
    one-table duplication health profile a curation run reads before
    dedup ("is duplication a few hot templates or a long tail?") and
    re-reads after to prove the spectrum collapsed to n_copies = 1.

    Two combinable aggregations: fingerprint groupBy (map-side
    partial), then a ≤|spectrum|-row regroup — no windows, no joins,
    the cheapest possible dedup diagnostic at any corpus size."""
    norm = F.concat_ws(" ", tokenize(text_col))
    groups = (
        documents.select(F.md5(norm).alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_copies"))
    )
    return (
        groups.groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum("n_copies").cast("bigint").alias("n_docs"),
        )
        .orderBy("n_copies")
    )


def keep_best_duplicates(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fp, quality, n_copies, keep): QUALITY-AWARE exact dedup
    — within each content-fingerprint group keep the doc with the
    highest quality score (ties → lowest doc_id), not the lowest id.
    This is what production corpus dedup actually does: near-identical
    crawls differ in boilerplate, and the keep-rule should prefer the
    cleanest copy.

    quality = textstats.quality_expr — the SAME expression object the
    quality_score operator reports (truncated, so the oracle's window
    comparisons see exact decimals).  Cost: one shuffle on fp (the
    window), identical to min-id exact dedup; the per-doc hash/score
    projection is spread across cores first (single-row-group scans).

    Degenerate-key note (100 TB): the row-level flags come from
    groupBy(fp).agg(count, max_by) + ONE equi-join back — NOT a window
    over fp (round-11 skew audit, the exact_duplicates /
    apply_line_dedup fix): the agg map-side combines a pathological
    fingerprint with millions of copies to one candidate row per input
    partition, and the join back is the shape AQE's skew-join splits;
    a window form landed the whole group on one unsplittable task.
    ``dedup_survivors`` remains the survivors-only form (no join at
    all) when per-row flags aren't needed."""
    from lab3_spark.operators.textstats import quality_expr

    norm = F.concat_ws(" ", tokenize(text_col))
    score = quality_expr(text_col)
    fps = spread(documents).select(
        "doc_id", F.md5(norm).alias("fp"), trunc(score, 4).alias("quality")
    )
    stats = fps.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.max_by(
            "doc_id", F.struct("quality", (-F.col("doc_id")).alias("nid"))
        ).alias("_keep"),
    )
    return (
        fps.join(stats, "fp")
        .select(
            "doc_id",
            "fp",
            "quality",
            "n_copies",
            (F.col("doc_id") == F.col("_keep")).cast("int").alias("keep"),
        )
        .orderBy("doc_id")
    )


def dedup_survivors(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(fp, doc_id, quality, n_copies): exactly ONE surviving row per
    content-fingerprint group — the highest-quality copy, ties broken
    to the lowest doc_id.

    The COMBINE-ABLE form promised by keep_best_duplicates' docstring:
    ``groupBy(fp).agg(max_by(doc_id, struct(quality, -doc_id)))``
    partial-aggregates map-side, so a degenerate fingerprint (millions
    of byte-identical copies of one boilerplate page — common in web
    corpora) reduces to ONE candidate row per map partition before the
    shuffle.  The window form (`Window.partitionBy("fp")`) lands that
    whole group on a single task.  Use this when only survivors are
    needed; ``keep_best_duplicates`` when per-row audit flags are.

    A plan test pins the shape: partial+final aggregation, no Window
    operator anywhere in the physical plan."""
    from lab3_spark.operators.textstats import quality_expr

    norm = F.concat_ws(" ", tokenize(text_col))
    base = spread(documents).select(
        "doc_id",
        F.md5(norm).alias("fp"),
        trunc(quality_expr(text_col), 4).alias("quality"),
    )
    # one max_by keyed on (quality, -doc_id): struct ordering is
    # lexicographic, so higher quality wins, then lower doc_id
    best = F.max_by(
        F.struct(F.col("doc_id"), F.col("quality")),
        F.struct(F.col("quality"), (-F.col("doc_id")).alias("nid")),
    )
    return (
        base.groupBy("fp")
        .agg(best.alias("_best"), F.count("*").alias("n_copies"))
        .select(
            "fp",
            F.col("_best.doc_id").alias("doc_id"),
            F.col("_best.quality").alias("quality"),
            "n_copies",
        )
        .orderBy("fp")
    )


def repeated_chunks(
    documents: DataFrame, chunk_tokens: int = 64, text_col: str = "text"
) -> DataFrame:
    """(chunk_fp, n_occurrences, n_docs, first_doc_id): fixed-window
    chunks of the token stream that occur more than once in the corpus
    — the cheap, shuffle-bounded approximation of substring-level
    dedup (Lee et al. 2021 use suffix arrays; a 64-token window
    catches the same boilerplate/templating mass at equi-join cost).

    Cost: the chunk explode is narrow (sampling.chunk_documents), then
    ONE hash shuffle on the chunk fingerprint with map-side partial
    aggregation.  At 100 TB the group-by key is a 32-char md5 — the
    same cardinality class as exact-dedup fingerprints."""
    from lab3_spark.operators.sampling import chunk_documents

    ch = chunk_documents(documents, chunk_tokens=chunk_tokens, text_col=text_col)
    return (
        ch.groupBy(F.md5("chunk_text").alias("chunk_fp"))
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .where(F.col("n_occurrences") > 1)
        .orderBy("chunk_fp")
    )


def exact_substring_spans(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_span_tokens: int = 50,
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens): maximal per-document
    token spans (end exclusive, 0-based token positions) every one of
    whose positional word n-grams occurs at ≥ 2 (doc, position) sites
    corpus-wide, kept when the span reaches ``min_span_tokens`` — the
    TRAIN-internal exact-substring dedup of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"), whose
    ExactSubstr pass finds verbatim repeated substrings ≥ 50 tokens;
    the emitted [span_start, span_end) token range IS the paper's
    remove-span action.

    Gram CHAINING is the standard distributed approximation of the
    paper's suffix array (the fixed-window regime belongs to
    :func:`repeated_chunks`; this is its maximal-span upgrade): a
    chained run guarantees every n-token sub-window of the span is
    duplicated somewhere, not that a single partner holds the whole
    span contiguously — so spans are supersets of the exact
    suffix-array spans and nothing is missed (every verbatim repeated
    span of ≥ n tokens chains by construction).  Within-document
    repetition counts toward duplication exactly as in the paper: a
    document repeating its own 50-token block is dedup-worthy
    boilerplate.

    Shape: positional grams (ONE corpus scan), a map-side-distinct
    duplicated-gram table (``count ≥ 2`` over occurrences — the
    wordCount aggregate, wordCount.cpp:67-86, applied to grams), ONE
    semi-join on the gram (the irreducible membership probe, never
    all-pairs), then the per-document gaps-and-islands fold
    (pos − row_number) to maximal runs.  The islands window is
    per-document — bounded by document length, the per-entity window
    class (sessionize, rolling revenue) — never corpus-wide."""
    from lab3_spark.functions.partitioning import memo_persist
    from lab3_spark.operators.textstats import _word_ngrams

    # cached gram-partitioned (optimization round 13, guide §2.4 —
    # the sparse_tfidf pattern): both consumers are gram-keyed (the
    # occ>=2 agg and the semi-join probe), so laying the cache out on
    # gram removes BOTH downstream gram exchanges — before, the probe
    # side re-shuffled the full positional stream every action
    par = documents.sparkSession.sparkContext.defaultParallelism
    grams = memo_persist(
        f"dedup.exact_substring_spans.grams.{n}",
        spread(documents)
        .select(
            "doc_id",
            F.posexplode(_word_ngrams(tokenize(text_col), n)).alias(
                "pos", "gram"
            ),
        )
        .repartition(par, "gram"),
    )
    dup = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("occ"))
        .where(F.col("occ") >= 2)
        .select("gram")
    )
    hits = grams.join(dup, "gram", "left_semi").select("doc_id", "pos")
    return spans_from_hits(hits, n, min_span_tokens).orderBy(
        "doc_id", "span_start"
    )


def spans_from_hits(
    hits: DataFrame, n: int, min_span_tokens: int
) -> DataFrame:
    """(doc_id, span_start, span_end, span_tokens) from (doc_id, pos)
    duplicated-gram hits — the gaps-and-islands fold of
    :func:`exact_substring_spans`, factored out so the streaming
    incremental store (streaming/incremental_spans.py) shares it
    VERBATIM and cannot drift from the batch semantics.  The islands
    window is per-document (bounded by doc length)."""
    w = Window.partitionBy("doc_id").orderBy("pos")
    return (
        hits.withColumn("grp", F.col("pos") - F.row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(
            F.min("pos").alias("span_start"),
            (F.count(F.lit(1)) + (n - 1)).alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= min_span_tokens)
        .select(
            "doc_id",
            F.col("span_start").cast("bigint").alias("span_start"),
            (F.col("span_start") + F.col("span_tokens"))
            .cast("bigint")
            .alias("span_end"),
            F.col("span_tokens").cast("bigint").alias("span_tokens"),
        )
    )


def merge_spans(spans: DataFrame) -> DataFrame:
    """(doc_id, a, b): the INTERVAL UNION of a (doc_id, span_start,
    span_end) frame — overlapping/adjacent-overlap islands merged with
    the classic running-max-of-ends fold (a new merged group starts
    when a span's start clears every previous end).  Shared by the
    removal ACCOUNTING (:func:`span_removal_by_source`) and the
    removal APPLY (:func:`apply_span_removal`) so the two can never
    disagree on what token range "the remove action" covers.  The
    merge window is per-document over the spans frame — candidate
    scale, bounded by spans-per-doc."""
    w = (
        Window.partitionBy("doc_id")
        .orderBy("span_start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        spans.withColumn("prev_max_end", F.max("span_end").over(w))
        .withColumn(
            "new_grp",
            F.when(
                F.col("prev_max_end").isNull()
                | (F.col("span_start") > F.col("prev_max_end")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "grp",
            F.sum("new_grp").over(
                Window.partitionBy("doc_id")
                .orderBy("span_start")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("doc_id", "grp")
        .agg(
            F.min("span_start").cast("bigint").alias("a"),
            F.max("span_end").cast("bigint").alias("b"),
        )
        .select("doc_id", "a", "b")
    )


def apply_span_removal(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_span_tokens: int = 50,
) -> DataFrame:
    """(doc_id, n_tokens, kept_tokens, removed_tokens, clean_text):
    the exact-substring remove action APPLIED — Lee et al. 2022 §3's
    deduplicated corpus, re-emitted.  :func:`exact_substring_spans`
    finds the ≥ min_span_tokens duplicated token ranges,
    :func:`merge_spans` unions overlaps, and every token whose
    0-based position falls inside a merged [a, b) interval is excised;
    the survivors are re-joined into ``clean_text`` (the frame a
    downstream packing / LM-training stage consumes — the ExactSubstr
    analogue of :func:`decontaminate_train`).

    Scale shape: spans are candidate scale (docs holding a duplicated
    run), so the per-doc interval array is tiny and the docs↔intervals
    equi-join broadcasts at corpus scale; the excision itself is ONE
    row-local higher-order-function pass (filter over (token, pos)
    pairs against the bounded interval array) — no extra shuffle, no
    per-token explode.  Docs with no span pass through verbatim
    (kept_tokens = n_tokens); a fully-covered doc survives as an
    empty string, the paper's remove-don't-drop semantics (dropping
    whole documents would discard the unique prefix/suffix text)."""
    spans = exact_substring_spans(documents, text_col, n, min_span_tokens)
    return excise_spans(documents, spans, text_col)


def excise_spans(
    documents: DataFrame, spans: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_tokens, kept_tokens, removed_tokens, clean_text):
    the generic token-range excision — any (doc_id, span_start,
    span_end) frame goes through the SHARED :func:`merge_spans`
    interval union and a row-local higher-order filter over
    (token, pos) pairs.  Factored out of :func:`apply_span_removal`
    so the train-internal dedup apply and the eval-decontamination
    apply (:func:`decontaminate_train_spans`) provably excise the
    same way.  Docs absent from ``spans`` pass through verbatim."""
    iv = (
        merge_spans(spans)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("a", "b")).alias("iv"))
    )
    toks = tokenize(text_col)
    docs = spread(documents).select("doc_id", toks.alias("toks"))
    # coalesce to an EMPTY interval array: a NULL iv (doc never
    # flagged) would make exists() NULL and the filter lambda would
    # silently drop every token of every clean document
    empty = F.array().cast("array<struct<a:bigint,b:bigint>>")
    ivc = F.coalesce(F.col("iv"), empty)
    kept = F.filter(
        F.transform(
            F.col("toks"),
            lambda t, i: F.struct(t.alias("t"), i.cast("bigint").alias("i")),
        ),
        lambda s: ~F.exists(
            ivc, lambda sp: (s["i"] >= sp["a"]) & (s["i"] < sp["b"])
        ),
    )
    return (
        docs.join(iv, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_tokens"),
            kept.alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("kept").cast("bigint").alias("kept_tokens"),
            (F.col("n_tokens") - F.size("kept"))
            .cast("bigint")
            .alias("removed_tokens"),
            F.array_join(
                F.transform(F.col("kept"), lambda s: s["t"]), " "
            ).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def span_removal_packing_bound(
    documents: DataFrame,
    text_col: str = "text",
    budgets: tuple[int, ...] = (128, 256, 512, 1024),
    n: int = 5,
    min_span_tokens: int = 50,
    group_col: str = "source",
) -> DataFrame:
    """(budget, total_tokens, n_bins, lb_bins, extra_bins,
    efficiency_fp): the packing budget ladder over the SPAN-CLEANED
    corpus — :func:`apply_span_removal`'s survivors priced by the same
    oracle-expressible bound as the raw corpus
    (sampling.packing_bfd_bound), completing VERDICT r9 item 4's
    "feed the cleaned corpus downstream": dedup is done FOR training,
    and the number a curator actually wants after enabling span
    removal is how many training bins the cleaned corpus packs into.
    total_tokens here vs packing_bfd_bound's raw total IS the
    removal's packing dividend, rung by rung.

    Shape: the apply's candidate-scale join + row-local excision, then
    ONE fold to #groups kept-token totals and the |budgets|-row
    metadata ladder (packing_bound_ladder, shared arithmetic)."""
    from lab3_spark.operators.sampling import packing_bound_ladder

    cleaned = apply_span_removal(
        documents, text_col, n, min_span_tokens
    ).select("doc_id", "kept_tokens")
    per_group = (
        spread(documents)
        .select("doc_id", F.col(group_col).alias("grp"))
        .join(cleaned, "doc_id")
        .groupBy("grp")
        .agg(F.sum("kept_tokens").cast("bigint").alias("toks"))
    )
    return packing_bound_ladder(per_group, budgets)


def decontaminate_train_spans(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_span_tokens: int = 13,
    salt: str = "split",
) -> DataFrame:
    """(doc_id, n_tokens, kept_tokens, removed_tokens, clean_text):
    SURGICAL eval-decontamination — for every TRAIN-split document,
    excise the maximal token spans whose every positional n-gram
    appears anywhere in the held-out splits, and re-emit the cleaned
    text.  This is the "≥13-token verbatim overlap" decontamination
    rule applied as span REMOVAL instead of :func:`decontaminate_train`'s
    whole-document drop: the drop forfeits every clean token of a
    contaminated doc, the excision keeps them — the Lee et al. 2022
    remove-span action pointed at test-vs-train instead of
    train-vs-train.

    Shape: the held-out gram table is a DISTINCT n-gram set
    (eval-corpus scale — small by construction, broadcastable exactly
    like benchmark_decontamination's eval table); train positional
    grams semi-join it (ONE membership probe, never all-pairs), chain
    through the shared gaps-and-islands fold (:func:`spans_from_hits`),
    and the excision is the shared :func:`excise_spans` path.  Splits
    are the engine's salted 90/5/5 manifest (the decontaminate_train /
    dataset_split_manifest convention), so the two decontamination
    actions agree on what "train" and "held-out" mean."""
    from lab3_spark.functions.text import md5_long
    from lab3_spark.operators.textstats import _word_ngrams

    h = md5_long(F.col("doc_id").cast("string"), salt=salt) % 100
    is_train = h < 90
    train = spread(documents).where(is_train)
    held = spread(documents).where(~is_train)
    ev_grams = (
        held.select(
            F.explode(_word_ngrams(tokenize(text_col), n)).alias("gram")
        )
        .distinct()
    )
    train_grams = train.select(
        "doc_id",
        F.posexplode(_word_ngrams(tokenize(text_col), n)).alias(
            "pos", "gram"
        ),
    )
    hits = train_grams.join(ev_grams, "gram", "left_semi").select(
        "doc_id", "pos"
    )
    spans = spans_from_hits(hits, n, min_span_tokens)
    return excise_spans(train, spans, text_col)


def edit_distance_value_pairs(
    values: DataFrame, col: str, d: int = 2
) -> DataFrame:
    """(val_a, val_b, edit_dist): every UNORDERED pair of distinct
    strings within edit distance ``d``, via PassJoin segment filtering
    (Li, Deng, Feng 2011, "PASS-JOIN: a partition-based method for
    similarity joins" — the published equi-join-shaped exact
    edit-distance join).  This is the scale path the type-level
    crossJoin in fuzzy_part_names documents: its |V|² compare is right
    while the value vocabulary broadcasts; PassJoin is LINEAR in |V|.

    Pigeonhole: partition each indexed string x into d+1 disjoint
    segments — d edits cannot touch them all, and the untouched
    segment survives VERBATIM in any y with ed(x, y) ≤ d, at a
    position shifted by at most d (the net indel count to its left).
    So candidates are an EQUI-JOIN: the indexed side emits its d+1
    (length, segment_index, segment) keys; the probe side emits, for
    every indexed length l ∈ [|y|−d, |y|] and every segment slot, the
    |y|-substrings of that slot's length within the ±d position
    window (≤ (d+1)²·(2d+1) keys per value — constant).  Matches
    dedupe to unordered pairs and verify with THRESHOLD levenshtein
    (banded O(d·n)); no |V|² anywhere.

    Strings shorter than d+1 characters cannot be segmented; they (and
    their feasible ≤ 2d+1-char partners) route through a bounded
    short-string block — a vocabulary-of-tiny-strings compare, not a
    data-scale one.  Self-pairs are excluded (a caller wanting the
    reflexive dist-0 rows unions them trivially).  Exactness is
    property-tested against a brute-force DP over random strings
    including empties (tests/test_round9_batch1.py)."""
    n = d + 1
    v = values.select(F.col(col).alias("v")).where(
        F.col("v").isNotNull()
    ).distinct()
    lv = F.length("v")

    # ---- segmented path: indexed strings of length >= d+1 ----------
    # even partition: base-length segments first, the l % n trailing
    # segments one char longer; start_i = i*base + max(0, i-(n-rem))
    def seg_len(l, i):
        return F.floor(l / n) + F.when(
            F.lit(i) >= n - (l % n), 1
        ).otherwise(0)

    def seg_start(l, i):
        return (F.lit(i) * F.floor(l / n)) + F.greatest(
            F.lit(0), F.lit(i) - (n - (l % n))
        )

    idx = None
    for i in range(n):
        part_i = v.where(lv >= n).select(
            F.col("v").alias("x"),
            lv.cast("bigint").alias("l"),
            F.lit(i).alias("i"),
            F.substring(
                F.col("v"),
                (seg_start(lv, i) + 1).cast("int"),
                seg_len(lv, i).cast("int"),
            ).alias("seg"),
        )
        idx = part_i if idx is None else idx.unionAll(part_i)

    # probe side: for each candidate indexed length lp in
    # [max(n, |y|-d), |y|], each slot i, positions within +-d of the
    # slot's start (always a nonempty window: |y| >= lp >= s_i+len_i)
    probes = v.select(
        "v",
        F.explode(
            F.when(
                lv >= n,
                F.flatten(
                    F.transform(
                        F.sequence(F.greatest(lv - d, F.lit(n)), lv),
                        lambda lp: F.flatten(
                            F.array(
                                *[
                                    F.transform(
                                        F.sequence(
                                            F.greatest(
                                                seg_start(lp, i) - d,
                                                F.lit(0),
                                            ),
                                            F.least(
                                                lv - seg_len(lp, i),
                                                seg_start(lp, i) + d,
                                            ),
                                        ),
                                        lambda p: F.struct(
                                            lp.alias("l"),
                                            F.lit(i).alias("i"),
                                            F.substring(
                                                F.col("v"),
                                                (p + 1).cast("int"),
                                                seg_len(lp, i).cast(
                                                    "int"
                                                ),
                                            ).alias("seg"),
                                        ),
                                    )
                                    for i in range(n)
                                ]
                            )
                        ),
                    )
                ),
            ).otherwise(
                F.array().cast(
                    "array<struct<l:bigint,i:int,seg:string>>"
                )
            )
        ).alias("pr"),
    ).select(F.col("v").alias("y"), "pr.l", "pr.i", "pr.seg")

    seg_cands = (
        idx.join(probes, ["l", "i", "seg"])
        .where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("val_a"),
            F.greatest("x", "y").alias("val_b"),
        )
    )

    # ---- short-string block: one side shorter than d+1 -------------
    xs = v.where(lv < n).select(F.col("v").alias("x"))
    ys = v.where(lv <= 2 * d + 1).select(F.col("v").alias("y"))
    short_cands = (
        xs.crossJoin(F.broadcast(ys))
        .where(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("val_a"),
            F.greatest("x", "y").alias("val_b"),
        )
    )

    banded = F.levenshtein(F.col("val_a"), F.col("val_b"), d)
    return (
        seg_cands.unionAll(short_cands)
        .distinct()
        .where(banded >= 0)
        .select("val_a", "val_b", banded.alias("edit_dist"))
        .orderBy("val_a", "val_b")
    )


def span_removal_by_source(
    documents: DataFrame,
    text_col: str = "text",
    n: int = 5,
    min_span_tokens: int = 50,
    group_col: str = "source",
) -> DataFrame:
    """(source, n_docs, n_flagged, total_tokens, removed_tokens,
    removed_frac_fp): what the :func:`exact_substring_spans` remove
    action actually DELETES, per source — the headline accounting of
    Lee et al. 2022 ("what fraction of the corpus is verbatim
    duplicate text?"), the number a curator reads before enabling
    span removal.

    Two islands of duplicated grams can OVERLAP in token space when
    their gram-position gap is smaller than n (island i covers tokens
    [p_i, q_i + n), the next starts at gram q_i + 2), so summing
    span_tokens double-counts: removed_tokens is the measure of the
    INTERVAL UNION, merged per document with the classic
    running-max-of-ends fold (a new merged group starts when a span's
    start clears every previous end).  The merge window is
    per-document over the spans frame — candidate scale (documents
    with a ≥ min_span duplicated run), bounded by doc length.
    removed_frac_fp = removed·10⁶ DIV total, exact bigint."""
    spans = exact_substring_spans(documents, text_col, n, min_span_tokens)
    merged = (
        merge_spans(spans)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("b") - F.col("a")).cast("bigint").alias("removed")
        )
    )
    per_doc = spread(documents).select(
        "doc_id",
        F.col(group_col).alias("source"),
        F.size(tokenize(text_col)).cast("bigint").alias("nt"),
    )
    return (
        per_doc.join(merged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("removed").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_flagged"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
            F.coalesce(F.sum("removed"), F.lit(0))
            .cast("bigint")
            .alias("removed_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_flagged",
            "total_tokens",
            "removed_tokens",
            F.expr(
                "CASE WHEN total_tokens > 0 THEN CAST(removed_tokens"
                " * 1000000 DIV total_tokens AS BIGINT)"
                " ELSE NULL END"
            ).alias("removed_frac_fp"),
        )
        .orderBy("source")
    )


def _doc_shingles(
    documents: DataFrame,
    text_col: str,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*key_cols, shingle): DISTINCT word n-grams per unit (units with
    < SHINGLE_N tokens are excluded — no shingle exists)."""
    # repartition first: shingling + salting + md5 are the CPU hot
    # path and the testdata parquet is a single row group (one scan
    # task).  At cluster scale input splits already provide the
    # parallelism; the tiny exchange is noise next to the hash work.
    toks = tokenize(text_col)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (SHINGLE_N - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, SHINGLE_N)),
    )
    return (
        spread(documents)
        .where(F.size(toks) >= SHINGLE_N)
        .select(
            *key_cols, F.explode(F.array_distinct(grams)).alias("shingle")
        )
    )


def minhash_signatures(
    documents: DataFrame,
    text_col: str = "text",
    shingles: DataFrame | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*key_cols, sig array<string>): N_HASHES lexicographic-min md5
    minhashes, one per salt.  min(md5(salt|shingle)) over a uniformly
    hashed shingle set is a valid permutation-min — and portable, so
    the DuckDB oracle computes the identical signature.

    `shingles` lets callers share one (ideally persisted) shingle
    DataFrame across pipeline stages instead of re-tokenizing the
    corpus per stage.  `key_cols` generalizes the signature unit from
    documents to any finer grain — (doc_id, para_idx) gives the
    paragraph-level dedup of the RefinedWeb/Dolma recipe — without
    touching the doc-level callers (default unchanged)."""
    keys = list(key_cols)
    sh = (
        shingles
        if shingles is not None
        else _doc_shingles(documents, text_col, key_cols=key_cols)
    )
    salted = sh.select(
        *keys,
        F.explode(F.sequence(F.lit(0), F.lit(N_HASHES - 1))).alias("salt"),
        "shingle",
    )
    mh = salted.groupBy(*keys, "salt").agg(
        F.min(
            F.md5(F.concat(F.col("salt").cast("string"), F.lit("|"), F.col("shingle")))
        ).alias("mh")
    )
    return mh.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("salt", "mh"))), lambda s: s["mh"]
        ).alias("sig")
    )


def minhash_candidates(
    documents: DataFrame,
    text_col: str = "text",
    max_bucket: int | None = None,
    shingles: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, n_bands): candidate near-dup pairs = docs sharing
    ≥1 LSH band bucket; n_bands = how many buckets they share.

    The equi-join on (band, band_key) is the scale trick: no all-pairs
    comparison ever happens.  ``max_bucket`` is the degenerate-bucket
    guard: a bucket of B near-identical docs still yields B²/2 pairs,
    so buckets larger than the cap are dropped (at 100 TB such buckets
    are handled separately — usually by exact-dedup first, which
    collapses identical docs before LSH runs).

    Warm path: result-memoized on the input frame when ``shingles``
    is not caller-supplied — six gates (lsh, jaccard, containment,
    clusters, representatives, agreement) call this; the ~0.5 s of
    per-call signature-expression construction is pure overhead after
    the first."""
    if shingles is None:
        from lab3_spark.functions.partitioning import memo_result

        return memo_result(
            f"dedup.minhash_cand.{text_col}.b{max_bucket}",
            documents,
            lambda: _minhash_candidates_build(
                documents, text_col, max_bucket, None
            ),
        )
    return _minhash_candidates_build(documents, text_col, max_bucket, shingles)


def minhash_band_keys(
    documents: DataFrame,
    text_col: str = "text",
    shingles: DataFrame | None = None,
    key_cols: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """(*key_cols, band, band_key): each unit's LSH band bucket keys —
    the unit of blocking shared by batch candidate generation
    (`minhash_candidates`), the streaming near-dup flagging store
    (`streaming/lsh_flag.py`), and the paragraph-grain dedup
    (`paragraph_minhash_duplicates`, key_cols=(doc_id, para_idx))."""
    keys = list(key_cols)
    sig = minhash_signatures(
        documents, text_col, shingles=shingles, key_cols=key_cols
    )
    return sig.select(
        *keys,
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band"),
        "sig",
    ).select(
        *keys,
        "band",
        F.md5(
            F.concat_ws(
                ",", F.slice("sig", F.col("band") * ROWS_PER_BAND + 1, ROWS_PER_BAND)
            )
        ).alias("band_key"),
    )


def _minhash_candidates_build(
    documents: DataFrame,
    text_col: str,
    max_bucket: int | None,
    shingles: DataFrame | None,
) -> DataFrame:
    bands = minhash_band_keys(documents, text_col, shingles)
    if max_bucket is not None:
        sizes = bands.groupBy("band", "band_key").agg(
            F.count("*").alias("_bucket_n")
        )
        bands = bands.join(
            sizes.where(F.col("_bucket_n") <= max_bucket).drop("_bucket_n"),
            ["band", "band_key"],
        )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands"))
        .orderBy("doc_a", "doc_b")
    )


def paragraph_frame(
    documents: DataFrame,
    text_col: str = "text",
    delimiter: str | None = None,
    block_tokens: int | None = None,
) -> DataFrame:
    """(doc_id, para_idx, para_text): sub-document units for
    paragraph-grain dedup.  ``delimiter`` (a regex, e.g. ``'\\n+'``)
    is the real-corpus path — the RefinedWeb/Dolma curation standard
    splits on newlines; ``block_tokens`` cuts the token stream into
    fixed-size blocks instead — the stand-in grain for corpora
    WITHOUT newline structure (the synthetic testdata has none; the
    planted-boilerplate tests exercise the delimiter path).  Exactly
    one must be given.  para_idx is the 0-based ORIGINAL position
    (post-drop renumbering would misalign against the source doc);
    empty/whitespace-only paragraphs are dropped.  Pure in-row
    explode — no shuffle."""
    if (delimiter is None) == (block_tokens is None):
        raise ValueError("give exactly one of delimiter / block_tokens")
    base = spread(documents)
    if delimiter is not None:
        return (
            base.select(
                "doc_id",
                F.posexplode(F.split(F.col(text_col), delimiter)).alias(
                    "para_idx", "para_text"
                ),
            )
            .where(F.length(F.trim("para_text")) > 0)
            .select(
                "doc_id",
                F.col("para_idx").cast("bigint").alias("para_idx"),
                "para_text",
            )
        )
    toks = tokenize(text_col)
    nblocks = F.ceil(F.size(toks) / F.lit(block_tokens))
    return (
        base.where(F.size(toks) > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), (nblocks - 1).cast("int")),
                    lambda b: F.concat_ws(
                        " ", F.slice(toks, b * block_tokens + 1, block_tokens)
                    ),
                )
            ).alias("para_idx", "para_text"),
        )
        .select(
            "doc_id",
            F.col("para_idx").cast("bigint").alias("para_idx"),
            "para_text",
        )
    )


def paragraph_minhash_duplicates(
    documents: DataFrame,
    text_col: str = "text",
    delimiter: str | None = None,
    block_tokens: int | None = None,
    max_bucket: int | None = 64,
) -> DataFrame:
    """(doc_a, para_a, doc_b, para_b, n_bands): near-duplicate
    PARAGRAPH pairs via banded MinHash-LSH at (doc_id, para_idx)
    grain — the below-document boilerplate-removal pass of the
    RefinedWeb/Dolma curation standard (repeated headers, footers,
    navigation blocks that document-level MinHash cannot see because
    the surrounding text differs).

    Reuses the document-level LSH machinery VERBATIM
    (minhash_band_keys with key_cols=(doc_id, para_idx)): same
    shingling, same salted-md5 permutation-min, same band hashing —
    so candidate generation stays a banded EQUI-join on
    (band, band_key), never all-pairs, with the same ``max_bucket``
    degenerate-bucket guard.  Within-document pairs are kept (a doc
    repeating its own boilerplate is dedup-worthy); the pair order is
    lexicographic on (doc_id, para_idx).  Paragraphs shorter than
    SHINGLE_N tokens have no shingle and drop out, exactly as
    sub-shingle documents do at doc grain.

    Warm path: result-memoized on the input frame (the
    minhash_candidates pattern) — the pair gate and the APPLY capstone
    (:func:`apply_paragraph_dedup`) share one candidate computation."""
    from lab3_spark.functions.partitioning import memo_result

    return memo_result(
        f"dedup.para_minhash.{text_col}.{delimiter!r}.{block_tokens}"
        f".b{max_bucket}",
        documents,
        lambda: _paragraph_minhash_build(
            documents, text_col, delimiter, block_tokens, max_bucket
        ),
    )


def _paragraph_minhash_build(
    documents: DataFrame,
    text_col: str,
    delimiter: str | None,
    block_tokens: int | None,
    max_bucket: int | None,
) -> DataFrame:
    from lab3_spark.functions.partitioning import memo_persist

    paras = paragraph_frame(
        documents, text_col, delimiter=delimiter, block_tokens=block_tokens
    )
    # persisted: the bucket-size guard and BOTH self-join sides read
    # this frame, and unlike the doc-level build no ReusedExchange
    # materializes here (measured: 0 in the physical plan) — so the
    # whole shingle→60-salt-minhash→band pipeline ran three times per
    # action (optimization round 12, guide §5; bounded registry)
    bands = memo_persist(
        f"dedup.para_bands.{text_col}.{delimiter!r}.{block_tokens}",
        minhash_band_keys(
            paras, "para_text", key_cols=("doc_id", "para_idx")
        ),
    )
    if max_bucket is not None:
        sizes = bands.groupBy("band", "band_key").agg(
            F.count("*").alias("_bucket_n")
        )
        bands = bands.join(
            sizes.where(F.col("_bucket_n") <= max_bucket).drop("_bucket_n"),
            ["band", "band_key"],
        )
    a, b = bands.alias("a"), bands.alias("b")
    lt = (F.col("a.doc_id") < F.col("b.doc_id")) | (
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.para_idx") < F.col("b.para_idx"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & lt,
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.para_idx").alias("para_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.para_idx").alias("para_b"),
        )
        .agg(F.count("*").alias("n_bands"))
        .orderBy("doc_a", "para_a", "doc_b", "para_b")
    )


def apply_paragraph_dedup(
    documents: DataFrame,
    text_col: str = "text",
    delimiter: str | None = None,
    block_tokens: int | None = None,
    min_bands: int = N_BANDS,
    max_bucket: int | None = 64,
    joiner: str | None = None,
) -> DataFrame:
    """(doc_id, n_paras, kept_paras, removed_paras, clean_text): the
    paragraph near-dup removal ACTION — Dolma/RefinedWeb's boilerplate
    pass applied, completing the paragraph family exactly as
    :func:`apply_span_removal` completes the span family.

    Keep-first semantics on the candidate PAIR list: a paragraph is
    removed iff it has a near-dup partner (≥ ``min_bands`` shared LSH
    bands — default ALL bands, the near-certain tier) at a
    lexicographically SMALLER (doc_id, para_idx).  This is the
    LSH-practice rule (every bucket member but the earliest drops)
    stated on pairs, so it is deterministic and SQL-expressible;
    transitive chains (A~B~C without A~C) remove both B and C — the
    aggressive reading, right for boilerplate.  Survivors are
    re-joined in original paragraph order ('\\n' on the delimiter
    path, ' ' on the block path — the delimiter regex is not
    invertible, documented).  Docs never flagged pass through; a doc
    whose every paragraph was removed survives as an empty string
    (remove-not-drop, the span-apply contract).

    Scale shape: one extra anti-join of the paragraph frame against
    the DISTINCT removed-unit list (candidate scale, broadcastable)
    + one per-doc collect_list bounded by paragraphs-per-doc — the
    per-entity aggregation class; everything upstream is the banded
    equi-join of :func:`paragraph_minhash_duplicates`."""
    paras = paragraph_frame(
        documents, text_col, delimiter=delimiter, block_tokens=block_tokens
    )
    pairs = paragraph_minhash_duplicates(
        documents,
        text_col,
        delimiter=delimiter,
        block_tokens=block_tokens,
        max_bucket=max_bucket,
    )
    removed = (
        pairs.where(F.col("n_bands") >= min_bands)
        .select(
            F.col("doc_b").alias("doc_id"),
            F.col("para_b").alias("para_idx"),
        )
        .distinct()
    )
    # ADVICE r11: ``delimiter`` is a REGEX (not invertible into a join
    # string), so survivors re-join with the explicit ``joiner`` —
    # default '\n' for the delimiter path (the newline-corpus
    # convention this always had), ' ' for block_tokens.  Callers
    # splitting on a custom pattern pass the matching joiner.
    if joiner is None:
        joiner = "\n" if delimiter is not None else " "
    kept = paras.join(removed, ["doc_id", "para_idx"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_paras"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("para_idx", "para_text"))
                ),
                lambda s: s["para_text"],
            ),
            joiner,
        ).alias("clean_text"),
    )
    tot = paras.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_paras")
    )
    return (
        documents.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_paras", F.lit(0)).cast("bigint").alias("n_paras"),
            F.coalesce("kept_paras", F.lit(0))
            .cast("bigint")
            .alias("kept_paras"),
            (
                F.coalesce("n_paras", F.lit(0))
                - F.coalesce("kept_paras", F.lit(0))
            )
            .cast("bigint")
            .alias("removed_paras"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
        .orderBy("doc_id")
    )


def ngram_jaccard_pairs(
    documents: DataFrame,
    text_col: str = "text",
    min_jaccard: float = 0.2,
    keep_counts: bool = False,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): EXACT shingle-set Jaccard, evaluated
    only on MinHash-LSH candidate pairs (verify step of the classic
    dedup pipeline: cheap candidate generation → exact verification).

    The shingle DataFrame — the expensive tokenize→slice→md5 scan — is
    computed ONCE and persisted, then shared by candidate generation
    and all three verify-side uses (sizes, sh_a, sh_b).  Without the
    persist the DAG re-tokenizes the corpus ~4×; this was the slowest
    query of round 1 (10.1 s → the shared-scan form).  Cached via
    ``memo_persist`` so repeated catalog runs in one session hold at
    most one shingle frame (CacheManager entries are never GC'd)."""
    from lab3_spark.functions.partitioning import memo_persist

    sh = memo_persist(
        "dedup.ngram_jaccard.shingles", _doc_shingles(documents, text_col)
    )
    cands = minhash_candidates(
        documents, text_col, shingles=sh
    ).select("doc_a", "doc_b")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(
        F.col("doc_id").alias("doc_b_"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        cands.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b_"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    cols = ["doc_a", "doc_b", trunc(jac, 4).alias("jaccard")]
    if keep_counts:
        # exact integer set sizes, for consumers that derive ratios in
        # bigint arithmetic instead of re-dividing the truncated double
        cols += [
            F.col("n_inter").cast("bigint").alias("n_inter"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
        ]
    # the VERIFIED pair list itself is memoized (keyed by params, one
    # entry each): four catalog consumers share the default-threshold
    # list (near-dup view, cross-source linkage, split-leakage audit,
    # train decontamination) — without this each re-runs the whole
    # candidate→verify stage.  Memo sits BEFORE the orderBy so
    # consumers that join/regroup don't inherit a wasted sort.
    pairs = memo_persist(
        f"dedup.ngram_jaccard.pairs.{min_jaccard}.{int(keep_counts)}",
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(*cols)
        .where(F.col("jaccard") >= min_jaccard),
    )
    return pairs.orderBy("doc_a", "doc_b")


def cross_source_near_dups(
    documents: DataFrame,
    text_col: str = "text",
    label_col: str = "source",
    min_jaccard: float = 0.2,
) -> DataFrame:
    """(doc_a, doc_b, source_a, source_b, jaccard): verified near-dup
    pairs whose two sides come from DIFFERENT sources — the record-
    linkage / cross-crawl-contamination view of the dedup pipeline
    (the same page scraped by two crawls, a benchmark leaking into a
    web dump).  Within-source duplicates are the exact-dedup stage's
    job; what a mixture designer needs is the BETWEEN-source overlap.

    Reuses the whole candidate→verify machinery (banded MinHash LSH →
    exact shingle Jaccard on candidates only) and joins the two tiny
    (doc_id, source) projections afterward — the label join is on the
    verified pair list (candidate-scale), never the corpus pair space."""
    pairs = ngram_jaccard_pairs(documents, text_col, min_jaccard)
    labels = documents.select("doc_id", F.col(label_col))
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col(label_col).alias("source_a")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col(label_col).alias("source_b")
    )
    return (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .where(F.col("source_a") != F.col("source_b"))
        .select("doc_a", "doc_b", "source_a", "source_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


#: Fellegi–Sunter log2 likelihood-ratio weights, fixed-pointed ·1e6 —
#: ONE shared template renders the Spark expression AND the DuckDB
#: oracle text so the single float step (ln of a ratio of exact-integer
#: ratios, the unigram-surprisal contract) is character-identical in
#: both engines.  Laplace smoothing (+1/+2) keeps both weights finite
#: when every (or no) verified pair agrees on a field.
FS_W_AGREE_TMPL = (
    "CAST(floor(ln(((CAST({mn} AS DOUBLE) + 1.0) / (CAST({md} AS DOUBLE)"
    " + 2.0)) / ((CAST({un} AS DOUBLE) + 1.0) / (CAST({ud} AS DOUBLE)"
    " + 2.0))) / ln(2.0) * 1000000) AS BIGINT)"
)
FS_W_DISAGREE_TMPL = (
    "CAST(floor(ln((1.0 - (CAST({mn} AS DOUBLE) + 1.0) / (CAST({md} AS"
    " DOUBLE) + 2.0)) / (1.0 - (CAST({un} AS DOUBLE) + 1.0) /"
    " (CAST({ud} AS DOUBLE) + 2.0))) / ln(2.0) * 1000000) AS BIGINT)"
)
FS_FIELDS = ("source", "lang", "lenb")


def fellegi_sunter_scores(
    documents: DataFrame,
    text_col: str = "text",
    truth_jaccard: float = 0.5,
    topk: int = 20,
) -> DataFrame:
    """Probabilistic record-linkage scoring (Fellegi & Sunter 1969,
    the Splink/production-linkage core): every LSH candidate pair is
    scored by the summed log2 likelihood ratio of its per-field
    agreement pattern — agree on field f adds log2(m_f/u_f), disagree
    adds log2((1−m_f)/(1−u_f)) — and the top-``topk`` pairs surface
    as (doc_a, doc_b, n_agree, score_fp, rnk).

    Comparison fields: ``source`` equality, ``lang`` equality, and a
    64-char length-bucket equality (``n_chars DIV 64``) — cheap exact
    comparators, the blocking-safe subset of a linkage config.

    Parameter estimation is deterministic, no EM and no sampling:

    - m_f (P(agree | match)) from the engine's own verified near-dup
      truth — the candidate→verify machinery's exact-Jaccard pairs at
      ≥ ``truth_jaccard`` (one combinable count over a candidate-scale
      frame);
    - u_f (P(agree | non-match)) from the field's value marginals
      under the random-pairing model: u = (Σ_v c_v² − N)/(N² − N) —
      ordered pairs sharing a value, self-pairs excluded.  A per-field
      value histogram, never a pair enumeration; counts are carried as
      decimal(38,0) (HUGEINT in the oracle) so N² stays exact past
      int64 at 100 TB corpus sizes.

    Both weights per field come from :data:`FS_W_AGREE_TMPL` /
    :data:`FS_W_DISAGREE_TMPL` — one ln per field per weight (six
    float values total, each immediately floor-fixed ·1e6, the
    unigram-surprisal cross-engine contract); pair scores are then
    exact bigint sums.  Scale shape: candidates come from banded LSH
    (never the pair space), the stats/weights row is a broadcast
    1-row crossJoin, scoring is one narrow candidate-scale pass, and
    the top-k is TakeOrderedAndProject."""
    from lab3_spark.functions.partitioning import one_window_partition
    from pyspark.sql.window import Window

    cand = minhash_candidates(documents, text_col).select("doc_a", "doc_b")
    truth = (
        ngram_jaccard_pairs(documents, text_col)
        .where(F.col("jaccard") >= truth_jaccard)
        .select("doc_a", "doc_b")
    )
    lab = documents.select(
        "doc_id",
        "source",
        "lang",
        F.expr("n_chars DIV 64").alias("lenb"),
    )
    la = lab.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f).alias(f"{f}_a") for f in FS_FIELDS],
    )
    lb = lab.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f).alias(f"{f}_b") for f in FS_FIELDS],
    )

    def _agrees(pairs: DataFrame) -> DataFrame:
        d = pairs.join(la, "doc_a").join(lb, "doc_b")
        return d.select(
            "doc_a",
            "doc_b",
            *[
                F.when(F.col(f"{f}_a") == F.col(f"{f}_b"), 1)
                .otherwise(0)
                .cast("bigint")
                .alias(f"ag_{f}")
                for f in FS_FIELDS
            ],
        )

    m = _agrees(truth).agg(
        F.count("*").alias("m_den"),
        *[
            F.coalesce(F.sum(f"ag_{f}"), F.lit(0)).alias(f"m_{f}")
            for f in FS_FIELDS
        ],
    )
    nn = lab.agg(F.count("*").cast("decimal(38,0)").alias("n"))
    stats = m.crossJoin(F.broadcast(nn))
    for f in FS_FIELDS:
        s2 = (
            lab.groupBy(f)
            .agg(F.count("*").alias("c"))
            .agg(
                F.sum(
                    F.col("c").cast("decimal(38,0)") * F.col("c")
                ).alias(f"s2_{f}")
            )
        )
        stats = stats.crossJoin(F.broadcast(s2))
    stats = stats.select(
        "*",
        *[
            (F.col(f"s2_{f}") - F.col("n")).alias(f"un_{f}")
            for f in FS_FIELDS
        ],
        (F.col("n") * F.col("n") - F.col("n")).alias("ud"),
    )
    weights = stats.select(
        *[
            F.expr(
                FS_W_AGREE_TMPL.format(
                    mn=f"m_{f}", md="m_den", un=f"un_{f}", ud="ud"
                )
            ).alias(f"wa_{f}")
            for f in FS_FIELDS
        ],
        *[
            F.expr(
                FS_W_DISAGREE_TMPL.format(
                    mn=f"m_{f}", md="m_den", un=f"un_{f}", ud="ud"
                )
            ).alias(f"wd_{f}")
            for f in FS_FIELDS
        ],
    )
    scored = _agrees(cand).crossJoin(F.broadcast(weights)).select(
        "doc_a",
        "doc_b",
        sum(
            (F.col(f"ag_{f}") for f in FS_FIELDS), F.lit(0).cast("bigint")
        ).alias("n_agree"),
        sum(
            (
                F.when(F.col(f"ag_{f}") == 1, F.col(f"wa_{f}")).otherwise(
                    F.col(f"wd_{f}")
                )
                for f in FS_FIELDS
            ),
            F.lit(0).cast("bigint"),
        ).alias("score_fp"),
    )
    top = scored.orderBy(
        F.desc("score_fp"), "doc_a", "doc_b"
    ).limit(int(topk))
    w = (
        Window.partitionBy(one_window_partition())
        .orderBy(F.desc("score_fp"), "doc_a", "doc_b")
    )
    return top.withColumn("rnk", F.row_number().over(w)).orderBy("rnk")


def split_leakage_neardup(
    documents: DataFrame,
    text_col: str = "text",
    salt: str = "split",
    min_jaccard: float = 0.2,
) -> DataFrame:
    """(split_a, split_b, n_pairs, n_docs): verified near-duplicate
    pairs bucketed by the train/val/test splits their two sides land
    in — the contamination audit a dataset release runs BEFORE
    publishing ("does any test document have a near-dup in train?").
    Any row with split_a != split_b is leakage the hash split cannot
    see on its own: the 90/5/5 assignment is doc-id-uniform, and
    near-duplicates carry different ids.

    Reuses the full candidate→verify machinery (banded MinHash LSH →
    exact shingle Jaccard on candidates only) and the sampling
    module's pure md5-expression split assignment; both label joins
    run on the VERIFIED pair list (candidate scale), never the corpus
    pair space.  (split_a, split_b) is the lexicographic unordered
    canonicalization; n_docs counts distinct documents involved per
    bucket (a doc near-dup'd across buckets counts once per bucket)."""
    from lab3_spark.functions.text import md5_long

    # id is pinned to doc_id: ngram_jaccard_pairs keys its pair list on
    # doc_id, so a configurable id_col would silently join pair ids
    # against a different column (ADVICE r8)
    pairs = ngram_jaccard_pairs(documents, text_col, min_jaccard)
    h = md5_long(F.col("doc_id").cast("string"), salt=salt) % 100
    split = F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    labels = documents.select(F.col("doc_id"), split.alias("split"))
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
    )
    lab = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
        )
    )
    n_docs = (
        lab.select(
            "split_a",
            "split_b",
            F.explode(F.array("doc_a", "doc_b")).alias("d"),
        )
        .groupBy("split_a", "split_b")
        .agg(F.countDistinct("d").alias("n_docs"))
    )
    return (
        lab.groupBy("split_a", "split_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .join(n_docs, ["split_a", "split_b"])
        .select(
            "split_a",
            "split_b",
            "n_pairs",
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )
        .orderBy("split_a", "split_b")
    )


def decontaminate_train(
    documents: DataFrame,
    text_col: str = "text",
    label_col: str = "source",
    salt: str = "split",
    min_jaccard: float = 0.2,
) -> DataFrame:
    """(doc_id, source): the DECONTAMINATED train split — train-split
    documents with NO verified near-duplicate in the held-out (val or
    test) splits.  The action paired with :func:`split_leakage_neardup`'s
    audit: the audit counts cross-split near-dup pairs; this operator
    removes the train-side member of every train↔held-out pair, so a
    model trained on the survivors cannot memorize a held-out document
    through its near-twin.

    The contaminated-id list is candidate-scale (one side of the
    verified pair list), so the removal is a LEFT ANTI join of the
    train slice against a small frame — broadcastable at any corpus
    size where the near-dup rate is sane.  Train-internal duplicates
    are the exact/minhash dedup stages' job, deliberately untouched
    here."""
    from lab3_spark.functions.text import md5_long

    # id pinned to doc_id — see split_leakage_neardup (ADVICE r8)
    pairs = ngram_jaccard_pairs(documents, text_col, min_jaccard)
    h = md5_long(F.col("doc_id").cast("string"), salt=salt) % 100
    split = F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    labels = documents.select(F.col("doc_id"), split.alias("split"))
    la = labels.select(
        F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
    )
    lb = labels.select(
        F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
    )
    sided = pairs.join(la, "doc_a").join(lb, "doc_b")
    contaminated = (
        sided.where((F.col("sa") == "train") & (F.col("sb") != "train"))
        .select(F.col("doc_a").alias("doc_id"))
        .unionAll(
            sided.where(
                (F.col("sb") == "train") & (F.col("sa") != "train")
            ).select(F.col("doc_b").alias("doc_id"))
        )
        .distinct()
    )
    return (
        documents.where(split == "train")
        .join(contaminated, "doc_id", "left_anti")
        .select("doc_id", label_col)
        .orderBy("doc_id")
    )


def pair_similarity_histogram(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(bucket_x10, n_pairs): histogram of EXACT shingle-Jaccard over
    ALL MinHash-LSH candidate pairs (no verify threshold) in 0.1-wide
    buckets — the threshold-tuning curve a dedup pipeline reads before
    fixing its verify cutoff ("how many pairs does 0.2 vs 0.5 keep?",
    "is the candidate set mostly false positives?").

    Runs the shared candidate→verify machinery once with the verify
    filter at 0 and folds the candidate-scale pair list into ≤11
    bucket rows: bucket_x10 = floor(jaccard·10) (1.0 lands in its own
    bucket 10); the bucket is EXACT bigint arithmetic over the integer
    set sizes ((10·n_inter) DIV union) — never a re-division of the
    truncated double, so no float-boundary flicker between engines."""
    jac = ngram_jaccard_pairs(
        documents, text_col, min_jaccard=0.0, keep_counts=True
    )
    bucket = F.expr(
        "CAST((10 * n_inter) DIV (n_a + n_b - n_inter) AS BIGINT)"
    )
    return (
        jac.select(bucket.alias("bucket_x10"))
        .groupBy("bucket_x10")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("bucket_x10")
    )


def _simhash_bitsum_partials(occurrences: DataFrame) -> DataFrame:
    """Per-Arrow-batch partial SimHash bit sums: (doc_id, s0..s59),
    one row per document PER BATCH (not per token occurrence).

    The kmeans `_iter_partials` recipe applied to SimHash: the ±1 bit
    contributions are unpacked and summed with vectorized numpy inside
    one ``mapInArrow`` pass, so the downstream 60-buffer hash aggregate
    runs over ~n_docs×n_batches rows instead of every token occurrence.
    Bit-identical to the expression form: integer ±1 sums are
    associative, so batch/partition boundaries can't change any total
    (pinned expr == arrow by tests, the test_similarity_impls.py
    pattern)."""
    import numpy as np
    import pyarrow as pa

    masks = np.int64(1) << np.arange(SIM_BITS, dtype=np.int64)
    names = ["doc_id"] + [f"s{b}" for b in range(SIM_BITS)]
    schema = ", ".join(f"{n} bigint" for n in names)

    def batches(it):
        for batch in it:
            doc = batch.column(0).to_numpy(zero_copy_only=False)
            h = batch.column(1).to_numpy(zero_copy_only=False)
            if doc.size == 0:
                continue
            # (n, 60) ±1 contribution matrix, then per-doc row sums
            contrib = (((h[:, None] & masks) != 0).astype(np.int64) << 1) - 1
            order = np.argsort(doc, kind="stable")
            uniq, starts = np.unique(doc[order], return_index=True)
            sums = np.add.reduceat(contrib[order], starts, axis=0)
            yield pa.RecordBatch.from_arrays(
                [pa.array(uniq, type=pa.int64())]
                + [pa.array(sums[:, b], type=pa.int64()) for b in range(SIM_BITS)],
                names=names,
            )

    return occurrences.mapInArrow(batches, schema)


def simhash_signatures(
    documents: DataFrame, text_col: str = "text", impl: str = "arrow"
) -> DataFrame:
    """(doc_id, sig): 60-bit SimHash over token counts.

    bit_i(sig) = 1 iff Σ_tokens cnt(t) * (2*bit_i(md5_60(t)) - 1) > 0.
    All integer arithmetic — bit-exact across engines AND across both
    ``impl`` paths (tests pin expr == arrow signature-for-signature).

    Plan shape: because the bit-sum is LINEAR in the token count,
    Σ_t cnt(t)·(2b_i(t)−1) ≡ Σ_occurrences (2b_i(tok)−1) — so no
    per-(doc, token) counting pass is needed at all.  Tokenization and
    the md5 fold stay JVM-side in BOTH impls (one tokenizer, no parity
    risk); they differ in where the 60 bit-sums are reduced:

    - ``impl="expr"``: ONE hash aggregate per doc with 60 codegen'd
      bigint sum buffers over every token occurrence (map-side partials
      combine before the shuffle).  No Python at all.
    - ``impl="arrow"`` (default): a ``mapInArrow`` pass folds each
      Arrow batch to per-doc partial sums first (numpy unpack+reduceat
      — one vectorized pass instead of 60 buffer updates per
      occurrence), then the same 60-buffer aggregate merges the
      per-batch partials.

    Measured (sf0.1, minima over interleaved trials): arrow 1.26 s vs
    expr 1.41 s, and the gap does NOT widen with 8× longer docs — the
    similarity.py LSH ladder (5× for arrow) does not transfer here,
    because LSH's expression path pays interpreted ``F.aggregate`` HOF
    lambdas per row while ``sum(when(bit))`` buffers are whole-stage
    codegen'd.  Arrow stays the default for its small consistent edge;
    the tokenize→md5 scan, shared by both, is the real floor.

    Round 1 exploded a further 60 rows per (doc, token) and shuffled
    twice — a 60× shuffle-volume amplifier at scale; both current forms
    shuffle at most one 60-column partial row per doc per partition."""
    occurrences = (
        spread(documents)  # single-row-group scan → spread CPU
        .select("doc_id", F.explode(tokenize(text_col)).alias("tok"))
        .withColumn("h", md5_long("tok"))
    )
    if impl == "arrow":
        bit_sums = (
            _simhash_bitsum_partials(occurrences.select("doc_id", "h"))
            .groupBy("doc_id")
            .agg(*[F.sum(f"s{bit}").alias(f"s{bit}") for bit in range(SIM_BITS)])
        )
    elif impl == "expr":
        one = F.lit(1).cast("bigint")
        bit_sums = occurrences.groupBy("doc_id").agg(
            *[
                F.sum(
                    F.when(
                        F.col("h").bitwiseAND(F.lit(1 << bit)) != 0, one
                    ).otherwise(-one)
                ).alias(f"s{bit}")
                for bit in range(SIM_BITS)
            ]
        )
    else:
        raise ValueError(f"unknown simhash impl: {impl!r}")
    sig = None
    for bit in range(SIM_BITS):
        term = F.when(
            F.col(f"s{bit}") > 0, F.lit(1 << bit).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        sig = term if sig is None else sig + term
    return bit_sums.select("doc_id", sig.alias("sig"))


def simhash_near_pairs(
    documents: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs with hamming(sig_a, sig_b) ≤ k.

    Complete for k ≤ SIM_CHUNKS-1 by pigeonhole: 4 equal-width chunks,
    ≤3 differing bits ⇒ at least one chunk identical — so the chunk
    equi-join finds every qualifying pair without an all-pairs scan.

    ``max_bucket`` is the same degenerate-bucket guard as
    ``minhash_candidates``: an adversarially skewed corpus (B docs
    sharing one 15-bit chunk value) makes that chunk bucket a B²/2
    hot join task; buckets above the cap are dropped (at 100 TB such
    masses are collapsed by exact dedup BEFORE near-dup runs).

    The signature frame is persisted (bounded, memo_persist) before
    the self-join: Spark plans the two join sides as independent
    subtrees (no ReusedExchange materializes here — measured r4), so
    without the persist the whole tokenize→md5→bit-sum scan runs
    TWICE.  The persisted frame is 16 bytes/doc — at 100 TB corpus
    scale the signature table is ~GBs, exactly what you'd checkpoint
    between dedup stages anyway.

    Result-memoized on the input frame (several gates call this; the
    Arrow-kernel + chunk-expression construction is the warm cost)."""
    from lab3_spark.functions.partitioning import memo_result

    return memo_result(
        f"dedup.simhash_pairs.{text_col}.h{max_hamming}.b{max_bucket}",
        documents,
        lambda: _simhash_near_pairs_build(
            documents, text_col, max_hamming, max_bucket
        ),
    )


def _simhash_near_pairs_build(
    documents: DataFrame,
    text_col: str,
    max_hamming: int,
    max_bucket: int | None,
) -> DataFrame:
    from lab3_spark.functions.partitioning import memo_persist

    sig = memo_persist(
        "dedup.simhash.signatures", simhash_signatures(documents, text_col)
    )
    chunks = sig.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(SIM_CHUNKS - 1))).alias("c"),
    ).select(
        "doc_id",
        "sig",
        "c",
        F.expr(f"shiftright(sig, c * {CHUNK_BITS})")
        .bitwiseAND(F.lit((1 << CHUNK_BITS) - 1))
        .alias("chunk"),
    )
    if max_bucket is not None:
        sizes = chunks.groupBy("c", "chunk").agg(F.count("*").alias("_bucket_n"))
        chunks = chunks.join(
            sizes.where(F.col("_bucket_n") <= max_bucket).drop("_bucket_n"),
            ["c", "chunk"],
        )
    a, b = chunks.alias("a"), chunks.alias("b")
    # A pair matching in m chunks would surface m times; instead of a
    # dropDuplicates (a full extra shuffle on (doc_a, doc_b)), keep a
    # match only when NO LOWER-indexed chunk also matches — both sigs
    # are in the joined row, so "first matching chunk" is a pure
    # expression and each qualifying pair survives exactly once.
    x = F.col("a.sig").bitwiseXOR(F.col("b.sig"))
    chunk_mask = (1 << CHUNK_BITS) - 1
    no_earlier_match = F.expr(
        " AND ".join(
            f"((shiftright(a.sig, {j * CHUNK_BITS}) & {chunk_mask}) != "
            f"(shiftright(b.sig, {j * CHUNK_BITS}) & {chunk_mask}) "
            f"OR a.c <= {j})"
            for j in range(SIM_CHUNKS - 1)
        )
    )
    joined = a.join(
        b,
        (F.col("a.c") == F.col("b.c"))
        & (F.col("a.chunk") == F.col("b.chunk"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    if max_bucket is None:
        # the predicate form assumes every chunk's bucket SURVIVED —
        # true only with no cap (see the capped branch below)
        deduped = joined.where(no_earlier_match).select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            x.alias("x"),
        )
    else:
        # capped: a pair's lowest matching chunk may live in a DROPPED
        # bucket, which would make no_earlier_match (computed from the
        # full signatures) suppress the pair at every SURVIVING chunk
        # too.  Dedup by grouping instead — one extra keyed shuffle on
        # the (already cap-bounded) match rows, correctness over the
        # predicate shortcut.  x is identical for every row of a pair
        # (pure function of the two sigs), so min() just picks it.
        deduped = (
            joined.select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                x.alias("x"),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.min("x").alias("x"))
        )
    return (
        deduped.withColumn("hamming", F.expr("bit_count(x)").cast("bigint"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def embedding_near_duplicates(
    embeddings: DataFrame, min_cosine: float = 0.35
) -> DataFrame:
    """(vec_a, vec_b, cos): near-duplicate vectors, blocked by `label`
    (IVF-style coarse bucket → independent per-block self-joins; at
    scale each block is one partition's local work).

    Perf: vectors are unit-normalized ONCE before the join (cos = dot
    of unit vectors — one interpreted fold per pair instead of three),
    and the scan is repartitioned so pair work spreads across cores
    (testdata parquet is a single row group = one scan task)."""
    from lab3_spark.functions.vectors import dot_product, unit_vector

    e = spread(embeddings).select(
        "vec_id", "label", unit_vector("embedding").alias("u")
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = dot_product(F.col("a.u"), F.col("b.u"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            trunc(cos, 4).alias("cos"),
        )
        .where(F.col("cos") >= min_cosine)
        .orderBy("vec_a", "vec_b")
    )


def containment_pairs(
    documents: DataFrame, text_col: str = "text", min_containment: float = 0.5
) -> DataFrame:
    """(doc_a, doc_b, cont_a_in_b, cont_b_in_a): ASYMMETRIC shingle
    containment on MinHash-LSH candidate pairs — |A∩B|/|A| and
    |A∩B|/|B|.

    Why it exists next to `ngram_jaccard_pairs`: Jaccard is symmetric
    and PENALIZES size mismatch — a short document wholly embedded in
    a much longer one (quoted article, concatenated crawl page,
    boilerplate-wrapped body) scores low Jaccard but containment ≈ 1
    on the short side.  Training-data pipelines prune exactly this
    shape (the sub-document duplicate), so both directions are
    emitted and the filter keeps a pair when EITHER direction clears
    the threshold.

    Same scale shape as the Jaccard verify: the shingle scan is
    computed once (memo_persist, shared with candidate generation and
    both verify sides), candidates come from the banded LSH equi-join
    (never all-pairs), and the intersection is a shingle equi-join on
    candidate pairs only.  Ratios are exact-integer numerator/
    denominator with one final division, truncated — hash-stable.

    Recall caveat (documented, not hidden): MinHash-LSH candidates
    are JACCARD-tuned, so an extreme size mismatch (tiny doc inside a
    huge one — Jaccard near zero) can miss candidacy entirely; that
    regime belongs to `repeated_chunks`, whose fixed-width chunk
    equality is size-ratio-independent.  This operator covers the
    moderate-mismatch band where LSH still fires but Jaccard
    understates the duplication.

    Reference parity note: no similarity ops in the reference
    (Phoenix++, include/map_reduce.h) — SURVEY §2.9 extension row.
    """
    from lab3_spark.functions.partitioning import memo_persist

    sh = memo_persist(
        "dedup.ngram_jaccard.shingles", _doc_shingles(documents, text_col)
    )
    cands = minhash_candidates(documents, text_col, shingles=sh).select(
        "doc_a", "doc_b"
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(
        F.col("doc_id").alias("doc_b_"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        cands.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b_"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    c_ab = trunc(F.col("n_inter") / F.col("n_a"), 4)
    c_ba = trunc(F.col("n_inter") / F.col("n_b"), 4)
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            c_ab.alias("cont_a_in_b"),
            c_ba.alias("cont_b_in_a"),
        )
        .where(
            (F.col("cont_a_in_b") >= min_containment)
            | (F.col("cont_b_in_a") >= min_containment)
        )
        .orderBy("doc_a", "doc_b")
    )


# Bloom parameters: BITS_PER_WORD = 63 keeps every set bit below the
# sign bit, so shiftleft/bit_or/bit-test arithmetic is identical on
# signed 64-bit ints in Spark and DuckDB (no 1<<63 sign surprises).
BLOOM_BITS_PER_WORD = 63


def bloom_filter_words(
    reference: DataFrame,
    text_col: str = "text",
    m_words: int = 1024,
    n_hashes: int = 4,
) -> DataFrame:
    """(word, bits): a Bloom filter over the reference corpus's content
    fingerprints, as m_words 63-bit words built by one hash shuffle +
    bit_or aggregation.

    The filter is a deterministic md5 construction (like the CMS
    counter matrix, operators/events.py cms_counters) — portable,
    mergeable (filters over disjoint corpus slices OR together), and
    fully oracle-checkable, unlike a native engine bloom whose layout
    is private.  Size: m_words·63 bits total regardless of corpus
    size; at 100 TB the filter over yesterday's corpus is built once
    (one scan, map-side-combined bit_or, ≤ m_words rows out per task)
    and BROADCAST — the incoming batch never shuffle-joins the full
    history just to ask "have we seen this content before?"."""
    fp = F.md5(F.concat_ws(" ", tokenize(text_col)))
    m_bits = m_words * BLOOM_BITS_PER_WORD
    probes = (
        spread(reference)
        .select(fp.alias("fp"))
        .distinct()
        .select(
            "fp",
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("h"),
        )
        .select(
            F.pmod(
                md5_long(
                    F.concat(F.col("h").cast("string"), F.lit("|"), F.col("fp")),
                    salt="bloom",
                ),
                F.lit(m_bits),
            ).alias("pos")
        )
    )
    return (
        probes.select(
            F.expr(f"pos div {BLOOM_BITS_PER_WORD}").alias("word"),
            # shiftleft via expr: the pyspark wrapper takes only a
            # Python-int shift amount
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_BITS_PER_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_prefilter_dedup(
    reference: DataFrame,
    incoming: DataFrame,
    text_col: str = "text",
    m_words: int = 1024,
    n_hashes: int = 4,
) -> DataFrame:
    """(doc_id, bloom_pass, is_dup, false_positive): incremental batch
    dedup of ``incoming`` against ``reference`` with a broadcast Bloom
    prefilter — the cross-snapshot dedup shape (today's crawl vs the
    accumulated corpus) where shuffling the full history per batch is
    the thing to avoid.

    Three stages, each with the scale role stated:
    1. PREFILTER: probe the broadcast m_words-row filter — the
       incoming batch's only shuffle is its own (doc grouping of
       n_hashes probe rows, map-side-combined min).  No false
       negatives by construction (every reference fp set all its
       bits), so bloom_pass=0 docs are PROVEN new and skip stage 2.
    2. VERIFY: only bloom survivors' fingerprints (a vanishing
       fraction at a sane m/n ratio) are checked exactly — the
       reference corpus is scanned once with the survivor set
       broadcast as a semi-join filter; the full-history fp shuffle
       join never happens.
    3. CLASSIFY: bloom_pass & !verified = false_positive — the
       filter's measurable error, reported per doc so the gate (and
       the oracle) pins the exact false-positive set, not just a
       rate."""
    fp = F.md5(F.concat_ws(" ", tokenize(text_col)))
    m_bits = m_words * BLOOM_BITS_PER_WORD
    bloom = bloom_filter_words(reference, text_col, m_words, n_hashes)
    inc = spread(incoming).select("doc_id", fp.alias("fp"))
    pos = F.pmod(
        md5_long(
            F.concat(F.col("h").cast("string"), F.lit("|"), F.col("fp")),
            salt="bloom",
        ),
        F.lit(m_bits),
    )
    probes = (
        inc.select(
            "doc_id",
            "fp",
            F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("h"),
        )
        .select("doc_id", "fp", pos.alias("pos"))
        .select(
            "doc_id",
            "fp",
            F.expr(f"pos div {BLOOM_BITS_PER_WORD}").alias("word"),
            (F.col("pos") % BLOOM_BITS_PER_WORD).cast("int").alias("bit"),
        )
    )
    hit = F.expr(
        "CAST(shiftright(coalesce(bits, CAST(0 AS BIGINT)), bit) % 2 AS INT)"
    )
    per_doc = (
        probes.join(F.broadcast(bloom), "word", "left")
        .select("doc_id", "fp", hit.alias("hit"))
        .groupBy("doc_id", "fp")
        .agg((F.min("hit") == 1).cast("int").alias("bloom_pass"))
    )
    survivors = per_doc.where(F.col("bloom_pass") == 1).select("fp").distinct()
    ref_fps = spread(reference).select(fp.alias("fp"))
    verified = (
        ref_fps.join(F.broadcast(survivors), "fp", "leftsemi")
        .distinct()
        .withColumn("verified", F.lit(1))
    )
    return (
        per_doc.join(F.broadcast(verified), "fp", "left")
        .select(
            "doc_id",
            "bloom_pass",
            F.coalesce("verified", F.lit(0)).alias("is_dup"),
            (
                (F.col("bloom_pass") == 1) & F.coalesce("verified", F.lit(0)).eqNullSafe(0)
            )
            .cast("int")
            .alias("false_positive"),
        )
        .orderBy("doc_id")
    )


def dedup_reassemble(
    documents: DataFrame, chunk_tokens: int = 16, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_chunks, n_kept, new_fp): corpus-wide chunk-level
    dedup WITH document reconstruction — the C4-style operation where
    duplicated spans are removed from every document except their
    first occurrence and the surviving spans are re-joined in order
    (new_fp = md5 of the reassembled text; empty survivors hash '').

    `repeated_chunks` reports where duplication is; this operator
    EDITS the corpus: the canonical copy keeps its text, later copies
    shrink.  First occurrence is the global (doc_id, chunk_id) minimum
    per chunk fingerprint — deterministic under any execution order.

    Scale: chunk explode at scan speed; first-occurrence selection is
    ONE aggregation shuffle on the chunk fingerprint + an equi-join of
    the chunk stream against the (fp → argmin) table on the same key
    (no per-fp window — a degenerate chunk repeated millions of times
    would pin a window task; the groupBy min pre-aggregates map-side
    so the hot fp arrives at the reducer as one row per upstream
    partition).  Reassembly is a per-doc aggregation: array_sort over
    the kept chunks of ONE document (bounded by doc length)."""
    from lab3_spark.operators.sampling import chunk_documents_unordered

    ch = chunk_documents_unordered(
        documents, chunk_tokens, text_col
    ).select("doc_id", "chunk_id", "chunk_text", F.md5("chunk_text").alias("cfp"))
    firsts = ch.groupBy("cfp").agg(
        F.min(F.struct("doc_id", "chunk_id")).alias("first")
    )
    kept = (
        ch.join(firsts, "cfp")
        .where(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("chunk_id") == F.col("first.chunk_id"))
        )
        .select("doc_id", "chunk_id", "chunk_text")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "chunk_text"))
                    ),
                    lambda s: s.chunk_text,
                ),
            )
        ).alias("new_fp"),
    )
    per_doc = ch.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return (
        per_doc.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("new_fp", F.md5(F.lit(""))).alias("new_fp"),
        )
        .orderBy("doc_id")
    )


def dedup_threshold_curve(
    documents: DataFrame,
    thresholds_pct: tuple[int, ...] = (20, 30, 40, 50, 60, 70, 80, 90),
    text_col: str = "text",
) -> DataFrame:
    """(threshold_pct, n_pairs, n_docs): near-dup volume as a function
    of the Jaccard cut — the sensitivity sweep run before committing a
    corpus to one threshold (too low merges topical docs, too high
    misses templated boilerplate; the knee of this curve is the
    evidence).

    Zero extra joins over `ngram_jaccard_pairs`: each verified pair
    emits the thresholds it clears via an in-row array filter +
    explode (≤ |thresholds| rows per pair), then two small
    aggregations; the 8-row threshold spine left-joins back so
    pair-free thresholds report 0.  The comparison is jaccard ≥
    t/100.0 with the division done in IEEE double by BOTH engines —
    identical verdicts on the boundary."""
    pairs = ngram_jaccard_pairs(documents, text_col=text_col)
    arr = F.array(*[F.lit(int(t)) for t in thresholds_pct])
    cleared = pairs.select(
        "doc_a",
        "doc_b",
        F.explode(
            F.filter(
                arr, lambda t: F.col("jaccard") >= t.cast("double") / 100.0
            )
        ).alias("threshold_pct"),
    )
    n_pairs = cleared.groupBy("threshold_pct").agg(
        F.count("*").alias("n_pairs")
    )
    n_docs = (
        cleared.select(
            "threshold_pct",
            F.explode(F.array("doc_a", "doc_b")).alias("d"),
        )
        .groupBy("threshold_pct")
        .agg(F.countDistinct("d").alias("n_docs"))
    )
    spine = documents.sparkSession.createDataFrame(
        [(int(t),) for t in thresholds_pct], "threshold_pct int"
    )
    return (
        spine.join(n_pairs, "threshold_pct", "left")
        .join(n_docs, "threshold_pct", "left")
        .select(
            "threshold_pct",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
            F.coalesce("n_docs", F.lit(0)).alias("n_docs"),
        )
        .orderBy("threshold_pct")
    )


def ppjoin_pairs(
    documents: DataFrame,
    text_col: str = "text",
    t_num: int = 1,
    t_den: int = 2,
) -> DataFrame:
    """(doc_a, doc_b, n_a, n_b, n_inter, jaccard): ALL pairs with
    shingle-set Jaccard ≥ t (= t_num/t_den), found by prefix filtering
    (Bayardo et al. 2007 "Scaling Up All Pairs", public) — the EXACT
    counterpart to MinHash-LSH: where LSH trades recall for speed
    probabilistically, prefix filtering is complete BY THEOREM, so
    this operator is the ground-truth near-dup join (and the recall
    yardstick for the LSH family).

    Completeness argument (one-sided prefix, unconditional): order
    shingles by a global total order (ascending document frequency,
    rarest first — the order that makes prefixes selective).  For a
    doc x with n shingles, index only its first L = n − ceil(t·n) + 1.
    If J(x,y) ≥ t then |x∩y| ≥ t·max(n_x,n_y) ≥ t·n_x, while x's
    suffix holds only ceil(t·n_x) − 1 < t·n_x elements — so x's
    PREFIX contains an intersection element, and probing the prefix
    table against y's FULL shingle set finds the pair.  No false
    negatives, ever; the exact Jaccard filter removes false
    candidates with integer arithmetic (inter·t_den ≥ union·t_num).

    Scale shape: df ranking is one vocab-sized aggregation; the
    prefix explode drops a (1−t) fraction of every doc's index
    entries; candidates come from an equi-join of prefix-vs-full on
    the shingle (the inverted index — never all-pairs); the size
    filter (min·t_den ≥ max·t_num) prunes before verification; exact
    intersection counts ride the same shingle join as
    `ngram_jaccard_pairs`.  Ascending-df order means the hottest
    shingles sit in the FEWEST prefixes — the degenerate-bucket
    pressure LSH handles with max_bucket is structurally reduced
    here (and the verify step bounds damage to real candidates).

    Selectivity caveat (honest limit): prefix filtering's pruning
    power comes from Zipfian vocabularies — each doc's prefix holds
    its RAREST shingles, which few other docs share.  On a corpus
    where every shingle is common (the synthetic testdata's ~29-word
    vocabulary is the adversarial extreme) prefixes stay hot and the
    candidate join degrades toward all-pairs; production pipelines
    run exact dedup first and drop stop-shingles above a df ceiling
    (the `sparse_tfidf_pairs` max_df discipline) before an exact
    similarity join.  A bucket cap is deliberately NOT offered: it
    would silently void the completeness theorem this operator
    exists to provide."""
    from lab3_spark.functions.partitioning import memo_persist

    sh = memo_persist(
        f"dedup.ppjoin_shingles.{text_col}",
        _doc_shingles(documents, text_col),
    )
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = (
        sh.join(dfreq, "shingle")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    # L = n - ceil(t*n) + 1, all-integer ceil
    L = F.col("n") - F.expr(
        f"(n * {t_num} + {t_den} - 1) div {t_den}"
    ) + 1
    prefix = ranked.where(F.col("rn") <= L).select(
        F.col("doc_id").alias("doc_a"), "shingle", F.col("n").alias("n_a")
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    full = sh.join(sizes, "doc_id").select(
        F.col("doc_id").alias("doc_b"), "shingle", F.col("n_sh").alias("n_b")
    )
    cand = (
        prefix.join(full, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(
            F.least("n_a", "n_b") * t_den
            >= F.greatest("n_a", "n_b") * t_num
        )
        .select("doc_a", "doc_b", "n_a", "n_b")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        cand.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count("*").alias("n_inter"))
    )
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        inter.where(F.col("n_inter") * t_den >= union * t_num)
        .select(
            "doc_a",
            "doc_b",
            "n_a",
            "n_b",
            "n_inter",
            trunc(F.col("n_inter") / union, 4).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


def sorted_neighborhood_pairs(
    documents: DataFrame,
    text_col: str = "text",
    window: int = 3,
    min_jaccard: float = 0.2,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): Sorted-Neighborhood-Method dedup
    (Hernández & Stolfo 1995, public) — sort the corpus on a cheap
    blocking key (here the 16-char lowercase text prefix), compare each
    record only with its ``window-1`` successors in that order, then
    verify candidates with EXACT shingle Jaccard.

    The third candidate-generation strategy next to MinHash-LSH
    (probabilistic) and PPJoin (prefix-filter exact): SNM trades recall
    for a FIXED comparison budget — exactly (w−1)·N pairs regardless
    of key skew, the property that made it the classic pre-LSH linkage
    method.  Scale shape: the global sort order comes from
    rank.with_global_row_number (ranged shuffle + broadcast offsets —
    no single-partition window); neighbor pairing is an equi-join of
    the rank frame with itself on rn+offset; the verify reuses the
    memo-persisted shingle frame shared with the LSH family."""
    from lab3_spark.functions.partitioning import memo_persist
    from lab3_spark.functions.rounding import trunc
    from lab3_spark.operators.rank import with_global_row_number

    ranked = with_global_row_number(
        documents.select(
            "doc_id",
            F.substring(F.lower(F.col(text_col)), 1, 16).alias("_snm_key"),
        ),
        ["_snm_key", "doc_id"],
        out_col="rn",
        memo_key="dedup.snm.rank",
    ).select("doc_id", "rn")
    lhs = ranked.select(
        F.col("doc_id").alias("_id_a"),
        F.explode(
            F.sequence(F.col("rn") + 1, F.col("rn") + (window - 1))
        ).alias("_rn_b"),
    )
    rhs = ranked.select(
        F.col("doc_id").alias("_id_b"), F.col("rn").alias("_rn_b")
    )
    cands = (
        lhs.join(rhs, "_rn_b")
        .select(
            F.least("_id_a", "_id_b").alias("doc_a"),
            F.greatest("_id_a", "_id_b").alias("doc_b"),
        )
        # (w−1) offsets from DISTINCT ranks can never repeat a pair,
        # but normalize anyway so the contract is self-evident
        .distinct()
    )
    sh = memo_persist(
        "dedup.ngram_jaccard.shingles", _doc_shingles(documents, text_col)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(
        F.col("doc_id").alias("doc_b_"), F.col("shingle").alias("shingle_b")
    )
    inter = (
        cands.join(sh_a, "doc_a")
        .join(
            sh_b,
            (F.col("doc_b") == F.col("doc_b_"))
            & (F.col("shingle") == F.col("shingle_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select("doc_a", "doc_b", trunc(jac, 4).alias("jaccard"))
        .where(F.col("jaccard") >= min_jaccard)
        .orderBy("doc_a", "doc_b")
    )


CDC_WINDOW = 16      # rolling-hash window (bytes)
CDC_MASK_MOD = 64    # boundary when h % MOD == 0 -> ~64-byte chunks
CDC_GEAR_MUL = 2654435761  # Knuth multiplicative hash
CDC_GEAR_MOD = 8192


def cdc_chunk_frame(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, idx, chunk): CONTENT-DEFINED chunking — the
    restic/borg/FastCDC family's answer to the fixed-window chunker's
    boundary-shift fragility.  A gear rolling hash over a 16-byte
    window places a boundary wherever h % 64 == 0, so inserting or
    deleting one byte shifts only the chunk it lands in: boundaries
    RESYNCHRONIZE at the next hash match and every later chunk keeps
    its fingerprint (pinned by test), whereas repeated_chunks'
    fixed windows shift every subsequent fingerprint.

    Whole computation is ONE in-row expression chain (gear table →
    closed-form window hash Σ gear[i−k]·4^k (< 2^47, exact int64) →
    boundary filter → slice explode): no UDF, no shuffle until the
    consumer aggregates.  O(n·16) expression ops per doc."""
    n = F.length(text_col)
    gear = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: (
            F.ascii(F.substring(F.col(text_col), i, F.lit(1)))
            * F.lit(CDC_GEAR_MUL)
        )
        % CDC_GEAR_MOD,
    )
    pre = documents.select(
        "doc_id", F.col(text_col).alias("_t"), gear.alias("_gear"),
        n.cast("long").alias("_n"),
    )

    def h(i):
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(CDC_WINDOW - 1)),
                lambda k: F.element_at(F.col("_gear"), (i - k).cast("int"))
                * F.pow(F.lit(4.0), k).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    bnd = F.array_sort(
        F.array_distinct(
            F.concat(
                F.array(F.lit(0).cast("long")),
                F.filter(
                    # Spark's sequence(a, b) DESCENDS when b < a (DuckDB's
                    # range is empty) — docs shorter than the window must
                    # yield no interior boundary candidates, not a reversed
                    # scan off the end of the gear table
                    F.when(
                        F.col("_n") >= CDC_WINDOW,
                        F.sequence(
                            F.lit(CDC_WINDOW).cast("long"), F.col("_n")
                        ),
                    ).otherwise(F.expr("CAST(array() AS ARRAY<BIGINT>)")),
                    lambda i: h(i) % CDC_MASK_MOD == 0,
                ),
                F.array(F.col("_n")),
            )
        )
    )
    return pre.select("doc_id", bnd.alias("_bs"), "_t").select(
        "doc_id",
        F.expr(
            # CASE guard: an empty doc collapses _bs to [0] and
            # sequence(1, 0) DESCENDS in Spark — emit no chunks instead
            "posexplode(CASE WHEN size(_bs) >= 2 THEN"
            " transform(sequence(1, size(_bs) - 1), idx ->"
            " substring(_t, CAST(element_at(_bs, idx) + 1 AS INT),"
            " CAST(element_at(_bs, idx + 1) - element_at(_bs, idx) AS INT)))"
            " ELSE CAST(array() AS ARRAY<STRING>) END)"
        ).alias("idx", "chunk"),
    ).where(F.length("chunk") > 0).select(
        "doc_id", (F.col("idx") + 1).alias("idx"), "chunk"
    )


def cdc_duplicate_chunks(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(fp, chunk_len, n_copies, n_docs): content-defined chunks that
    appear more than once — one combinable agg on the chunk md5 (the
    exact-dedup shape at sub-document granularity, boundary-shift
    robust)."""
    ch = cdc_chunk_frame_arrow(documents, text_col)
    return (
        ch.select(
            "doc_id", F.md5("chunk").alias("fp"),
            F.length("chunk").alias("chunk_len"),
        )
        .groupBy("fp", "chunk_len")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("fp")
    )


def cdc_chunk_frame_arrow(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Arrow twin of :func:`cdc_chunk_frame` — bit-identical output
    (pinned in tests/test_dedup.py), ~7× faster: the per-character
    window hash is a numpy int64 convolution per doc instead of an
    interpreted higher-order-function fold per position.  Same ladder
    as the SimHash/LSH expression-vs-arrow twins: the expression form
    IS the oracle-matching spec, the Arrow form is the measured fast
    path the gate runs."""
    import numpy as np
    import pyarrow as pa

    # np.convolve REVERSES the kernel internally, so the ascending
    # powers become the descending weights the closed form wants:
    # h[i] = Σ_k gear[i−k]·4^k
    kernel = 4 ** np.arange(CDC_WINDOW, dtype=np.int64)

    def batches(it):
        for batch in it:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out_id, out_idx, out_chunk = [], [], []
            for did, text in zip(ids, texts):
                if not text:
                    continue
                cps = np.frombuffer(
                    text.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = cps.size
                gear = (cps * CDC_GEAR_MUL) % CDC_GEAR_MOD
                if n >= CDC_WINDOW:
                    # h[i] = Σ_k gear[i−k]·4^k for i = W..n (1-based):
                    # exact int64 (< 2^47), same closed form as the
                    # expression twin
                    h = np.convolve(gear, kernel, mode="valid")
                    interior = np.flatnonzero(h % CDC_MASK_MOD == 0) + CDC_WINDOW
                else:
                    interior = np.empty(0, dtype=np.int64)
                bnd = np.unique(np.concatenate(([0], interior, [n])))
                for j in range(bnd.size - 1):
                    a, b = int(bnd[j]), int(bnd[j + 1])
                    if b > a:
                        out_id.append(did)
                        out_idx.append(j + 1)
                        out_chunk.append(text[a:b])
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(out_id, type=pa.int64()),
                    pa.array(out_idx, type=pa.int64()),
                    pa.array(out_chunk, type=pa.string()),
                ],
                names=["doc_id", "idx", "chunk"],
            )

    from lab3_spark.functions.partitioning import spread

    return (
        spread(documents)
        .select("doc_id", F.col(text_col).alias("text"))
        .mapInArrow(batches, "doc_id bigint, idx bigint, chunk string")
    )


def blocking_quality(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One row (n_docs, n_true_pairs, n_cand_pairs, n_caught, pc_fp,
    rr_fp): the two numbers every blocking strategy is judged by in
    entity resolution — PAIR COMPLETENESS (how many true duplicate
    pairs the candidate generator catches; recall of the blocker) and
    REDUCTION RATIO (how much of the N·(N−1)/2 comparison space it
    prunes).  Truth = exact-fingerprint pairs; candidates = the LSH
    band join.  A good blocker sits at PC → 1, RR → 1.

    No pair space is ever materialized: n_true_pairs is Σ C(g,2) over
    fingerprint group sizes (one agg), n_caught joins the candidate
    frame to the fingerprint table twice (equi-joins on doc id), and
    RR's denominator is arithmetic."""
    from lab3_spark.functions.partitioning import persist_latest

    cand = persist_latest(
        "dedup.blocking.cand", minhash_candidates(documents, text_col)
    )
    return _blocking_metrics(documents, cand, text_col)


def simhash_blocking_quality(
    documents: DataFrame, text_col: str = "text"
) -> DataFrame:
    """blocking_quality for the SIMHASH blocker (4×15-bit pigeonhole
    chunks + hamming ≤ 3 verify) — same PC/RR metrics, same exact-
    fingerprint truth set, so the two candidate generators the engine
    ships are judged on one scale.  Exact duplicates are hamming-0 and
    land in every chunk bucket, so PC = 1 unless a bucket cap drops a
    pathological mass; RR measures how much tighter the 60-bit
    signature blocks than MinHash bands."""
    from lab3_spark.functions.partitioning import persist_latest

    cand = persist_latest(
        "dedup.blocking.simcand",
        simhash_near_pairs(documents, text_col).select("doc_a", "doc_b"),
    )
    return _blocking_metrics(documents, cand, text_col)


def _blocking_metrics(
    documents: DataFrame, cand: DataFrame, text_col: str
) -> DataFrame:
    from lab3_spark.functions.partitioning import persist_latest

    fp = persist_latest(
        "dedup.blocking.fp",
        documents.select(
            "doc_id", F.md5(F.concat_ws(" ", tokenize(text_col))).alias("fp")
        ),
    )
    truth = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("g")).agg(
        F.sum(F.expr("g * (g - 1) DIV 2")).alias("n_true"),
        F.sum("g").alias("n_docs"),
    )
    caught = (
        cand.join(fp.select(F.col("doc_id").alias("doc_a"), F.col("fp").alias("fa")), "doc_a")
        .join(fp.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fb")), "doc_b")
        .where(F.col("fa") == F.col("fb"))
        .agg(F.count(F.lit(1)).alias("n_caught"))
    )
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    j = truth.crossJoin(F.broadcast(n_cand)).crossJoin(F.broadcast(caught))
    pc = F.when(
        F.col("n_true") > 0,
        F.expr(f"CAST(n_caught * {10**6} DIV n_true AS BIGINT)"),
    ).otherwise(F.lit(1_000_000).cast("bigint"))
    # guard like the pc_fp branch: a 1-doc corpus has zero possible
    # pairs, so RR is vacuously perfect rather than a divide-by-zero
    rr = F.when(
        F.col("n_docs") > 1,
        F.lit(1_000_000).cast("bigint")
        - F.expr(
            f"CAST(n_cand * {10**6} DIV (n_docs * (n_docs - 1) DIV 2)"
            " AS BIGINT)"
        ),
    ).otherwise(F.lit(1_000_000).cast("bigint"))
    return j.select(
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_true").cast("bigint").alias("n_true_pairs"),
        F.col("n_cand").cast("bigint").alias("n_cand_pairs"),
        F.col("n_caught").cast("bigint").alias("n_caught"),
        pc.alias("pc_fp"),
        rr.alias("rr_fp"),
    )


def contamination_max_span(
    documents: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """(doc_id, n_spans, max_span_tokens, overlap_tokens, len_bucket):
    contamination SEVERITY, not just flags — for every train document
    with any verbatim n-gram overlap against the benchmark/eval side,
    the per-doc MAXIMAL overlap spans (the gaps-and-islands fold of
    :func:`spans_from_hits` chained through :func:`merge_spans`'
    interval union) summarized as the longest merged span, the total
    overlapped token count, and a decade length bucket
    ((max DIV 10)·10) so the severity histogram is one GROUP BY away.
    This ranks contaminated docs the way the Lee et al. 2022 /
    Llama-report contamination appendices do: a doc sharing one
    13-token span is a different animal from one embedding a whole
    benchmark item, and :func:`~lab3_spark.operators.textstats.
    benchmark_decontaminate`'s 0/1 flag cannot tell them apart
    (VERDICT r10 item 5).

    Scale shape: identical to benchmark_decontaminate — the eval gram
    set is DISTINCT and BROADCASTS (eval suites are fixed-size), the
    corpus side is one posexplode + broadcast semi-join, spans fold in
    a per-document window (bounded by doc length), and the output is
    contaminated-docs-only (candidate scale).  min_span_tokens = n:
    every hit island is by construction ≥ n tokens, so severity counts
    ALL verbatim overlap, not just the ≥13-token excision threshold
    of :func:`decontaminate_train_spans`.  Ordered worst-first."""
    from lab3_spark.operators.textstats import _word_ngrams

    ev_grams = (
        benchmark.select(
            F.explode(_word_ngrams(tokenize(text_col), n)).alias("gram")
        )
        .distinct()
    )
    doc_grams = spread(documents).select(
        "doc_id",
        F.posexplode(_word_ngrams(tokenize(text_col), n)).alias(
            "pos", "gram"
        ),
    )
    hits = doc_grams.join(F.broadcast(ev_grams), "gram", "left_semi").select(
        "doc_id", "pos"
    )
    merged = merge_spans(spans_from_hits(hits, n, min_span_tokens=n))
    span_len = F.col("b") - F.col("a")
    per_doc = merged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.max(span_len).cast("bigint").alias("max_span_tokens"),
        F.sum(span_len).cast("bigint").alias("overlap_tokens"),
    )
    return per_doc.select(
        "doc_id",
        "n_spans",
        "max_span_tokens",
        "overlap_tokens",
        (F.expr("max_span_tokens DIV 10") * 10)
        .cast("bigint")
        .alias("len_bucket"),
    ).orderBy(F.col("max_span_tokens").desc(), "doc_id")


#: the planner's candidate bandings: every (n_bands, rows_per_band)
#: factorization of the engine's N_HASHES MinHash budget.
LSH_PLAN_COMBOS: list[tuple[int, int]] = [
    (b, N_HASHES // b) for b in (1, 2, 4, 8, 16)
]


def _scurve_miss_ppm(p10: int, n_bands: int, n_rows: int) -> int:
    """EXACT integer parts-per-million MISS probability of the LSH
    S-curve (Mining of Massive Datasets §3.4.2, public) at Jaccard
    s = p10/10 for an (n_bands, n_rows) banding:
    floor(1e6 · (1 − s^r)^b) = (10^r − p10^r)^b DIV 10^(b·r − 6).

    Everything is integer arithmetic over the 0.1 similarity grid —
    (10^r − p10^r)^b ≤ 10^16 fits bigint, so the DuckDB oracle
    recomputes the identical value (recursive-CTE power) and no pow()
    float can flicker a bucket."""
    if n_bands * n_rows < 6:
        # 10 ** (negative) is a FLOAT in Python — the exactness claim
        # dies silently below a 6-hash budget, so refuse eagerly
        raise ValueError(
            f"n_bands*n_rows = {n_bands * n_rows} < 6: ppm scaling "
            "needs at least a 6-hash budget for exact integer floor"
        )
    q = 10**n_rows - p10**n_rows
    return q**n_bands // 10 ** (n_bands * n_rows - 6)


def lsh_band_plan(
    documents: DataFrame, text_col: str = "text", t10: int = 5
) -> DataFrame:
    """(n_bands, n_rows, fp_weight, fn_weight, cost, is_best): the
    MMDS-ch.3 LSH band PLANNER (VERDICT r10 item 4) — for every
    (b, r) factorization of the N_HASHES MinHash budget, the expected
    false-positive + false-negative pair mass at a target Jaccard
    threshold t = t10/10, evaluated against the corpus's OWN measured
    pair-similarity curve (:func:`pair_similarity_histogram`) instead
    of a textbook uniform prior.

    Per 0.1-similarity bucket with lower edge s and n_pairs observed
    pairs: miss_ppm = floor(1e6·(1 − s^r)^b) (exact integer S-curve,
    :func:`_scurve_miss_ppm`); buckets at-or-above the threshold
    contribute n_pairs·miss_ppm to FN (true dups the banding would
    lose), buckets below contribute n_pairs·(1e6 − miss_ppm) to FP
    (junk pairs it would verify).  cost = FP + FN; ``is_best`` marks
    the minimizer (ties broken toward fewer bands = cheaper banding).
    All integers — deterministic argmin, no float tie flicker.

    The input curve covers the pairs the CURRENT blocker can see
    (candidate pairs under the shipped 4×4 banding): at corpus scale
    that is the measurable object — the planner refines the banding
    within observed evidence; the unobserved below-band-threshold
    mass is exactly the mass every banding suppresses hardest.  The
    S-curve table is 5 bandings × 11 buckets of driver-computed exact
    ints (planner metadata, broadcast) joined against the ≤11-row
    histogram — nothing here touches corpus-scale data beyond the
    shared candidate memo."""
    if not 0 <= t10 <= 10:
        raise ValueError(
            f"t10 = {t10} outside the 0..10 similarity grid — every "
            "bucket would land on one side and the plan degenerates"
        )
    hist = pair_similarity_histogram(documents, text_col)
    spark = documents.sparkSession
    curve = spark.createDataFrame(
        [
            (b, r, p, _scurve_miss_ppm(p, b, r))
            for (b, r) in LSH_PLAN_COMBOS
            for p in range(11)
        ],
        "n_bands int, n_rows int, bucket_x10 bigint, miss_ppm bigint",
    )
    # curve is the 55-row planner-metadata side; hist is ≤11 rows but
    # sits atop the candidate-pair machinery — broadcast it INTO the
    # curve join so no exchange lands on the planner path
    joined = curve.join(F.broadcast(hist), "bucket_x10", "left").select(
        "n_bands",
        "n_rows",
        "bucket_x10",
        "miss_ppm",
        F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
    )
    agg = joined.groupBy("n_bands", "n_rows").agg(
        F.sum(
            F.when(
                F.col("bucket_x10") < t10,
                F.col("n_pairs") * (F.lit(1_000_000) - F.col("miss_ppm")),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("fp_weight"),
        F.sum(
            F.when(
                F.col("bucket_x10") >= t10,
                F.col("n_pairs") * F.col("miss_ppm"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("fn_weight"),
    )
    from lab3_spark.functions.partitioning import one_window_partition

    cost = (F.col("fp_weight") + F.col("fn_weight")).cast("bigint")
    # 5-row planner table: legitimately single-partition (metadata)
    w = Window.partitionBy(one_window_partition()).orderBy("cost", "n_bands")
    return (
        agg.withColumn("cost", cost)
        .withColumn(
            "is_best",
            (F.row_number().over(w) == 1).cast("bigint"),
        )
        .orderBy("n_bands")
        .select(
            F.col("n_bands").cast("bigint").alias("n_bands"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            "fp_weight",
            "fn_weight",
            "cost",
            "is_best",
        )
    )


def lsh_planned_blocking_quality(
    documents: DataFrame, text_col: str = "text", t10: int = 5
) -> DataFrame:
    """(n_bands, n_rows, n_docs, n_true_pairs, n_cand_pairs, n_caught,
    pc_fp, rr_fp): the planner's chosen banding MEASURED — re-band the
    shared MinHash signatures with :func:`lsh_band_plan`'s winning
    (b, r) and score the resulting candidate generator with the same
    pair-completeness / reduction-ratio metrics as
    :func:`blocking_quality`, so the planned and shipped bandings sit
    side by side on one scale (VERDICT r10 item 4's "emit the planned
    banding + its measured PC/RR next to dedup_blocking_quality").

    The winner row is a 1-row driver collect (bounded planner
    metadata — the kmeans-centroid pattern, never corpus-scale); the
    re-banding slices the EXISTING signature arrays (one explode over
    b* band indices, equi-join on (band, band_key)) — no signature is
    recomputed, and the candidate join shape is identical to
    minhash_candidates' at any corpus size.

    Warm path: the winner collect happens during CONSTRUCTION (the
    driver-looped class), so the whole gate sits behind the
    input-keyed result memo; the signature frame additionally rides
    memo_persist so a re-run after a pass-boundary result-memo flush
    re-bands from the persisted signatures instead of recomputing the
    16-salt aggregation (sf1 measured: 15.6 s → re-band only)."""
    from lab3_spark.functions.partitioning import memo_result

    return memo_result(
        f"dedup.lsh_planned_quality.{text_col}.t{t10}",
        documents,
        lambda: _lsh_planned_quality_build(documents, text_col, t10),
    )


def _lsh_planned_quality_build(
    documents: DataFrame, text_col: str, t10: int
) -> DataFrame:
    from lab3_spark.functions.partitioning import memo_persist

    plan = lsh_band_plan(documents, text_col, t10)
    best = plan.where(F.col("is_best") == 1).collect()[0]
    bstar, rstar = int(best["n_bands"]), int(best["n_rows"])
    sig = memo_persist(
        f"dedup.minhash_sig.{text_col}",
        minhash_signatures(documents, text_col),
    )
    # persisted (optimization round 13 — the paragraph-minhash r12
    # pattern): the banded frame feeds BOTH sides of the candidate
    # self-join, so unpersisted the explode+md5 re-ran twice per
    # action (the dominant cold cost).  A co-partitioned layout
    # (repartition+sort by the join key) was A/B-measured ~0.4 s WORSE
    # warm at sf0.1 and dropped.
    bands = memo_persist(
        f"dedup.lsh_planned_bands.{text_col}.b{bstar}",
        sig.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(bstar - 1))).alias("band"),
            "sig",
        ).select(
            "doc_id",
            "band",
            F.md5(
                F.concat_ws(
                    ",", F.slice("sig", F.col("band") * rstar + 1, rstar)
                )
            ).alias("band_key"),
        ),
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    return _blocking_metrics(documents, cand, text_col).select(
        F.lit(bstar).cast("bigint").alias("n_bands"),
        F.lit(rstar).cast("bigint").alias("n_rows"),
        "n_docs",
        "n_true_pairs",
        "n_cand_pairs",
        "n_caught",
        "pc_fp",
        "rr_fp",
    )


def apply_line_dedup(
    documents: DataFrame,
    text_col: str = "text",
    delimiter: str | None = None,
    block_tokens: int | None = None,
    joiner: str | None = None,
) -> DataFrame:
    """(doc_id, n_lines, kept_lines, removed_lines, clean_text): EXACT
    duplicate-LINE removal, keep-first — the RefinedWeb/Falcon exact
    line-dedup pass (Penedo et al. 2023 §4.2, public: identical lines
    repeated across the corpus are navigation menus, cookie banners,
    boilerplate headers; remove every occurrence but the first).  The
    exact-unit complement of :func:`apply_paragraph_dedup`'s near-dup
    action: that one needs LSH because paragraphs mutate; this one is
    a straight equality class per unit, so the keep-first rule is a
    row_number over (unit text) ordered by (doc_id, line_idx) — no
    bands, no verify, deterministic.

    Unitization is :func:`paragraph_frame` VERBATIM (``delimiter`` =
    the real-corpus newline path, ``block_tokens`` = the stand-in
    grain for the newline-free synthetic corpus), so the exact and
    near-dup passes agree on what a "line" is.  Survivors re-join in
    original order; docs never flagged pass through; a doc whose
    every line was removed survives as an empty string (the
    remove-not-drop contract shared by the span/paragraph applies).
    Within-doc repeats dedup exactly like cross-doc ones — the
    RefinedWeb rule is corpus-global.

    Scale shape — deliberately NOT a row_number window: a window
    partitioned by unit text sends EVERY copy of a hot boilerplate
    line (the exact thing this pass removes — cookie banners repeat
    millions of times) to one task, and window skew has no AQE
    mitigation.  Instead the first occurrence is a groupBy(text)
    min(struct(doc_id, line_idx)) — map-side partial aggregation
    collapses a hot text to ONE row per input partition before the
    shuffle, so the agg is skew-immune — and keep/drop is one
    equi-join back on the text (AQE skew-join splits any hot join
    partition).  Then the same candidate-scale per-doc bounded
    collect_list reassembly as the paragraph apply."""
    lines = paragraph_frame(
        documents, text_col, delimiter=delimiter, block_tokens=block_tokens
    )
    firsts = lines.groupBy("para_text").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("_first")
    )
    kept = (
        lines.join(firsts, "para_text")
        .where(
            (F.col("doc_id") == F.col("_first.doc_id"))
            & (F.col("para_idx") == F.col("_first.para_idx"))
        )
        .drop("_first")
    )
    # ADVICE r11: ``delimiter`` is a REGEX (not invertible into a join
    # string), so survivors re-join with the explicit ``joiner`` —
    # default '\n' for the delimiter path (the newline-corpus
    # convention this always had), ' ' for block_tokens.  Callers
    # splitting on a custom pattern pass the matching joiner.
    if joiner is None:
        joiner = "\n" if delimiter is not None else " "
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("kept_lines"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("para_idx", "para_text"))
                ),
                lambda s: s["para_text"],
            ),
            joiner,
        ).alias("clean_text"),
    )
    tot = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines")
    )
    n_lines = F.coalesce(F.col("n_lines"), F.lit(0)).cast("bigint")
    kept_n = F.coalesce(F.col("kept_lines"), F.lit(0)).cast("bigint")
    return (
        documents.select("doc_id")
        .join(tot, "doc_id", "left")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            n_lines.alias("n_lines"),
            kept_n.alias("kept_lines"),
            (n_lines - kept_n).cast("bigint").alias("removed_lines"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
        .orderBy("doc_id")
    )
