"""Scale-tier swaps: several exact, oracle-checked operators document
an approximate variant as the 100 TB path (`multi_distinct_agg` →
approx_count_distinct, `quantile_stats` → percentile_approx). These
tests pin that the swap is actually available and lands within the
advertised error, so the claim in the docstrings is checked, not
aspirational."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from vector_search_service_spark.sources.tables import load_table


def test_approx_count_distinct_within_tolerance(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    row = li.agg(
        F.count_distinct("l_partkey").alias("exact"),
        F.approx_count_distinct("l_partkey", rsd=0.05).alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) <= 0.15 * row["exact"]


def test_percentile_approx_close_to_exact(spark):
    cust = load_table(spark, SF_SMOKE, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    row = (
        cust.select(cents.alias("cents"))
        .agg(
            F.expr("percentile(cents, 0.5)").alias("exact"),
            F.expr("approx_percentile(cents, 0.5, 10000)").alias("approx"),
        )
        .collect()[0]
    )
    # high-accuracy sketch on integer cents: within 1% of the spread
    spread = cust.agg(
        (F.max(cents) - F.min(cents)).alias("s")
    ).collect()[0]["s"]
    assert abs(row["approx"] - row["exact"]) <= 0.01 * spread


def test_quantized_topk_recall_vs_exact(spark):
    """int8 quantization + 50-candidate rerank must recover the exact
    brute-force top-10 (recall on the synthetic corpus is a fixed,
    checkable number — here 100%)."""
    from vector_search_service_spark.queries_ann import q_quantized_vector_topk
    from vector_search_service_spark.queries_reference import q_vector_topk

    quant = [r["vec_id"] for r in q_quantized_vector_topk(spark, SF_SMOKE).collect()]
    exact = [r["vec_id"] for r in q_vector_topk(spark, SF_SMOKE).collect()]
    assert quant == exact


def test_jl_topk_recall_on_stock_corpus(spark):
    """JL tier recall pin on the stock corpus. The synthetic
    embeddings are near-isotropic random vectors — the worst case for
    ANY sketch (all pairwise cosines concentrate near 0, so the 'true'
    top-10 is separated by noise-level margins) — so the pin is ≥7/10,
    the observed floor across scale factors at k=48/cand=200."""
    from vector_search_service_spark.queries_ann import q_jl_ann_topk
    from vector_search_service_spark.queries_reference import q_vector_topk

    jl = {r["vec_id"] for r in q_jl_ann_topk(spark, SF_SMOKE).collect()}
    exact = {r["vec_id"] for r in q_vector_topk(spark, SF_SMOKE).collect()}
    assert len(jl & exact) >= 7, f"JL recall@10 = {len(jl & exact)}/10"


def test_jl_projection_recovers_planted_neighbors(spark):
    """On data with real signal the JL sketch must be near-exact:
    plant 10 true neighbors (query + small noise) among 2000 decoys
    and require the integer-projected candidate stage alone — before
    any rerank — to surface all 10 in its top-200."""
    import math

    from vector_search_service_spark.operators.ann import jl_signs
    from vector_search_service_spark.queries_reference import QUERY_VEC

    signs = jl_signs(64, 48, seed=11)
    qq = [math.floor(x * 100_000 + 0.5) for x in QUERY_VEC]
    qproj = [sum(s * q for s, q in zip(row, qq)) for row in signs]

    def prng(a: int, b: int) -> float:  # deterministic (-0.5, 0.5)
        x = math.sin(a * 7919 + b * 104729 + 0.123) * 43758.5453
        return (x - math.floor(x)) - 0.5

    rows = []
    for i in range(10):  # planted: query + 5% noise
        rows.append((i, [QUERY_VEC[d] + 0.05 * prng(i, d) for d in range(64)]))
    for i in range(10, 2010):  # decoys: isotropic junk
        rows.append((i, [2.0 * prng(i, d) for d in range(64)]))

    def jl_dist(vec):
        vq = [math.floor(max(-8.0, min(8.0, x)) * 100_000 + 0.5) for x in vec]
        return sum(
            (sum(s * v for s, v in zip(row, vq)) - qp) ** 2
            for row, qp in zip(signs, qproj)
        )

    ranked = sorted(rows, key=lambda r: (jl_dist(r[1]), r[0]))
    top200 = {r[0] for r in ranked[:200]}
    assert all(i in top200 for i in range(10)), "planted neighbor missed"
    # and the planted block actually leads the ranking
    assert {r[0] for r in ranked[:10]} == set(range(10))


def test_weighted_sample_overrepresents_heavy_docs(spark):
    """weighted_sample_topk semantics: with two weight classes the
    heavy class must win sample slots well beyond its population
    share (exact A-Res ordering via the min-of-w-hash race), and with
    ALL weights equal the race must reduce to the plain min-hash
    uniform sample — same ids either way the weights enter."""
    from pyspark.sql import functions as F

    n = 400
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # heavy class: ids < 40 get weight 8; the rest weight 1
        F.when(F.col("id") < 40, F.lit(8)).otherwise(F.lit(1)).alias("w"),
    )

    def race(frame, k=50):
        return (
            frame.select(
                "doc_id", "w",
                F.explode(F.sequence(F.lit(1), F.col("w"))).alias("d"),
            )
            .withColumn("p", F.md5(F.concat_ws(
                ":", F.col("doc_id").cast("string"), F.col("d").cast("string"))))
            .groupBy("doc_id", "w").agg(F.min("p").alias("p"))
            .orderBy(F.col("p").asc(), F.col("doc_id").asc())
            .limit(k)
        )

    got = race(df).collect()
    heavy = sum(1 for r in got if r["w"] == 8)
    # heavy share of draw mass = 320/680 ≈ 47%; population share = 10%.
    # Expect ≈ 23 of 50; assert comfortably above the uniform expectation.
    assert heavy >= 15, f"heavy docs won only {heavy}/50 slots"

    uniform = df.select("doc_id", F.lit(1).alias("w"))
    ids_weighted_as_uniform = [r["doc_id"] for r in race(uniform).collect()]
    plain_minhash = [
        r["doc_id"]
        for r in uniform.withColumn(
            "p", F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.lit("1")))
        ).orderBy(F.col("p").asc(), F.col("doc_id").asc()).limit(50).collect()
    ]
    assert ids_weighted_as_uniform == plain_minhash


def test_multifile_corpus_parallelizes_scan_and_preserves_results(spark, tmp_path):
    """The local corpus is one single-row-group parquet file per table,
    so scans plan as ONE task — the only reason compute-heavy UDF
    stages look serial locally. This pins the at-scale claim: the SAME
    plan over a multi-file copy of the corpus (what 100 TB actually
    looks like) fans out to one task per split with bit-identical
    results — scan parallelism comes from layout, not query changes."""
    from pyspark.sql import functions as F

    from vector_search_service_spark.operators.dedup import minhash_band_keys
    from vector_search_service_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    multi = str(tmp_path / "docs_multifile")
    docs.repartition(8, F.col("doc_id")).write.parquet(multi)

    docs_multi = spark.read.parquet(multi)
    assert docs.rdd.getNumPartitions() == 1  # the local single-file bound
    assert docs_multi.rdd.getNumPartitions() >= 8

    def keys(frame):
        return sorted(
            (r["doc_id"], r["band"], r["band_key"])
            for r in minhash_band_keys(frame).select(
                "doc_id", "band", "band_key").collect()
        )

    assert keys(docs) == keys(docs_multi)


def test_jl_sketch_layout_prunes_probe_range(spark, tmp_path):
    """Pins SCALE.md's claim that the JL sketch table is index-able:
    written range-partitioned on the first projected coordinate, a
    probe's p0-window overlaps only a small fraction of files by
    parquet min/max stats — the same stats-pruning contract the
    z-order test measures. (A random or round-robin layout would
    overlap every file.)"""
    from pyspark.sql import functions as F

    from vector_search_service_spark.operators.ann import jl_signs
    from vector_search_service_spark.operators.zorder import files_overlapping_box
    from vector_search_service_spark.queries_ann import (
        _JL_CLAMP,
        _JL_SCALE,
        _jl_qproj,
    )
    from vector_search_service_spark.sources.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    row0 = jl_signs(64, 48, seed=11)[0]
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vq = F.transform(
        v,
        lambda x: F.round(
            F.least(F.greatest(x, F.lit(-_JL_CLAMP)), F.lit(_JL_CLAMP))
            * _JL_SCALE
        ).cast("long"),
    )
    p0 = F.lit(0).cast("long")
    for i, s in enumerate(row0):
        if s > 0:
            p0 = p0 + F.element_at(F.col("vq"), i + 1)
        elif s < 0:
            p0 = p0 - F.element_at(F.col("vq"), i + 1)
    sketch = emb.select("vec_id", vq.alias("vq")).select(
        "vec_id", p0.alias("p0"))
    path = str(tmp_path / "jl_sketch")
    (sketch.repartitionByRange(16, F.col("p0"))
           .sortWithinPartitions("p0")
           .write.parquet(path))

    # probe window: +-5% of the observed p0 spread around the query
    lo_hi = sketch.agg(F.min("p0"), F.max("p0")).first()
    spread = lo_hi[1] - lo_hi[0]
    q0 = _jl_qproj()[0]
    box = {"p0": (q0 - 0.05 * spread, q0 + 0.05 * spread)}
    hit, total = files_overlapping_box(path, box)
    assert total >= 12  # the layout actually fanned out
    assert hit <= max(2, total // 4), (
        f"p0 probe window overlaps {hit}/{total} files — range layout "
        "is not pruning")


def test_tfidf_prefix_candidate_bound_is_corpus_size_free(spark):
    """The prefix tier's whole point (r7 verdict #6): candidate count
    is bounded by vocab * C(posting_cap, 2) regardless of corpus size,
    while the df-fraction baseline grows ~quadratically. Pin both the
    hard bound and the cross-sf behavior on the real corpora (sf0.001,
    sf0.1, and sf1 when present)."""
    import os

    from vector_search_service_spark.queries_dedup import (
        _TFIDF_POSTING_CAP,
        _tfidf_block_candidates,
        _tfidf_prefix_candidates,
        _tfidf_weights,
    )

    sfs = [SF_SMOKE, "/root/testdata/sf0.1"]
    sf1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")
    if os.path.isdir(sf1):
        sfs.append(sf1)

    prefix_counts = {}
    for sf in sfs:
        wt, _ = _tfidf_weights(spark, sf)
        wt = wt.localCheckpoint(eager=False)  # branch reuse in one test job
        vocab = wt.select("h").distinct().count()
        hard_bound = vocab * _TFIDF_POSTING_CAP * (_TFIDF_POSTING_CAP - 1) // 2
        n_prefix = _tfidf_prefix_candidates(wt).count()
        n_block = _tfidf_block_candidates(wt).count()
        prefix_counts[sf] = n_prefix
        assert 0 < n_prefix <= hard_bound, (sf, n_prefix, hard_bound)
        assert n_block > 0, (sf, "df-fraction blocking went vacuous")

    # corpus-size-free in practice, not just in the bound: growing the
    # corpus 10x must NOT grow prefix candidates ~quadratically (the
    # df-fraction tier does; SCALE.md records its measured growth)
    small, big = prefix_counts[sfs[0]], prefix_counts[sfs[1]]
    assert big <= max(small * 4, 4 * _TFIDF_POSTING_CAP ** 2), (small, big)


def test_semdedup_cluster_recall_and_prune_consistency(spark):
    """SemDeDup prunes only WITHIN clusters, so it misses cross-cluster
    near-dups by design (the paper's own trade). Pin (a) that every
    dropped vector really has a lower-id cluster-mate above threshold
    (internal consistency against a brute-force pair scan) and (b) the
    cluster recall on the isotropic synthetic corpus — the worst case
    for any space partitioner — stays above the observed floor."""
    from pyspark.sql import functions as F

    from vector_search_service_spark.functions.embed import EMB_DIM
    from vector_search_service_spark.functions.vectors import (
        cosine_similarity_col,
        scoreable_vec_col,
    )
    from vector_search_service_spark.queries_dedup import (
        _SEMDEDUP_TH,
        q_semdedup_prune,
    )

    emb = (
        load_table(spark, SF_SMOKE, "embeddings")
        .withColumn("embedding", scoreable_vec_col(F.col("embedding"), EMB_DIM))
        .filter(F.col("embedding").isNotNull())
        .withColumn("v", F.transform(F.col("embedding"), lambda x: x.cast("double")))
        .select("vec_id", "v")
        .localCheckpoint(eager=False)
    )
    a = emb.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"))
    global_pairs = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("cos", cosine_similarity_col(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= _SEMDEDUP_TH)
        .select("ia", "ib")
        .localCheckpoint(eager=False)
    )
    n_global_dropped = global_pairs.select("ib").distinct().count()

    dropped = q_semdedup_prune(spark, SF_SMOKE).localCheckpoint(eager=False)
    n_dropped = dropped.count()
    assert n_dropped > 0

    # (a) every (dup_of, vec_id) pair the prune claims is a true
    # global near-dup pair
    claimed = dropped.select(F.col("dup_of").alias("ia"),
                             F.col("vec_id").alias("ib"))
    assert claimed.join(global_pairs, ["ia", "ib"], "left_anti").count() == 0

    # (b) cluster recall floor: 16 sign-LSH buckets on isotropic
    # vectors co-locate >=10% of true near-dup vectors (measured
    # ~17-25% at sf0.001/sf0.01; more planes/buckets trade recall
    # for smaller buckets)
    assert n_dropped >= 0.10 * n_global_dropped, (n_dropped, n_global_dropped)


def test_semdedup_multiprobe_superset_and_budget(spark):
    """The Hamming-1 probe tier's two contracts (docs/SCALE.md §12):
    (a) probe pairs ⊇ same-bucket pairs, so the multiprobe drop-id set
    is a superset of plain-B's and every claimed pair is a true global
    near-dup; (b) the pair budget is exactly (B+1)/2^B — structurally,
    the probe candidate count sits between plain-B and one probe per
    plane more, and at B=7 it must not exceed exhaustive B=4's count
    by more than the Hamming-1 overlap can explain (equal-budget
    claim, measured equal-or-better recall at sf1)."""
    from pyspark.sql import functions as F

    from vector_search_service_spark.functions.vectors import (
        cosine_similarity_col,
    )
    from vector_search_service_spark.queries_dedup import (
        _SEMDEDUP_MP_PLANES,
        _SEMDEDUP_TH,
        _semdedup_emb,
        _semdedup_multiprobe_plan,
        _semdedup_plan,
        q_semdedup_multiprobe,
    )

    mp = q_semdedup_multiprobe(spark, SF_SMOKE).localCheckpoint(eager=False)
    plain = _semdedup_plan(spark, SF_SMOKE, _SEMDEDUP_MP_PLANES).localCheckpoint(eager=False)
    assert mp.count() > 0

    # (a) superset at the drop-id level: probing only ADDS candidate
    # pairs, so no plain-B drop can disappear under multi-probe
    assert plain.join(mp, "vec_id", "left_anti").count() == 0

    # every claimed (dup_of, vec_id) pair is a true near-dup pair
    emb = (
        _semdedup_emb(spark, SF_SMOKE, _SEMDEDUP_MP_PLANES)
        .localCheckpoint(eager=False)
    )
    a = emb.select(F.col("vec_id").alias("ia"), F.col("vn").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("vn").alias("vb"))
    global_pairs = (
        a.crossJoin(b)
        .filter(F.col("ia") < F.col("ib"))
        .withColumn("cos", cosine_similarity_col(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= _SEMDEDUP_TH)
        .select("ia", "ib")
        .localCheckpoint(eager=False)
    )
    claimed = mp.select(F.col("dup_of").alias("ia"), F.col("vec_id").alias("ib"))
    assert claimed.join(global_pairs, ["ia", "ib"], "left_anti").count() == 0

    # (b) pair-budget arithmetic on the actual bucket histogram:
    # candidates(plain B) <= candidates(+Hamming-1 probes) and the
    # probe total never exceeds (B+1) x plain-B (each of the B flips
    # contributes at most one extra cell pairing per vector)
    hist = emb.groupBy("bucket").count()
    sizes = {r["bucket"]: r["count"] for r in hist.collect()}
    plain_cand = sum(c * (c - 1) // 2 for c in sizes.values())
    probe_cand = plain_cand
    for code, c in sizes.items():
        for i in range(_SEMDEDUP_MP_PLANES):
            other = sizes.get(code ^ (1 << i), 0)
            probe_cand += c * other  # each unordered cross-cell pair
    probe_cand = plain_cand + (probe_cand - plain_cand) // 2
    n = sum(sizes.values())
    expected_budget = (_SEMDEDUP_MP_PLANES + 1) / 2 ** _SEMDEDUP_MP_PLANES * n * (n - 1) / 2
    assert plain_cand <= probe_cand <= 3 * expected_budget, (
        plain_cand, probe_cand, expected_budget,
    )
    # and the multiprobe drop count can only meet or beat plain-B
    assert mp.count() >= plain.count()


def test_derive_n_planes_tracks_corpus_size():
    """B ≈ log2(n / target): holding rows-per-bucket constant keeps the
    quadratic bucket-local pair stage near-linear as n grows (SCALE.md
    §12). The default target (256) must reproduce the measured sweep's
    recall-favored tier at the sf1 corpus size, and the latency target
    (40) its efficiency point."""
    from vector_search_service_spark.operators.ann import derive_n_planes

    assert derive_n_planes(20_000) == 7            # the §12 B=7 tier
    assert derive_n_planes(20_000, target_bucket_rows=40) == 9  # §12 B=9
    # monotone in n, and each decade adds ~log2(10) ≈ 3.3 planes
    assert derive_n_planes(200_000) == 10
    assert derive_n_planes(2_000_000) == 13
    # clamps: tiny corpora never go below 2; 100 TB-scale never above 24
    assert derive_n_planes(0) == 2
    assert derive_n_planes(100) == 2
    assert derive_n_planes(10**14) == 24


def test_semdedup_auto_b_matches_explicit(spark):
    """n_planes=None derives B from the corpus count and must produce
    exactly the plan an explicit pin of that B produces (the registered
    entries keep their pins; None is the production path)."""
    from vector_search_service_spark.operators.ann import derive_n_planes
    from vector_search_service_spark.queries_dedup import _semdedup_plan
    from vector_search_service_spark.sources.tables import load_table

    n = load_table(spark, SF_SMOKE, "embeddings").count()
    b = derive_n_planes(n)
    auto = _semdedup_plan(spark, SF_SMOKE)
    explicit = _semdedup_plan(spark, SF_SMOKE, b)
    assert auto.schema == explicit.schema
    assert [r.asDict() for r in auto.collect()] == [
        r.asDict() for r in explicit.collect()
    ]


def test_derive_semdedup_threshold_random_pair_floor():
    """t = z(hits/n)/sqrt(dim): the cosine above which an isotropic
    corpus yields < `hits` random neighbors per vector. Must reproduce
    the hand-validated SCALE.md §13 setting (n=200k, dim=64 -> ~0.61),
    rise with n, fall with dim, and clamp."""
    from vector_search_service_spark.operators.ann import (
        derive_semdedup_threshold,
    )

    t = derive_semdedup_threshold(200_000, 64)
    assert 0.58 <= t <= 0.64, t        # the §13 sweep setting
    assert derive_semdedup_threshold(2_000_000, 64) > t   # rises with n
    assert derive_semdedup_threshold(200_000, 1024) < t   # falls with dim
    assert derive_semdedup_threshold(0, 64) == 0.1        # floor clamp
    assert derive_semdedup_threshold(10**30, 4) == 0.95   # cap clamp


def test_semdedup_auto_threshold_never_below_pin(spark):
    """threshold='auto' = max(registered pin, derived floor): at the
    tiny smoke corpus the floor may exceed the 0.3 pin — the auto plan
    must then be a SUBSET of the pinned plan (higher threshold only
    removes pairs), and with the pin passed explicitly the plans are
    identical."""
    from vector_search_service_spark.queries_dedup import (
        _SEMDEDUP_PLANES,
        _SEMDEDUP_TH,
        _semdedup_plan,
    )

    pinned = {r["vec_id"] for r in
              _semdedup_plan(spark, SF_SMOKE, _SEMDEDUP_PLANES).collect()}
    auto = {r["vec_id"] for r in
            _semdedup_plan(spark, SF_SMOKE, _SEMDEDUP_PLANES,
                           threshold="auto").collect()}
    assert auto <= pinned
    explicit = {r["vec_id"] for r in
                _semdedup_plan(spark, SF_SMOKE, _SEMDEDUP_PLANES,
                               threshold=_SEMDEDUP_TH).collect()}
    assert explicit == pinned


def test_semdedup_bucket_cap_viral(spark, tmp_path):
    """The viral-duplicate failure mode derive_n_planes cannot fix: a
    cluster of N identical vectors lands in ONE bucket at any B
    (identical vectors => identical sign pattern), so that bucket alone
    is quadratic. The bucket_cap bounds the lower-id pairing side to
    each bucket's cap smallest ids — per-bucket pairs become linear —
    while the flooded bucket's prefix IS the viral cluster's lowest
    ids, so the cluster still collapses: every copy except the first
    drops in the capped plan exactly as in the uncapped one."""
    import pyspark.sql.functions as F

    from vector_search_service_spark.operators.ann import derive_n_planes
    from vector_search_service_spark.queries_dedup import (
        _semdedup_emb,
        _semdedup_plan,
    )
    from vector_search_service_spark.sources.tables import load_table

    base = load_table(spark, SF_SMOKE, "embeddings")
    viral_vec = base.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    n_viral = 400
    viral = spark.createDataFrame(
        [(100_000 + i, viral_vec, 99) for i in range(n_viral)],
        base.schema,
    )
    out = str(tmp_path / "viral")
    base.unionByName(viral).coalesce(2).write.parquet(f"{out}/embeddings.parquet")

    n = base.count() + n_viral
    b = derive_n_planes(n)
    cap = 64

    uncapped = {r["vec_id"] for r in
                _semdedup_plan(spark, out, b, bucket_cap=None).collect()}
    capped = {r["vec_id"] for r in
              _semdedup_plan(spark, out, b, bucket_cap=cap).collect()}
    # the PRODUCTION DEFAULT is bucket_cap="auto" (derived 16x the
    # derive_n_planes target = 4096) — at this corpus no healthy
    # bucket exceeds it, so the default path is output-identical to
    # uncapped while the protection is armed (r9 verdict #3)
    auto = {r["vec_id"] for r in _semdedup_plan(spark, out, b).collect()}
    assert auto == uncapped

    viral_ids = {100_000 + i for i in range(n_viral)}
    # every viral copy except (at most) the first collapses in BOTH
    assert len(viral_ids - uncapped) <= 1
    assert len(viral_ids - capped) <= 1
    # capping only ever REMOVES pairs — never invents drops
    assert capped <= uncapped
    # and the capped lower side is genuinely bounded: <= cap rows per bucket
    emb = _semdedup_emb(spark, out, b)
    from pyspark.sql.window import Window

    w = Window.partitionBy("bucket").orderBy(F.col("vec_id").asc())
    a_rows = (
        emb.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap).count()
    )
    n_buckets = emb.select("bucket").distinct().count()
    assert a_rows <= cap * n_buckets
    # the viral bucket alone holds ~n_viral rows — without the cap its
    # pair count is quadratic (~n_viral^2/2); with it, <= cap * n_viral
    viral_bucket_size = (
        emb.join(emb.filter(F.col("vec_id") == 100_000).select("bucket"),
                 "bucket").count()
    )
    assert viral_bucket_size >= n_viral


def test_semdedup_cap_exact_dup_collapse_in_mixed_bucket(spark, tmp_path):
    """r9 advisor (low): the prefix-only cap lost exact-dup collapse
    when >= cap unrelated LOWER ids flood the viral cluster's bucket —
    no cluster member (nor its base) landed in the pairing side. The
    capped side now also retains each distinct vector value's minimum
    id per bucket, so the cluster's base is ALWAYS pairable and every
    copy collapses, whatever the bucket mix.

    Setup targets the exact failure: the viral value is base vec 459 —
    measured ISOLATED (max cosine to any other base vector 0.282 <
    the 0.3 threshold) — so the cluster's only >=threshold partners
    are its own members; copies get ids above every base id; cap is
    set below the count of lower unrelated ids in 459's bucket, so
    the bucket's cap-prefix contains NO cluster member. Prefix-only
    capping finds zero pairs for the cluster; the per-value-min
    retention must still collapse it onto 459."""
    import pyspark.sql.functions as F

    from vector_search_service_spark.queries_dedup import (
        _semdedup_emb,
        _semdedup_plan,
    )
    from vector_search_service_spark.sources.tables import load_table

    base = load_table(spark, SF_SMOKE, "embeddings")
    viral_vec = base.filter(F.col("vec_id") == 459).select("embedding").first()[0]
    n_viral = 120
    viral = spark.createDataFrame(
        [(500_000 + i, viral_vec, 99) for i in range(n_viral)], base.schema,
    )
    out = str(tmp_path / "mixed")
    base.unionByName(viral).coalesce(2).write.parquet(f"{out}/embeddings.parquet")

    b = 2  # few planes -> big mixed buckets with many lower unrelated ids
    emb = _semdedup_emb(spark, out, b)
    vb = emb.filter(F.col("vec_id") == 459).select("bucket").first()[0]
    n_lower_unrelated = emb.filter(
        (F.col("bucket") == vb) & (F.col("vec_id") < 459)
    ).count()
    cap = min(32, n_lower_unrelated)
    assert cap >= 8  # the prefix genuinely excludes every cluster member

    capped = {r["vec_id"] for r in
              _semdedup_plan(spark, out, b, bucket_cap=cap).collect()}
    viral_ids = {500_000 + i for i in range(n_viral)}
    # every copy collapses (onto 459, the retained per-value minimum)
    assert viral_ids <= capped
    # and the base survives: isolated below threshold from everything else
    assert 459 not in capped
