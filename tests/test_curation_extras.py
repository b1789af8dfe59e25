"""Cross-checks between curation-tier variants: the Bloom-style
membership filter (q75) against the exact shingle-set join (q53) —
at smoke scale the benchmark shingle count is far below the Bloom
capacity, so the two must agree exactly (any diff = false positives
beyond the documented envelope, or a hashing bug)."""

from __future__ import annotations

from shopify_db_spark.plans import load_all
from tests.conftest import SF_SMOKE


def test_bloom_matches_exact_contamination(spark):
    qs = load_all()
    exact = {
        r["doc_id"]: (r["n_shingles"], r["n_contaminated"])
        for r in qs["q53_contamination"].fn(spark, SF_SMOKE).collect()
    }
    bloom = {
        r["doc_id"]: (r["n_shingles"], r["n_flagged"])
        for r in qs["q75_bloom_decontamination"].fn(spark, SF_SMOKE).collect()
    }
    assert set(exact) == set(bloom)
    assert exact == bloom


def test_count_min_sketch_merges_by_addition(spark):
    """The CMS scale contract: sketches built on disjoint corpus
    shards, merged by per-cell addition, must equal the sketch built
    on the union — and point estimates from the merged sketch still
    dominate exact counts."""
    from pyspark.sql import functions as F

    from shopify_db_spark.functions.text import md5_bucket

    rows_a = [(1, "a b a c"), (2, "b c d")]
    rows_b = [(3, "a d d e"), (4, "e e b a")]
    D, W = 3, 4

    def cms(rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        counts = (
            df.select(F.explode(F.split("text", " ")).alias("term"))
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = {}
        for j in range(D):
            cells = (
                counts.select(
                    md5_bucket(F.col("term"), f"cms{j}", W).alias("b"),
                    "n",
                )
                .groupBy("b")
                .agg(F.sum("n").alias("n"))
                .collect()
            )
            for r in cells:
                out[(j, r["b"])] = out.get((j, r["b"]), 0) + r["n"]
        return out

    merged = cms(rows_a)
    for k, v in cms(rows_b).items():
        merged[k] = merged.get(k, 0) + v
    full = cms(rows_a + rows_b)
    assert merged == full
    # point estimates dominate exact counts
    exact = {}
    for _i, text in rows_a + rows_b:
        for t in text.split():
            exact[t] = exact.get(t, 0) + 1
    import hashlib

    for term, n in exact.items():
        ests = []
        for j in range(D):
            h = int(
                hashlib.md5(f"cms{j}:{term}".encode()).hexdigest()[:8], 16
            ) % W
            ests.append(full.get((j, h), 0))
        assert min(ests) >= n


def test_lexical_rarity_orders_gibberish_above_boilerplate(spark):
    """q103 semantics on a crafted corpus: a doc of unique gibberish
    (every token hapax) must sit BELOW a doc of corpus-dominant
    boilerplate on mean frequency decile (decile 1 = rarest) and
    above it on hapax share; the exact-rational outputs stay in
    range."""
    from shopify_db_spark.plans.textops import lexical_rarity

    boiler = "the quick brown fox " * 5  # tokens repeated corpus-wide
    rows = [(i, boiler) for i in range(8)]
    rows.append((100, "zxqv wplk mnbt yhgr qazx"))  # all hapax
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in lexical_rarity(docs).collect()}
    assert set(out) == {*range(8), 100}
    g, b = out[100], out[0]
    assert g["hapax_share"] == 1.0 and b["hapax_share"] == 0.0
    assert g["mean_freq_decile"] < b["mean_freq_decile"]
    for r in out.values():
        assert 1.0 <= r["mean_freq_decile"] <= 10.0
        assert 0.0 <= r["hapax_share"] <= 1.0
        assert r["n_tokens"] > 0


def test_cluster_split_eliminates_leakage(spark):
    """The q136→q137 contract: a per-document hash split leaks
    near-dup pairs across the boundary (q136 finds some on the
    smoke corpus), while the cluster-atomic split (q137) leaks NONE
    of the pairs its clustering is built from — every simhash pair
    lands on one side."""
    from pyspark.sql import functions as F

    from shopify_db_spark.operators import dedup as DD
    from shopify_db_spark.plans.curation import q137_cluster_split
    from shopify_db_spark.sources.tables import load_table

    split = q137_cluster_split(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = DD.simhash_pairs(docs, max_hamming=4, hash_family="md5")
    crossings = (
        pairs.join(
            split.select(
                F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
            ),
            "doc_a",
        )
        .join(
            split.select(
                F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
            ),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert crossings == 0
    # and the split itself is total + deterministic
    assert split.count() == docs.count()


def test_length_histogram_merges_by_addition(spark):
    """The q139 scale contract: log-histogram registers built on
    disjoint corpus shards, merged by per-bucket addition, must equal
    the histogram built on the union — and the sketch's quantile
    bucket bounds must enclose the exact inverse-CDF quantile."""
    from pyspark.sql import functions as F

    from shopify_db_spark.functions import text as TX
    from shopify_db_spark.plans import load_all
    from shopify_db_spark.plans.textops import length_histogram
    from shopify_db_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    lens = docs.select(
        "doc_id",
        "source",
        F.size(TX.tokens(F.col("text"))).cast("long").alias("n_tok"),
    )
    full = {
        (r["source"], r["bucket"]): r["cnt"]
        for r in length_histogram(lens, ["source"]).collect()
    }
    h1 = length_histogram(lens.filter("doc_id % 2 = 0"), ["source"])
    h2 = length_histogram(lens.filter("doc_id % 2 = 1"), ["source"])
    merged = {
        (r["source"], r["bucket"]): r["cnt"]
        for r in h1.unionByName(h2)
        .groupBy("source", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    assert merged == full

    rows = (
        load_all()["q139_length_quantile_sketch"].fn(spark, SF_SMOKE).collect()
    )
    assert rows
    assert all(r["sketch_lo"] <= r["exact_q"] <= r["sketch_hi"] for r in rows)


def test_session_artifact_sweeps_stale_and_memoizes(spark):
    """plans/artifacts.py contract (round-10 advice → round-11
    generalization): EVERY stale-session entry is dropped on access
    (not just the re-accessed key), a warm hit returns the pinned
    frame without calling build, and eviction forces a rebuild."""
    from shopify_db_spark.plans import artifacts as A

    class _DeadSession:
        @property
        def sparkContext(self):  # mimics a stopped/py4j-less session
            raise RuntimeError("stopped")

    name = "test_sweep_artifact"
    A._MEMOS.pop(name, None)
    memo = A._MEMOS.setdefault(name, {})
    memo[(123, "/other/sf")] = (_DeadSession(), None)

    got = A.session_artifact(
        name, spark, "/sf/a", lambda: spark.range(3).toDF("id")
    )
    assert (123, "/other/sf") not in A._MEMOS[name]  # swept, other key
    assert got.count() == 3

    def boom():
        raise AssertionError("build called on a warm hit")

    again = A.session_artifact(name, spark, "/sf/a", boom)
    assert again is got

    A.evict(name, spark, "/sf/a")
    rebuilt = A.session_artifact(
        name, spark, "/sf/a", lambda: spark.range(5).toDF("id")
    )
    assert rebuilt is not got and rebuilt.count() == 5
    A._MEMOS.pop(name, None)


def test_evict_session_retires_a_live_sessions_dirs(spark):
    """Round-12 lifecycle API: a long-lived server session cycling
    many sf_dirs retires a dir's artifacts with evict_session —
    scoped to that dir, then to the whole session — without touching
    entries owned by OTHER sessions."""
    from shopify_db_spark.plans import artifacts as A

    names = ("test_evict_a", "test_evict_b")
    for n in names:
        A._MEMOS.pop(n, None)
        for d in ("/sf/one", "/sf/two"):
            A.session_artifact(n, spark, d, lambda: spark.range(2).toDF("id"))

    # another owner's entry must survive this session's evictions
    other = object()
    A._MEMOS[names[0]][(id(other), "/sf/one")] = (other, None)

    assert A.evict_session(spark, "/sf/one") == 2  # one dir, both names
    assert (id(spark), "/sf/one") not in A._MEMOS[names[0]]
    assert (id(spark), "/sf/two") in A._MEMOS[names[1]]
    assert (id(other), "/sf/one") in A._MEMOS[names[0]]
    A._MEMOS[names[0]].pop((id(other), "/sf/one"))  # before sweep runs

    calls = {"n": 0}

    def rebuild():
        calls["n"] += 1
        return spark.range(4).toDF("id")

    again = A.session_artifact(names[0], spark, "/sf/one", rebuild)
    assert calls["n"] == 1 and again.count() == 4  # cold rebuild after dir retire

    # whole-session retire: other tests in the suite may have left
    # REAL artifacts owned by this shared session, so count what the
    # session owns rather than assuming only this test's entries
    owned = sum(
        1
        for memo in A._MEMOS.values()
        for (_key, (owner, _df)) in memo.items()
        if owner is spark
    )
    assert owned >= 3  # /sf/two pair + the rebuild at minimum
    assert A.evict_session(spark) == owned
    assert A.evict_session(spark) == 0
    for n in names:
        A._MEMOS.pop(n, None)


def test_q162_doc_novelty_invariants(spark):
    """q162 structural invariants on the smoke corpus: one row per
    doc with >= 1 shingle; n_unique <= n_shingles; Σ n_unique equals
    the number of df==1 shingles corpus-wide (the join-free owner
    trick is exactly a partition of the unique shingles); and the
    quantized ratio is the floor formula recomputed in python."""
    from pyspark.sql import functions as F

    from shopify_db_spark.plans.curation import _Q162_SCALE, q162_doc_novelty
    from shopify_db_spark.functions import text as TX
    from shopify_db_spark.sources.tables import load_table

    out = q162_doc_novelty(spark, SF_SMOKE).toPandas()
    docs = load_table(spark, SF_SMOKE, "documents")
    assert len(out) == docs.count()  # tokens() yields >= 1 shingle per doc
    assert (out.n_unique <= out.n_shingles).all()
    assert (out.novelty_q20 == out.n_unique * _Q162_SCALE // out.n_shingles).all()

    sh = (
        docs.select("doc_id", TX.tokens(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, greatest(size(t) - 2, 1)), "
                    "i -> concat_ws(' ', slice(t, i, 3)))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    n_df1 = (
        sh.groupBy("shingle")
        .count()
        .filter(F.col("count") == 1)
        .count()
    )
    assert int(out.n_unique.sum()) == n_df1
