"""Property-based tests (hypothesis) for the algebraic core.

The reference ships no tests at all (SURVEY §5); beyond the oracle
differential and golden fixtures, the operators with algebraic
contracts get randomized-model checks: the upsert MERGE against a
dict-model of Postgres ``ON CONFLICT DO UPDATE`` with partial SET
lists, and two-phase global numbering against the single-window
definition. Examples are kept few and frames small — each example
runs real Spark jobs.
"""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover - hypothesis is baked into the image
    pytest.skip("hypothesis not installed", allow_module_level=True)

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shopify_db_spark.operators.numbering import global_row_numbers
from shopify_db_spark.operators.upsert import upsert

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# (key, value, frozen_value) rows; tight key range forces conflicts
_row = st.tuples(
    st.integers(min_value=0, max_value=6),
    st.integers(min_value=-50, max_value=50),
    st.integers(min_value=-50, max_value=50),
)
_frames = st.tuples(st.lists(_row, max_size=12), st.lists(_row, max_size=12))


def _model_upsert(existing: list, updates: list) -> dict:
    """Dict model of the MERGE: matched keys take the update's value
    but keep the old frozen column; the within-batch winner among
    duplicate update keys is the highest (v, f) — dedup_updates'
    descending sort over the non-key columns."""
    state = {}
    for k, v, f in existing:
        state[k] = (v, f)  # base is assumed key-unique (enforced below)
    winners: dict[int, tuple] = {}
    for k, v, f in updates:
        if k not in winners or (v, f) > winners[k]:
            winners[k] = (v, f)
    for k, (v, f) in winners.items():
        if k in state:
            state[k] = (v, state[k][1])  # frozen col keeps old value
        else:
            state[k] = (v, f)
    return state


@_SETTINGS
@given(_frames)
def test_upsert_matches_dict_model(spark, frames):
    existing_rows, update_rows = frames
    # base table must be key-unique (it is the accumulated state)
    seen = {}
    for k, v, f in existing_rows:
        seen[k] = (k, v, f)
    existing_rows = list(seen.values())

    schema = "k long, v long, f long"
    base = spark.createDataFrame(existing_rows or [], schema)
    upd = spark.createDataFrame(update_rows or [], schema)
    got = {
        r["k"]: (r["v"], r["f"])
        for r in upsert(base, upd, keys=["k"], frozen_cols=["f"]).collect()
    }
    assert got == _model_upsert(existing_rows, update_rows)


@_SETTINGS
@given(_frames)
def test_upsert_idempotent(spark, frames):
    """Applying the same (deduped) batch twice equals applying once —
    replayed ingest pages must be harmless."""
    existing_rows, update_rows = frames
    seen = {}
    for k, v, f in existing_rows:
        seen[k] = (k, v, f)
    schema = "k long, v long, f long"
    base = spark.createDataFrame(list(seen.values()) or [], schema)
    upd = spark.createDataFrame(update_rows or [], schema)
    once = upsert(base, upd, keys=["k"], frozen_cols=["f"])
    twice = upsert(once, upd, keys=["k"], frozen_cols=["f"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@_SETTINGS
@given(
    st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=60
    )
)
def test_global_row_numbers_matches_window(spark, ids):
    """Two-phase numbering must equal the single-window ROW_NUMBER
    for ANY key multiset (ties order arbitrarily in both forms, so
    keys are de-duplicated to keep the contract exact)."""
    ids = sorted(set(ids))
    df = spark.createDataFrame([(i,) for i in ids], "k long")
    got = global_row_numbers(df, ["k"], col_name="rn", start=7, num_partitions=4)
    want = df.withColumn(
        "rn", (F.lit(7) + F.row_number().over(Window.orderBy("k")) - 1).cast("long")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


# ---------------------------------------------------------------- #
# dedup-family algebraic contracts                                 #
# ---------------------------------------------------------------- #

_word = st.text(alphabet="abcdefg", min_size=1, max_size=5)
_doc_tokens = st.lists(_word, min_size=1, max_size=10)


@_SETTINGS
@given(docs=st.lists(_doc_tokens, min_size=1, max_size=4))
def test_simhash_is_set_semantic(spark, docs):
    """SimHash hashes the DISTINCT unigram set (doc_shingles
    distincts), so token order and repetition must not change the
    signature — the invariant that makes the sketch stable under
    re-chunking/re-serialization of the same content."""
    from shopify_db_spark.operators.dedup import simhash

    rows = []
    for i, toks in enumerate(docs):
        original = " ".join(toks)
        permuted_dup = " ".join(list(reversed(toks)) + toks)
        rows += [(2 * i, original), (2 * i + 1, permuted_dup)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sig = {r["doc_id"]: r["simhash"] for r in simhash(df, hash_family="md5").collect()}
    for i in range(len(docs)):
        assert sig[2 * i] == sig[2 * i + 1]


@_SETTINGS
@given(docs=st.lists(_doc_tokens, min_size=2, max_size=4))
def test_exact_dedup_normalization_invariance(spark, docs):
    """The exact-dedup fingerprint must identify texts that differ
    only in case/whitespace, and the keeper is always the minimum
    doc id of the group."""
    from shopify_db_spark.operators.dedup import exact_dedup

    rows = []
    for i, toks in enumerate(docs):
        original = " ".join(toks)
        noisy = ("  " + "   ".join(t.upper() for t in toks) + " \t ")
        rows += [(2 * i, original), (2 * i + 1, noisy)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = exact_dedup(df).collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in out}
    # every even id keeps its pair; group sizes total the corpus
    distinct_texts = {" ".join(t) for t in docs}
    assert sum(by_keep.values()) == len(rows)
    assert len(by_keep) == len(distinct_texts)
    for keep in by_keep:
        assert keep % 2 == 0, "keeper must be the lower (even) id of its pair"


@_SETTINGS
@given(docs=st.lists(_doc_tokens, min_size=2, max_size=5))
def test_prefix_filter_jaccard_is_complete(spark, docs):
    """Prefix filtering must reproduce brute-force Jaccard exactly
    for ANY corpus — the AllPairs completeness theorem, checked
    end-to-end (n=1 unigram shingles so the model is trivial)."""
    from shopify_db_spark.operators.dedup import prefix_filter_jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in prefix_filter_jaccard_pairs(df, n=1, threshold=0.4).collect()
    }
    sets = {i: set(toks) for i, toks in enumerate(docs)}
    import itertools

    want = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        jac = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
        if jac >= 0.4:
            want[(a, b)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@_SETTINGS
@given(
    posting=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # doc
            st.integers(min_value=0, max_value=7),   # term index
            st.integers(min_value=1, max_value=4),   # tf
        ),
        min_size=2,
        max_size=25,
    )
)
def test_sparse_cosine_matches_numpy_model(spark, posting):
    """sparse_cosine_topk with an unreachable df_cap must equal the
    dense numpy cosine for any posting multiset (duplicates
    collapse by max — construction detail of the strategy)."""
    import numpy as np

    from shopify_db_spark.operators.similarity import sparse_cosine_topk

    cells = {}
    for doc, term, tf in posting:
        cells[(doc, term)] = max(cells.get((doc, term), 0), tf)
    rows = [(d, f"t{t}", tf) for (d, t), tf in cells.items()]
    df = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    got = {
        (r["doc_id"], r["neighbor_id"]): r["cosine"]
        for r in sparse_cosine_topk(df, k=100, df_cap=10_000).collect()
    }
    docs = sorted({d for d, _ in cells})
    vecs = {
        d: np.array([cells.get((d, t), 0) for t in range(8)], dtype=float)
        for d in docs
    }
    for a in docs:
        for b in docs:
            if a == b:
                continue
            dot = float(vecs[a] @ vecs[b])
            if dot == 0.0:
                assert (a, b) not in got
            else:
                want = dot / (
                    float(np.sqrt(vecs[a] @ vecs[a]))
                    * float(np.sqrt(vecs[b] @ vecs[b]))
                )
                assert abs(got[(a, b)] - want) < 1e-9
