"""Round-8 curation operators: chunk-level dedup, OOV coverage,
preference pairs, split contamination, epoch-capped mixture
allocation. Oracle parity is covered by test_oracle_parity's
parametrization; these pin the planted-positive/negative semantics
and the invariants the oracles can't see (both engines could share a
bug — the hand-computed checks here break that symmetry)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from clickstreamtoclickhouse_spark import plans
from clickstreamtoclickhouse_spark.plans.curation import (
    _COPY_OFFSET,
    _EPOCH_CAP,
    PREF_PER_SOURCE,
    VOCAB_K,
)

from .conftest import SF_DIR


def test_chunk_dedup_planted_copies(spark):
    rows = plans.QUERIES["chunk_dedup"](spark, SF_DIR).collect()
    assert rows, "no chunk groups"
    # every chunk exists at least twice (the id-offset copy corpus)
    # and the keeper is always an ORIGINAL id, never a copy
    assert all(r.n_copies >= 2 for r in rows)
    assert all(r.keeper_doc < _COPY_OFFSET for r in rows)
    # aligned copies: the keeper start is a stride-multiple
    from clickstreamtoclickhouse_spark.plans.llmprep import CHUNK_STRIDE

    assert all(r.keeper_start % CHUNK_STRIDE == 0 for r in rows)


def test_chunk_dedup_groups_cover_doc_chunking(spark):
    # sum of copies over groups == total chunk rows of the doubled
    # corpus == 2x the doc_chunking row count on the raw table
    groups = plans.QUERIES["chunk_dedup"](spark, SF_DIR)
    total = groups.agg(F.sum("n_copies")).collect()[0][0]
    base = plans.QUERIES["doc_chunking"](spark, SF_DIR).count()
    assert total == 2 * base


def test_oov_rate_invariants_and_vocab_membership(spark):
    rows = plans.QUERIES["oov_rate_by_lang"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_covered <= r.n_tokens
        assert 0.0 <= r.oov_rate <= 1.0
    # hand-computed contrast: tokens drawn from the global top-K must
    # be covered — recompute the vocab independently and spot-check
    d = plans.load(spark, SF_DIR, "documents")
    toks = d.filter(F.length(F.trim("text")) > 0).select(
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("w")
    )
    top1 = (
        toks.groupBy("w").count().orderBy(F.desc("count"), "w").limit(1)
    ).collect()[0]
    # the single most frequent token alone bounds coverage from below
    total = toks.count()
    covered = sum(r.n_covered for r in rows)
    assert covered >= top1["count"]
    assert sum(r.n_tokens for r in rows) == total
    assert covered <= total


def test_preference_pairs_semantics(spark):
    df = plans.QUERIES["preference_pairs"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.chosen_id != r.rejected_id
        assert r.margin > 0
        assert 1 <= r.pair_rank <= PREF_PER_SOURCE
    # per-source cardinality bound
    per_src = df.groupBy("source").count().collect()
    assert all(r["count"] <= PREF_PER_SOURCE for r in per_src)
    # hand-checked extreme: rank-1 chosen is the argmax quality doc of
    # its source (tie-break min doc_id), rank-1 rejected the argmin
    # (tie-break max doc_id)
    from clickstreamtoclickhouse_spark.functions import text as tx

    d = plans.load(spark, SF_DIR, "documents")
    scored = d.select(
        "doc_id", "source", tx.quality_score(F.col("text")).alias("q")
    ).collect()
    by_src = {}
    for row in scored:
        by_src.setdefault(row.source, []).append((row.q, row.doc_id))
    r1 = {r.source: (r.chosen_id, r.rejected_id) for r in rows if r.pair_rank == 1}
    for src, (chosen, rejected) in r1.items():
        qs = by_src[src]
        best = max(qs, key=lambda t: (t[0], -t[1]))
        worst = min(qs, key=lambda t: (t[0], -t[1]))
        assert chosen == best[1], src
        assert rejected == worst[1], src


def test_split_contamination_finds_planted_leaks(spark):
    rows = plans.QUERIES["split_contamination"](spark, SF_DIR).collect()
    # the copy corpus guarantees cross-split identical texts at this
    # corpus size (each copy re-hashes into train with p=0.8)
    assert rows, "planted contamination not detected"
    assert {r.split for r in rows} <= {"val", "test"}
    for r in rows:
        assert r.n_leaked_docs >= r.n_shared_fps >= 1
    # negative control: every leaked fingerprint must really exist in
    # train — recompute the split independently
    from clickstreamtoclickhouse_spark.plans.curation import _copy_corpus
    from clickstreamtoclickhouse_spark.util import portable_id_hash

    corpus = _copy_corpus(plans.load(spark, SF_DIR, "documents"))
    b = F.pmod(portable_id_hash(F.col("doc_id")), F.lit(100))
    t = corpus.select(
        F.md5("text").alias("fp"),
        F.when(b < 80, "train").otherwise("eval").alias("side"),
    )
    train = {r.fp for r in t.filter("side = 'train'").distinct().collect()}
    ev = {r.fp for r in t.filter("side != 'train'").distinct().collect()}
    assert len(train & ev) >= sum(r.n_shared_fps for r in rows) / 2


def test_mixture_epoch_allocation_invariants(spark):
    rows = plans.QUERIES["mixture_epoch_allocation"](spark, SF_DIR).collect()
    assert rows
    budget = 2 * sum(r.n_tokens for r in rows)
    for r in rows:
        assert r.allocated_tokens <= _EPOCH_CAP * r.n_tokens
        assert r.epochs <= _EPOCH_CAP + 1e-9
        assert (r.at_cap == 1) == (
            r.allocated_tokens >= _EPOCH_CAP * r.n_tokens
        )
        # the waterfall only ever adds tokens
        assert r.allocated_tokens >= min(
            r.target_tokens, _EPOCH_CAP * r.n_tokens
        )
    # never allocates (meaningfully) past the budget: floor()ed shares
    # keep the sum within one token per language of B
    assert sum(r.allocated_tokens for r in rows) <= budget + len(rows)
    # weights form a distribution
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4
