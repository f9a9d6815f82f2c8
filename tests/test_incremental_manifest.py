"""Round-14 capstone pins: the incremental corpus-build manifest
(streaming/manifest.py) — batch equivalence, exactly-once mid-stream
replay, crash-between-commits recovery, the quota composition, and
the readStream driver. The sf0.01 driver-scale equivalence is pinned
separately by the registered ``incremental_corpus_build_manifest``
sharing the batch manifest's oracle in the parity mirror."""

from __future__ import annotations

import json as _json

import pytest
from pyspark.sql import functions as F

from clickstreamtoclickhouse_spark import plans
from clickstreamtoclickhouse_spark.functions import text as tx
from clickstreamtoclickhouse_spark.streaming import manifest as im

from .conftest import SF_DIR


def _bench_grams(spark, docs, n=5):
    return (
        docs.filter(
            (F.col("doc_id") % 25 == 0)
            & (F.length(F.trim(F.col("text"))) > 0)
        )
        .select(
            F.explode(
                F.array_distinct(
                    tx._ngrams(tx.words(F.lower(F.col("text"))), n)
                )
            ).alias("gram")
        )
        .distinct()
        .localCheckpoint(eager=True)
    )


def _id_range_batches(docs, n_batches=3):
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    step = mx // n_batches + 1
    cuts = [i * step for i in range(n_batches)] + [mx + 1]
    return [
        docs.filter(
            (F.col("doc_id") >= cuts[i]) & (F.col("doc_id") < cuts[i + 1])
        )
        for i in range(n_batches)
    ]


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_incremental_equals_batch(spark, tmp_path):
    """The equivalence pin: three ascending doc_id-range micro-batches
    through the incremental ingest, finalized, must equal the batch
    corpus_build_manifest row-for-row (also verified at sf0.01 and
    sf0.1 during development; the registered query pins sf0.01 under
    the driver's hash gate every run)."""
    docs = plans.load(spark, SF_DIR, "documents")
    bg = _bench_grams(spark, docs)
    tables = im.ManifestTables(str(tmp_path / "m"))
    for i, b in enumerate(_id_range_batches(docs)):
        im.manifest_batch_ingest(spark, tables, b, i, bg)
    inc = _rows(im.incremental_manifest_finalize(spark, tables))
    bat = _rows(plans.QUERIES["corpus_build_manifest"](spark, SF_DIR))
    assert inc == bat and len(inc) > 0


def test_midstream_replay_is_exactly_once(spark, tmp_path):
    """At-least-once delivery: batch 1 is delivered TWICE (same
    batch_id — the foreachBatch replay contract). The txlog
    idempotence token must skip every one of the replayed batch's
    table commits: no duplicate corpus rows, no duplicate index rows,
    and the finalized manifest still equals the batch manifest."""
    docs = plans.load(spark, SF_DIR, "documents")
    bg = _bench_grams(spark, docs)
    tables = im.ManifestTables(str(tmp_path / "m"))
    batches = _id_range_batches(docs)
    im.manifest_batch_ingest(spark, tables, batches[0], 0, bg)
    im.manifest_batch_ingest(spark, tables, batches[1], 1, bg)
    n_corpus = tables.corpus.read(spark).count()
    n_hashes = tables.hashes.read(spark).count()
    v_before = tables.corpus.latest_version()
    # the replay: identical payload, identical batch_id
    im.manifest_batch_ingest(spark, tables, batches[1], 1, bg)
    assert tables.corpus.read(spark).count() == n_corpus
    assert tables.hashes.read(spark).count() == n_hashes
    assert tables.corpus.latest_version() == v_before  # commit skipped
    im.manifest_batch_ingest(spark, tables, batches[2], 2, bg)
    inc = _rows(im.incremental_manifest_finalize(spark, tables))
    bat = _rows(plans.QUERIES["corpus_build_manifest"](spark, SF_DIR))
    assert inc == bat


def test_crash_between_commits_recovers(spark, tmp_path):
    """A crash AFTER the band/hash index commits but BEFORE the corpus
    commit (the worst interleaving: indexes already contain the
    batch). On redelivery the screens read strictly-pre-batch state
    (batch_id < k), so the admission decision is recomputed
    identically; the already-applied index commits are skipped by
    their token and only the missing corpus commit lands — no
    double-admission, no self-collision, batch equivalence intact."""
    docs = plans.load(spark, SF_DIR, "documents")
    bg = _bench_grams(spark, docs)
    tables = im.ManifestTables(str(tmp_path / "m"))
    batches = _id_range_batches(docs)
    im.manifest_batch_ingest(spark, tables, batches[0], 0, bg)

    boom = RuntimeError("simulated crash before corpus commit")
    orig_append = tables.corpus.append

    def crashing_append(df, *a, **k):
        raise boom

    tables.corpus.append = crashing_append
    with pytest.raises(RuntimeError):
        im.manifest_batch_ingest(spark, tables, batches[1], 1, bg)
    tables.corpus.append = orig_append
    # indexes committed batch 1, corpus did not
    assert tables.hashes.read(spark).filter("batch_id = 1").count() > 0
    assert tables.bands.read(spark).filter("batch_id = 1").count() > 0
    assert tables.corpus.read(spark).filter("batch_id = 1").count() == 0
    # redelivery completes the batch exactly once
    im.manifest_batch_ingest(spark, tables, batches[1], 1, bg)
    assert tables.corpus.read(spark).filter("batch_id = 1").count() > 0
    h1 = tables.hashes.read(spark).filter("batch_id = 1").count()
    im.manifest_batch_ingest(spark, tables, batches[2], 2, bg)
    assert tables.hashes.read(spark).filter("batch_id = 1").count() == h1
    inc = _rows(im.incremental_manifest_finalize(spark, tables))
    bat = _rows(plans.QUERIES["corpus_build_manifest"](spark, SF_DIR))
    assert inc == bat


def test_quota_composition(spark, tmp_path):
    """budget_tokens composes the streaming_source_quota contract onto
    the manifest pipeline: per batch, candidates are admitted in
    contiguous doc_id-prefix order per source against (ledger spent +
    in-batch cumulative) <= budget; the ledger equals the admitted
    token sums and never exceeds the budget. Expected admissions are
    simulated driver-side from the UNQUOTAED run's corpus store."""
    docs = plans.load(spark, SF_DIR, "documents")
    bg = _bench_grams(spark, docs)
    batches = _id_range_batches(docs)

    base = im.ManifestTables(str(tmp_path / "base"))
    for i, b in enumerate(batches):
        im.manifest_batch_ingest(spark, base, b, i, bg)
    store = (
        base.corpus.read(spark)
        .select("doc_id", "source", "n_tokens", "batch_id")
        .collect()
    )
    budget = max(r.n_tokens for r in store) * 2  # forces partial cuts

    expected: set[int] = set()
    spent: dict[str, int] = {}
    for k in sorted({r.batch_id for r in store}):
        cum: dict[str, int] = {}
        add: dict[str, int] = {}
        for r in sorted(
            (r for r in store if r.batch_id == k),
            key=lambda r: (r.source, r.doc_id),
        ):
            cum[r.source] = cum.get(r.source, 0) + r.n_tokens
            if spent.get(r.source, 0) + cum[r.source] <= budget:
                expected.add(r.doc_id)
                add[r.source] = add.get(r.source, 0) + r.n_tokens
        for s, v in add.items():
            spent[s] = spent.get(s, 0) + v
    assert expected and len(expected) < len(store)  # quota actually bites

    qt = im.ManifestTables(str(tmp_path / "q"))
    for i, b in enumerate(batches):
        im.manifest_batch_ingest(
            spark, qt, b, i, bg, budget_tokens=budget
        )
    got = {r.doc_id for r in qt.corpus.read(spark).collect()}
    assert got == expected
    ledger = {
        r.source: r.total
        for r in qt.ledger.read(spark)
        .groupBy("source")
        .agg(F.sum("spent_tokens").alias("total"))
        .collect()
    }
    admitted_sums = {
        s: sum(
            r.n_tokens
            for r in store
            if r.source == s and r.doc_id in expected
        )
        for s in {r.source for r in store}
    }
    for s, v in ledger.items():
        assert v == admitted_sums[s]
        assert v <= budget


def test_streaming_manifest_ingest(spark, tmp_path):
    """The readStream driver end-to-end: the same corpus delivered as
    two json landing files (ascending doc_id, one file per
    micro-batch) through streaming_manifest_ingest must finalize to
    the batch manifest's rows, with the benchmark gram set built once
    from the parquet documents at bench_dir."""
    docs = plans.load(spark, SF_DIR, "documents")
    rows = (
        docs.select("doc_id", "source", "text")
        .orderBy("doc_id")
        .collect()
    )
    mid = rows[len(rows) // 2].doc_id
    landing = tmp_path / "landing"
    landing.mkdir()

    def write_file(name, rs):
        with open(landing / name, "w") as f:
            for r in rs:
                f.write(
                    _json.dumps(
                        {
                            "doc_id": r.doc_id,
                            "source": r.source,
                            "text": r.text,
                        }
                    )
                    + "\n"
                )

    write_file("b0.json", [r for r in rows if r.doc_id <= mid])
    write_file("b1.json", [r for r in rows if r.doc_id > mid])
    stream = (
        spark.readStream.schema("doc_id long, source string, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(landing))
    )
    root = str(tmp_path / "m")
    q = im.streaming_manifest_ingest(
        stream,
        root,
        f"{SF_DIR}/documents.parquet",
        str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    tables = im.ManifestTables(root)
    assert tables.corpus.read(spark).select("batch_id").distinct().count() == 2
    inc = _rows(im.incremental_manifest_finalize(spark, tables))
    bat = _rows(plans.QUERIES["corpus_build_manifest"](spark, SF_DIR))
    assert inc == bat


def test_registered_incremental_query_matches_batch(spark):
    """The registered driver-gate form (session-cached, 3 id-range
    batches over a scratch txlog root) returns the batch manifest's
    rows, and the second call serves the session cache."""
    from clickstreamtoclickhouse_spark.plans.ext import (
        _INCR_MANIFEST_CACHE,
    )

    inc = _rows(
        plans.QUERIES["incremental_corpus_build_manifest"](spark, SF_DIR)
    )
    bat = _rows(plans.QUERIES["corpus_build_manifest"](spark, SF_DIR))
    assert inc == bat
    app_id = spark.sparkContext.applicationId
    cached = _INCR_MANIFEST_CACHE.get((app_id, SF_DIR))
    assert cached is not None
    again = plans.QUERIES["incremental_corpus_build_manifest"](
        spark, SF_DIR
    )
    assert again is cached
