"""Round-14 behavioral pins: the best-fit-decreasing packer and the
packer-comparison report."""

from __future__ import annotations

from collections import defaultdict

from clickstreamtoclickhouse_spark import plans

from .conftest import SF_DIR

DOC_SCHEMA = "doc_id long, text string, source string"


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(rows, DOC_SCHEMA).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )


def _doc(i, n_words):
    return (i, " ".join(f"w{j}" for j in range(n_words)), "s")


def test_bfd_planted_beats_greedy_padding(spark, tmp_path):
    """Planted single-shard instance (doc_ids ≡ 0 mod 16, so all land
    in shard 0) with lengths 1200,1200,1200,800,800,800 against the
    2048 bin: greedy arrival order straddles (bins land at
    2400/2000/1600 tokens -> overflow 352, padding 48 + 448 = 496),
    while BFD pairs each 1200 with an 800 into three 2000-token bins
    — padding 144, overflow 0. Exact assignments asserted, not just
    the totals."""
    _write_docs(
        spark,
        tmp_path,
        [_doc(i * 16, n) for i, n in enumerate([1200, 1200, 1200, 800, 800, 800])],
    )
    bfd = plans.QUERIES["sequence_packing_bfd"](spark, str(tmp_path)).collect()
    assert {r.shard for r in bfd} == {0}
    by_bin = defaultdict(list)
    for r in bfd:
        by_bin[r.bin].append(r.n_tokens)
    assert sorted(map(sorted, by_bin.values())) == [[800, 1200]] * 3
    rows = {
        r.packer: r
        for r in plans.QUERIES["packing_efficiency_report"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows["bfd"].padding_tokens == 144
    assert rows["bfd"].overflow_tokens == 0
    assert rows["greedy"].padding_tokens == 496
    assert rows["greedy"].overflow_tokens == 352
    assert rows["bfd"].fill_rate > rows["greedy"].fill_rate


def test_bfd_conservation_and_capacity_invariants(spark):
    """On the real corpus: BFD permutes docs across bins but never
    loses one (per-shard doc sets equal greedy's), a BFD bin only
    exceeds capacity when a single oversized doc opened it (the
    overflow-bin rule), and total waste (padding + overflow) must not
    exceed the greedy packer's — the entire reason the second packer
    exists."""
    from clickstreamtoclickhouse_spark.plans.ext import _PACK_BIN

    greedy = plans.QUERIES["sequence_packing"](spark, SF_DIR).collect()
    bfd = plans.QUERIES["sequence_packing_bfd"](spark, SF_DIR).collect()
    g_docs, b_docs = defaultdict(set), defaultdict(set)
    for r in greedy:
        g_docs[r.shard].add((r.doc_id, r.n_tokens))
    loads = defaultdict(lambda: [0, 0])
    for r in bfd:
        b_docs[r.shard].add((r.doc_id, r.n_tokens))
        l = loads[(r.shard, r.bin)]
        l[0] += r.n_tokens
        l[1] += 1
    assert g_docs == b_docs
    for (shard, b), (tok, n) in loads.items():
        if tok > _PACK_BIN:
            assert n == 1, (shard, b, tok, n)
    rows = plans.QUERIES["packing_efficiency_report"](spark, SF_DIR).collect()
    waste = defaultdict(int)
    for r in rows:
        waste[r.packer] += r.padding_tokens + r.overflow_tokens
    assert waste["bfd"] <= waste["greedy"]


def test_doremi_upweights_high_excess_source(spark, tmp_path):
    """Planted reducible-loss domain: source 'rep' docs are strict
    two-word alternations, so the bigram reference model recovers
    almost all the likelihood the unigram proxy loses (excess ~2.6);
    source 'ctrl' docs draw hash-shuffled words from a small frequent
    vocabulary — its unigram probabilities are already near the
    bigram model's conditional ones, so excess is small (~0.15).
    (Plant design note: rare-word controls do NOT work — add-one
    bigram smoothing floors at 1/(c+V), which beats a rare word's
    unigram MLE whenever corpus size >> vocabulary, inflating the
    control's excess.) DoReMi must upweight 'rep' past both its
    baseline share and the uniform mixture, with weights summing
    to 1."""
    import hashlib

    rep = " ".join(["alpha beta"] * 100)

    def ctrl_doc(i):
        return " ".join(
            f"v{int(hashlib.md5(f'{i}-{j}'.encode()).hexdigest(), 16) % 8}"
            for j in range(512)
        )

    docs = [(i, rep + f" tail{i} end{i}", "rep") for i in range(3)] + [
        (100 + i, ctrl_doc(i), "ctrl") for i in range(7)
    ]
    _write_docs(spark, tmp_path, docs)
    rows = {
        r.source: r
        for r in plans.QUERIES["doremi_domain_weights"](
            spark, str(tmp_path)
        ).collect()
    }
    assert set(rows) == {"rep", "ctrl"}
    assert rows["rep"].excess_score > rows["ctrl"].excess_score + 1.0
    assert rows["rep"].baseline_share == 0.3
    assert rows["rep"].weight > 0.5 > rows["ctrl"].weight
    assert rows["rep"].weight > rows["rep"].baseline_share
    assert rows["rep"].rank == 1
    assert abs(rows["rep"].weight + rows["ctrl"].weight - 1.0) < 1e-4
    # smoothing floor: even a low-excess domain keeps >= c/K weight
    assert rows["ctrl"].weight >= 0.01 / 2 - 1e-9
