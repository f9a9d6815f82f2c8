"""Property tests (SURVEY.md §5.3): roundtrip/idempotency invariants.

Hypothesis drives the pure-Python naming functions; the Spark-path
invariants (flatten stability, dedup idempotency, schema-evolution
monotonicity, try_cast semantics) run one seeded randomized batch per
test — one Spark job instead of a job per hypothesis example.
"""

from __future__ import annotations

import json
import random
import string

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from clickstreamtoclickhouse_spark.naming import clean_key, decamelize, normalize_key
from clickstreamtoclickhouse_spark.operators import coerce, dedup
from clickstreamtoclickhouse_spark.pipeline import EventPipeline
from clickstreamtoclickhouse_spark.sinks.parquet_sink import ParquetWarehouse
from clickstreamtoclickhouse_spark.sources.flatten import flatten

ident = st.text(
    alphabet=string.ascii_letters + string.digits, min_size=1, max_size=20
).filter(lambda s: s[0].isalpha())


@given(ident)
@settings(max_examples=200, deadline=None)
def test_decamelize_idempotent_and_lower(name):
    once = decamelize(name)
    assert decamelize(once) == once
    assert once == once.lower()


@given(st.text(min_size=0, max_size=30))
@settings(max_examples=200, deadline=None)
def test_clean_key_removes_separators(name):
    out = clean_key(name)
    assert " " not in out and ":" not in out and "-" not in out


@given(ident)
@settings(max_examples=100, deadline=None)
def test_normalize_key_stable(name):
    once = normalize_key(name)
    assert normalize_key(once) == once


def _random_nested(rng: random.Random, depth: int = 0) -> dict:
    out = {}
    for _ in range(rng.randint(1, 4)):
        key = "".join(rng.choices(string.ascii_letters, k=rng.randint(3, 8)))
        roll = rng.random()
        if roll < 0.3 and depth < 2:
            out[key] = _random_nested(rng, depth + 1)
        elif roll < 0.45 and depth < 2:
            out[key] = [rng.randint(0, 9) for _ in range(rng.randint(0, 3))]
        elif roll < 0.6:
            out[key] = rng.random()
        elif roll < 0.8:
            out[key] = "".join(rng.choices(string.ascii_lowercase, k=5))
        else:
            out[key] = rng.random() < 0.5
    return out


def test_flatten_idempotent_and_scalar(spark, tmp_path):
    rng = random.Random(7)
    path = tmp_path / "nested.json"
    with open(path, "w") as f:
        for _ in range(60):
            f.write(json.dumps(_random_nested(rng)) + "\n")
    df = spark.read.json(str(path))
    flat = flatten(df)
    # scalar-only schema
    for field in flat.schema.fields:
        assert not isinstance(field.dataType, (T.StructType, T.ArrayType)), field
    # snake_case names, unique
    assert len(set(flat.columns)) == len(flat.columns)
    for c in flat.columns:
        assert c == normalize_key(c)
    # idempotent
    again = flatten(flat)
    assert again.columns == flat.columns
    assert again.count() == flat.count()


def test_dedup_idempotency_double_ingest(spark, tmp_path):
    """ingest(f); ingest(f) then Q1 view ≡ single ingest (reference's
    at-least-once + eventual-dedup contract)."""
    from .test_ingest import FIXTURE_LINES

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "e.json", "w") as f:
        for line in FIXTURE_LINES:
            f.write(json.dumps(line) + "\n")
    wh = ParquetWarehouse(spark, str(tmp_path / "lake"))
    res = EventPipeline(spark).ingest_json_dir(str(src))
    wh.insert_df("ns", "identities", res.tables["identities"])
    once = wh.read_view("ns", "identities")
    once_rows = sorted(r["message_id"] for r in once.select("message_id").collect())
    wh.insert_df("ns", "identities", res.tables["identities"])
    twice = wh.read_view("ns", "identities")
    twice_rows = sorted(r["message_id"] for r in twice.select("message_id").collect())
    assert once_rows == twice_rows


def test_schema_evolution_monotone(spark, tmp_path):
    """Column set only ever grows across appends."""
    wh = ParquetWarehouse(spark, str(tmp_path / "lake"))
    rng = random.Random(13)
    cols_seen: set[str] = set()
    base_cols = ["message_id", "timestamp"]
    for batch in range(4):
        extra = {f"col_{rng.randint(0, 5)}": rng.random() for _ in range(2)}
        df = spark.createDataFrame(
            [(f"m{batch}", "2026-01-01 00:00:00", *extra.values())],
            ", ".join(
                [f"{c} string" for c in base_cols] + [f"{c} double" for c in extra]
            ),
        ).withColumn("timestamp", F.to_timestamp("timestamp"))
        wh.insert_df("ns", "t", df)
        now = set(wh.describe_table("ns", "t"))
        assert cols_seen <= now, f"columns shrank: {cols_seen - now}"
        cols_seen = now


# try_cast semantics pinned against Python int()/float() behavior
# (SURVEY §7.2 phase-3 risk). Each case: (string, python_int_ok,
# python_float_ok) — observed agreement with Spark try_cast.
_CAST_CASES = [
    ("42", True, True),
    ("-7", True, True),
    ("+5", True, True),
    (" 13 ", True, True),    # both trim
    ("3.5", False, True),    # int('3.5') raises; try_cast long -> null
    ("1e3", False, True),
    ("abc", False, False),
    ("", False, False),
    ("0x1f", False, False),  # Python int('0x1f') raises without base
    ("nan", False, True),
    ("inf", False, True),
]


def test_try_cast_matches_python_semantics(spark):
    df = spark.createDataFrame(
        [(s,) for s, _, _ in _CAST_CASES], "s string"
    ).withColumns(
        {
            "as_long": F.col("s").try_cast("long"),
            "as_double": F.col("s").try_cast("double"),
        }
    )
    got = {r["s"]: (r["as_long"] is not None, r["as_double"] is not None) for r in df.collect()}
    for s, int_ok, float_ok in _CAST_CASES:
        assert got[s] == (int_ok, float_ok), f"{s!r}: {got[s]} != {(int_ok, float_ok)}"


def test_misfits_never_lose_rows(spark):
    """reconcile_types: clean rows == input rows regardless of misfit
    count (misfits are a side channel, not a filter)."""
    rng = random.Random(99)
    vals = [
        ("".join(rng.choices("0123456789abc.", k=rng.randint(1, 6))),)
        for _ in range(200)
    ]
    df = spark.createDataFrame(vals, "v string").withColumn(
        "message_id", F.monotonically_increasing_id().cast("string")
    )
    clean, misfits = coerce.reconcile_types(df, {"v": T.LongType()}, "t")
    assert clean.count() == 200
    n_null = clean.filter(F.col("v").isNull()).count()
    assert misfits.count() == n_null  # every nulled value is reported


# --- gram repetition metrics vs a pure-Python reference ---

_word = st.text(alphabet="abc", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=25, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=8))
def test_gram_metrics_match_python_reference(spark, docs):
    from collections import Counter

    from clickstreamtoclickhouse_spark.functions import text as tx
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["tbf"], r["dbf"])
        for r in df.select(
            "doc_id",
            F.round(tx.top_ngram_frac(F.col("text"), 2), 6).alias("tbf"),
            F.round(tx.dup_ngram_frac(F.col("text"), 2), 6).alias("dbf"),
        ).collect()
    }
    for i, d in enumerate(docs):
        ws = d.lower().split()
        grams = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        if not grams:
            exp = (0.0, 0.0)
        else:
            c = Counter(grams)
            exp = (
                round(max(c.values()) / len(grams), 6),
                round((len(grams) - len(c)) / len(grams), 6),
            )
        assert got[i] == exp, (d, got[i], exp)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),   # key
            st.integers(min_value=0, max_value=99),  # payload
            st.integers(min_value=0, max_value=9),   # version
            st.booleans(),                           # tombstone
        ),
        min_size=0,
        max_size=20,
    )
)
@settings(max_examples=8, deadline=None)
def test_merge_upsert_idempotent_property(spark, updates):
    from clickstreamtoclickhouse_spark.operators.merge import merge_upsert

    base = spark.createDataFrame(
        [(k, -1, 0) for k in range(5)], "id INT, payload INT, ver INT"
    )
    upd = spark.createDataFrame(
        updates or [(0, 0, 0, False)],
        "id INT, payload INT, ver INT, deleted BOOLEAN",
    )
    if not updates:
        upd = upd.limit(0)
    once = merge_upsert(
        base, upd, keys=["id"], version_col="ver", delete_col="deleted"
    )
    twice = merge_upsert(
        once, upd, keys=["id"], version_col="ver", delete_col="deleted"
    )
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # every surviving key is either an untouched base key or the
    # max-version non-deleted update row's key
    alive = {r[0] for r in a}
    assert all(isinstance(k, int) for k in alive)


# --- k-core vs a pure-Python synchronous peel ---

_edge = st.tuples(
    st.integers(min_value=1, max_value=8), st.integers(min_value=1, max_value=8)
).filter(lambda e: e[0] != e[1])


@settings(max_examples=20, deadline=None)
@given(st.lists(_edge, min_size=1, max_size=14), st.integers(2, 4))
def test_k_core_matches_python_peel(spark, edges, k):
    from clickstreamtoclickhouse_spark.functions.graph import k_core

    und = {frozenset(e) for e in edges}
    adj = {}
    for e in und:
        a, b = tuple(e)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = set(adj)
    while True:
        drop = {n for n in nodes if len(adj[n] & nodes) < k}
        if not drop:
            break
        nodes -= drop
    expected = {n: len(adj[n] & nodes) for n in nodes}

    df = spark.createDataFrame(
        [(a, b) for a, b in (tuple(e) for e in und)], "a long, b long"
    )
    got = {r.node: r.core_degree for r in k_core(df, k=k).collect()}
    assert got == expected


# --- containment pairs vs python shingle-set reference ---

_cword = st.sampled_from(["aa", "bb", "cc", "dd", "ee"])
_cdoc = st.lists(_cword, min_size=0, max_size=10).map(" ".join)


@settings(max_examples=15, deadline=None)
@given(st.lists(_cdoc, min_size=2, max_size=5))
def test_containment_matches_python_reference(spark, docs):
    from clickstreamtoclickhouse_spark.functions import dedup_text

    def shingles(d):
        ws = d.split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = {i: shingles(d) for i, d in enumerate(docs)}
    expected = {}
    for i in sorted(sets):
        for j in sorted(sets):
            if i >= j or not sets[i] or not sets[j]:
                continue
            inter = len(sets[i] & sets[j])
            ca, cb = inter / len(sets[i]), inter / len(sets[j])
            if max(ca, cb) >= 0.5:
                expected[(i, j)] = (round(ca, 6), round(cb, 6))

    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.cont_a_in_b, r.cont_b_in_a)
        for r in dedup_text.containment_pairs(df, threshold=0.5, n=3).collect()
    }
    assert got == expected
