"""Small shared helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: every SessionDFCache ever constructed, for registry-wide teardown —
#: see evict_session_caches().
_SESSION_CACHES: list["SessionDFCache"] = []


class SessionDFCache(dict):
    """Session-scoped cache of expensive shared builds, keyed
    (applicationId, sf_dir) -> lazily-localCheckpointed DataFrame —
    the ONE implementation behind the co-purchase edge, retrieval tf,
    and dedup cluster-assignment caches (three divergent copies of
    this pattern would be the portable_id_hash mistake all over).

    Contract: the input dir is IMMUTABLE for the application's
    lifetime (the registry.load testdata contract); keys from stopped
    applications are swept on every access so a long-lived Python
    process restarting Spark sessions cannot accumulate stale
    DataFrames; `evict()` is the explicit unpersist hook for a
    long-lived app iterating over many sf_dirs (the sweep only
    reclaims OTHER apps' entries). Plain dict subclass so tests can
    inspect/plant entries directly.

    Memory ceiling: each cache holds ONE materialized localCheckpoint
    per (app, sf_dir) it has served, so a session's cache footprint is
    bounded by (number of distinct input dirs) x (sum of the
    registered caches' per-dir build sizes) — unbounded only if a
    long-lived app walks unboundedly many dirs WITHOUT calling
    `evict(dir)` / `evict_session_caches(dir)` when done with one.
    bench.py and scripts/sf_probe.py call evict_session_caches() in
    their teardown for exactly this reason. Every instance
    self-registers in `_SESSION_CACHES` (the `name` is diagnostic), so
    registry-wide teardown and the registry-wide eviction test cannot
    silently miss a new cache."""

    def __init__(self, name: str = ""):
        super().__init__()
        self.name = name
        _SESSION_CACHES.append(self)

    @staticmethod
    def _ckpt_once(df: DataFrame) -> DataFrame:
        """Delegates to the module-level ckpt_once (one implementation
        of the wrap-once rule, not two)."""
        return ckpt_once(df)

    def get_or_build(self, spark: SparkSession, sf_dir: str, builder):
        app_id = spark.sparkContext.applicationId
        for k in [k for k in self if k[0] != app_id]:
            del self[k]
        key = (app_id, sf_dir)
        cached = self.get(key)
        if cached is not None:
            return cached
        df = self._ckpt_once(builder())
        self[key] = df
        return df

    def get_or_build_group(self, spark: SparkSession, sf_dir: str, builder):
        """Like get_or_build, but `builder` returns a TUPLE of
        DataFrames that live and die together — one cache entry, one
        eviction. Use when a derived DataFrame (e.g. a pair table)
        closes over a sibling build: caching them separately lets the
        derived entry outlive an evicted base whose checkpoint blocks
        are gone, failing with checkpoint-block-not-found on first
        use. Each element is lazily localCheckpointed; `builder` may
        chain later elements off earlier ones (an element it already
        checkpointed itself — plan is a LogicalRDD — is not wrapped
        again, which would double the stored blocks)."""
        app_id = spark.sparkContext.applicationId
        for k in [k for k in self if k[0] != app_id]:
            del self[k]
        key = (app_id, sf_dir)
        cached = self.get(key)
        if cached is not None:
            return cached
        dfs = tuple(self._ckpt_once(df) for df in builder())
        self[key] = dfs
        return dfs

    def evict(self, sf_dir: str | None = None) -> int:
        """Release entries for `sf_dir` (or all); returns the count.

        The evicted DataFrame objects must not be reused afterwards
        (callers rebuild via get_or_build); tuple-group entries are
        released element-wise."""
        n = 0
        for k in list(self):
            if sf_dir is None or k[1] == sf_dir:
                entry = self.pop(k)
                dfs = entry if isinstance(entry, tuple) else (entry,)
                for df in dfs:
                    release_local_checkpoint(df)
                n += 1
        return n


def ckpt_once(df: DataFrame) -> DataFrame:
    """Lazy localCheckpoint, skipped when the plan is already a
    LogicalRDD (a checkpoint the caller made) — wrapping again would
    double the stored blocks. The module-level twin of
    SessionDFCache._ckpt_once for shared operators (r14: used where a
    library function fans a caller-provided DataFrame into several
    consumers and must pin ONE execution without knowing whether the
    caller checkpointed already)."""
    plan = df._jdf.queryExecution().analyzed()
    if plan.getClass().getSimpleName() == "LogicalRDD":
        return df
    return df.localCheckpoint(eager=False)


def release_local_checkpoint(df: DataFrame) -> None:
    """Release a localCheckpointed DataFrame's storage blocks NOW.

    The blocks live on the underlying checkpoint RDD, which
    `DataFrame.unpersist()` does NOT touch (that only clears
    cacheManager entries — measured: blocks survive) and which the
    JVM ContextCleaner only reclaims at driver GC — too lazy for a
    long-running stream checkpointing every micro-batch. Release the
    LogicalRDD's backing RDD directly so storage actually shrinks;
    the DataFrame must not be used afterwards. Safe no-op if the app
    is already stopped (its blocks are gone anyway) or the plan is
    not a materialized checkpoint."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(True)
        else:
            df.unpersist()
    except Exception:  # noqa: BLE001
        pass


def protected_checkpoint_rdd_ids() -> set[int]:
    """RDD ids backing every registered SessionDFCache entry — the
    checkpoints that must SURVIVE a between-queries storage sweep
    (they are the cross-query state by design; everything else
    persisted in the context is a single-query transient). Non-
    DataFrame payloads inside tuple-group entries (e.g. the BPE merge
    list) are skipped."""
    ids: set[int] = set()
    for c in _SESSION_CACHES:
        for entry in c.values():
            dfs = entry if isinstance(entry, tuple) else (entry,)
            for df in dfs:
                if not isinstance(df, DataFrame):
                    continue
                try:
                    plan = df._jdf.queryExecution().analyzed()
                    if plan.getClass().getSimpleName() == "LogicalRDD":
                        ids.add(plan.rdd().id())
                except Exception:  # noqa: BLE001 — stopped app, etc.
                    pass
    return ids


def release_transient_checkpoints(
    spark: SparkSession, min_rdds: int = 0
) -> int:
    """Release every context-persisted RDD that is NOT a session-cache
    checkpoint; returns the count released.

    Per-query lazy localCheckpoint pins (the r14 shared-subtree pins)
    and iterative-loop round checkpoints are persisted on the context
    and reclaimed only at driver GC — across a 295-query bench the
    accumulated block pressure measurably degrades late-running heavy
    queries (the r14 part_* signature). A multi-query session calls
    this AFTER a query's action completes: the finished query's pins
    can never be recomputed or reused (builders construct fresh plans
    per call), so dropping their blocks is pure storage relief.
    sc.getPersistentRDDs() tracks exactly the RDD-level persists
    (localCheckpoint marks included, materialized or not); DataFrame
    .cache()/.persist() entries live in the CacheManager and are not
    touched.

    `min_rdds`: skip the sweep while the context holds at most this
    many persistent RDDs. The full sweep costs ~50-100 ms of py4j
    round-trips (measured: ~9% on sub-second queries when run after
    EVERY query), so a per-query caller passes a threshold — the size
    probe is a single cheap JVM call, the sweep then amortizes over
    the ~dozens of queries it takes to accumulate that many pins,
    and storage stays bounded either way."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        if min_rdds and jmap.size() <= min_rdds:
            return 0
        keep = protected_checkpoint_rdd_ids()
        n = 0
        for rdd_id, jrdd in dict(jmap).items():
            if int(rdd_id) in keep:
                continue
            try:
                jrdd.unpersist(False)
                n += 1
            except Exception:  # noqa: BLE001
                pass
        return n
    except Exception:  # noqa: BLE001 — app already stopped
        return 0


def evict_session_caches(sf_dir: str | None = None) -> int:
    """Release every registered SessionDFCache's entries for `sf_dir`
    (or all dirs); returns the total evicted. The one teardown hook a
    multi-sf_dir session (bench, probe, a long-lived service) calls
    between dirs so checkpoint storage actually shrinks instead of
    accumulating one build per cache per dir. NOTE: derived-layer
    coupling (e.g. the triangle cache checkpointing off the edge
    build) is already safe here — both layers are registered, so the
    registry-wide call drops them together."""
    return sum(c.evict(sf_dir) for c in _SESSION_CACHES)


def is_path_not_found(e: Exception) -> bool:
    """True iff an AnalysisException means 'no data here yet' — the
    path does not exist, OR it exists but holds no parquet footers
    (ops pre-created the directory, or a crashed first write left it
    empty: Spark raises UNABLE_TO_INFER_SCHEMA for those). Both are
    normal first-run conditions; anything else is a real failure that
    must propagate."""
    cond = getattr(e, "getCondition", lambda: None)() or ""
    msg = str(e)
    return (
        "PATH_NOT_FOUND" in cond
        or "UNABLE_TO_INFER_SCHEMA" in cond
        or "Path does not exist" in msg
        or "Unable to infer schema" in msg
    )


def portable_id_hash(col):
    """First 8 md5 hex digits of a (numeric or string) id as a
    bigint — the engine's ONE portable hash for deterministic
    sampling/splitting: identical in Spark
    (conv(substr(md5(cast),1,8),16,10)) and DuckDB
    (('0x' || substr(md5(CAST(id AS VARCHAR)),1,8))::BIGINT), stable
    across runs, engines, and cluster layouts. Keep every call site on
    this helper: a divergent copy silently breaks Spark/oracle parity."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = col if isinstance(col, Column) else F.col(col)
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )


def portable_id_hash_sql(expr: str) -> str:
    """Spark-SQL-text form of ``portable_id_hash`` for use inside SQL
    lambda strings (F.transform/aggregate bodies can't always take a
    Column helper). `expr` is a SQL string expression. Keep every
    inline SQL hash on this builder — same single-source rule as the
    Column form."""
    return (
        f"cast(conv(substr(md5(cast({expr} as string)), 1, 8), 16, 10) "
        "as bigint)"
    )


def portable_id_hash_duck(expr: str) -> str:
    """DuckDB-text twin of ``portable_id_hash`` for oracle SQL.
    `expr` is a VARCHAR expression."""
    return f"('0x' || substr(md5({expr}), 1, 8))::BIGINT"


def try_read_parquet(
    spark: SparkSession, path: str, **options: str
) -> DataFrame | None:
    """Read a parquet path, returning None ONLY when the path does not
    exist yet (first run of an incremental/streaming job). Any other
    error — permission, corrupt footer, transient IO — propagates:
    treating those as 'empty' makes callers silently conclude
    'nothing to do' (the failure mode an advisor flagged in
    operators/incremental.py, fixed for every such site here)."""
    from pyspark.errors import AnalysisException

    reader = spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.parquet(path)
    except AnalysisException as e:
        if is_path_not_found(e):
            return None
        raise


def widen_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition `df` to the session's core count IFF its
    scan is under-partitioned (fewer splits than cores). Fan-out-heavy
    operators (shingling, per-dim projections, subspace encodes) do
    O(10-100)x of their work in the MAP stage; a small single-split
    parquet input pins all of it to one task. A production-scale scan
    already carries thousands of splits, so the branch never fires and
    no shuffle is added; when it does fire the payload is only the
    small input itself. The explicit numPartitions keeps AQE from
    re-coalescing the widened exchange.

    NOT a blanket default: apply only where an A/B shows a win. For
    pure fan-out+reduce plans (substring_dup_spans 2.8s->1.3s, the PQ
    subspace encode) it wins big; for join-heavy consumers that cache
    the exploded table and lean on AQE runtime broadcasts
    (jaccard/minhash/simhash pair generation) or iterate over a
    checkpoint (k-means, BoW) the extra exchange measured 1.2-3x
    SLOWER at sf0.1, so those call sites deliberately do not widen."""
    spark = df.sparkSession
    par = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def conf_broadcast(
    df: DataFrame, key: str = "spark.clickstreamtoclickhouse.screenJoin"
):
    """F.broadcast(df) unless the session conf `key` is 'shuffle'.

    For joins whose small side is HIT-VOLUME (flagged doc ids,
    covered-position arrays): bounded in practice — screens assume
    contamination is rare — but corpus-dependent in the worst case,
    where a FORCED broadcast would blow the driver/executor broadcast
    limits (the r12 domain_blocklist_report lesson, generalized).
    Setting the conf to 'shuffle' drops the hint so the size-based
    planner / AQE decides; results are identical either way
    (test_screen_join_shuffle_fallback_parity)."""
    from pyspark.sql import functions as F

    mode = df.sparkSession.conf.get(key, "broadcast")
    return F.broadcast(df) if mode == "broadcast" else df
