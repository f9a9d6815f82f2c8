"""Native transaction log (sinks/txlog.py): snapshot isolation, time
travel, atomic merge, optimistic concurrency, vacuum retention."""

from __future__ import annotations

import pytest

from clickstreamtoclickhouse_spark.sinks.txlog import CommitConflict, TxLogTable


def _df(spark, rows, schema="id long, v long"):
    return spark.createDataFrame(rows, schema)


def test_append_and_read_roundtrip(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    assert t.latest_version() == -1
    v0 = t.append(_df(spark, [(1, 10), (2, 20)]))
    v1 = t.append(_df(spark, [(3, 30)]))
    assert (v0, v1) == (0, 1)
    got = sorted((r["id"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, 10), (2, 20), (3, 30)]


def test_idempotent_txn_append_skips_replay(spark, tmp_path):
    # Delta txnAppId/txnVersion semantics: a replayed (app, ver)
    # append is a no-op; a HIGHER ver for the same app lands; an
    # independent app is unaffected by the first app's tokens
    t = TxLogTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 10)]), txn=("stream-a", 0))
    assert t.last_txn_version("stream-a") == 0
    v_before = t.latest_version()
    t.append(_df(spark, [(1, 10)]), txn=("stream-a", 0))  # replay
    assert t.latest_version() == v_before  # no new commit
    assert [r["id"] for r in t.read(spark).collect()] == [1]
    t.append(_df(spark, [(2, 20)]), txn=("stream-a", 1))
    t.append(_df(spark, [(3, 30)]), txn=("stream-b", 0))
    assert t.last_txn_version("stream-a") == 1
    assert t.last_txn_version("stream-b") == 0
    assert t.last_txn_version("stream-c") == -1
    got = sorted(r["id"] for r in t.read(spark).collect())
    assert got == [1, 2, 3]
    # stale token (ver <= already-committed) is also skipped
    t.append(_df(spark, [(9, 90)]), txn=("stream-a", 0))
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 2, 3]


def test_time_travel_and_overwrite_isolation(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 10)]))
    t.append(_df(spark, [(2, 20)]))
    # a reader holding version 0 is unaffected by the overwrite below
    old = t.read(spark, version=0)
    t.overwrite(_df(spark, [(9, 90)]))
    assert [(r["id"], r["v"]) for r in old.collect()] == [(1, 10)]
    assert [(r["id"], r["v"]) for r in t.read(spark).collect()] == [(9, 90)]
    assert sorted(
        (r["id"], r["v"]) for r in t.read(spark, version=1).collect()
    ) == [(1, 10), (2, 20)]
    with pytest.raises(ValueError):
        t.snapshot(version=99)


def test_commit_conflict_is_detected(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 10)]))
    # two writers race for version 1: the second link must fail
    t._commit(1, [], [], None)
    with pytest.raises(CommitConflict):
        t._commit(1, [], [], None)
    # append() retries past the conflict and lands on version 2
    assert t.append(_df(spark, [(2, 20)])) == 2


def test_merge_upsert_transactional(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    # the table never stores the tombstone column — it arrives only on
    # update batches (merge_upsert's contract)
    schema = "id long, val string, ver long, deleted boolean"
    t.append(_df(spark, [(1, "a", 1), (2, "b", 1)], "id long, val string, ver long"))
    updates = _df(
        spark,
        [
            (1, "a2", 2, False),    # matched: update row replaces base
            (3, "c_old", 0, False),  # in-batch duplicate, lower ver...
            (3, "c", 1, False),      # ...version_col keeps this one
        ],
        schema,
    )
    v = t.merge_upsert(
        spark, updates, keys=["id"], version_col="ver", delete_col="deleted"
    )
    got = {r["id"]: (r["val"], r["ver"]) for r in t.read(spark).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 1), 3: ("c", 1)}
    # tombstone delete, applied atomically as one more version
    t.merge_upsert(
        spark,
        _df(spark, [(2, "x", 9, True)], schema),
        keys=["id"],
        version_col="ver",
        delete_col="deleted",
    )
    assert sorted(r["id"] for r in t.read(spark).collect()) == [1, 3]
    # replaying the SAME update batch is a no-op on content (idempotent
    # CDC apply), just a new version
    before = sorted(map(tuple, t.read(spark).collect()))
    t.merge_upsert(
        spark, updates.filter("id = 1"), keys=["id"],
        version_col="ver", delete_col="deleted",
    )
    assert sorted(map(tuple, t.read(spark).collect())) == before
    assert t.latest_version() == v + 2


def test_merge_on_empty_table(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    schema = "id long, val string, ver long"
    t.merge_upsert(
        spark, _df(spark, [(1, "a", 1)], schema), keys=["id"], version_col="ver"
    )
    assert [(r["id"], r["val"]) for r in t.read(spark).collect()] == [(1, "a")]


def test_vacuum_reclaims_unreferenced_files(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 10)]))
    t.overwrite(_df(spark, [(2, 20)]))
    t.overwrite(_df(spark, [(3, 30)]))
    deleted = t.vacuum(keep_versions=1)
    assert deleted  # versions 0/1's exclusive files are gone
    # latest snapshot intact after vacuum
    assert [(r["id"], r["v"]) for r in t.read(spark).collect()] == [(3, 30)]
    # history outside the retention window is pruned
    with pytest.raises(ValueError):
        t.snapshot(version=0)


def test_optimize_compacts_in_one_commit(spark, tmp_path):
    """OPTIMIZE rewrites the per-append file pile into a right-sized
    set in one atomic commit: contents unchanged, time travel to the
    pre-compaction version still works (until vacuum), and vacuum then
    reclaims the superseded files."""
    t = TxLogTable(str(tmp_path / "t"), stats_cols=("id",))
    for i in range(3):
        t.append(_df(spark, [(i * 10 + j, j) for j in range(3)]))
    pre = t.snapshot()
    assert len(pre.files) >= 3
    v = t.optimize(spark)
    assert v == pre.version + 1
    post = t.snapshot()
    assert len(post.files) < len(pre.files)
    rows = sorted((r["id"], r["v"]) for r in t.read(spark).collect())
    assert rows == sorted((i * 10 + j, j) for i in range(3) for j in range(3))
    # zone maps recomputed for the new files
    assert post.stats and all(f in post.stats for f in post.files)
    # time travel to the pre-compaction version still reads old files
    assert sorted(
        (r["id"], r["v"]) for r in t.read(spark, version=pre.version).collect()
    ) == rows
    # vacuum reclaims the superseded pile; latest snapshot unaffected
    deleted = t.vacuum(keep_versions=1)
    assert set(deleted) == set(pre.files)
    assert sorted((r["id"], r["v"]) for r in t.read(spark).collect()) == rows
    # idempotence: a fresh optimize on a compacted table is a no-op
    assert t.optimize(spark) is None


def test_vacuum_fold_is_crash_safe_at_every_intermediate_state(spark, tmp_path):
    """The vacuum fold must write the folded cutoff entry (atomic
    rename) BEFORE unlinking pre-cutoff entries, and the folded entry
    must re-remove everything earlier entries added — so a crash
    anywhere in the window leaves a log whose replay still resolves
    every retained version correctly. Simulated here by replaying the
    exact on-disk states the fold passes through."""
    import json as _json

    t = TxLogTable(str(tmp_path / "t"))
    t.append(_df(spark, [(1, 10)]))          # v0: adds A
    t.overwrite(_df(spark, [(2, 20)]))       # v1: removes A, adds B
    t.overwrite(_df(spark, [(3, 30)]))       # v2: removes B, adds C
    base_files = set(t.snapshot(2).files)

    # state 1: folded v2 written, pre-cutoff entries STILL PRESENT
    # (crash between the rename and the unlinks). Build it by running
    # vacuum on a copy of the log and restoring the pre-cutoff files.
    pre_entries = {
        e["version"]: _json.dumps(e)
        for e in t._log_entries()
        if e["version"] < 2
    }
    t.vacuum(keep_versions=1)
    folded = _json.loads((t.log_dir / f"{2:020d}.json").read_text())
    # fold re-removes the superseded files, not just re-adds the base
    assert set(folded["removes"]) >= (
        {f for v in (0, 1) for f in _json.loads(pre_entries[v])["adds"]}
        - base_files
    )
    for v, payload in pre_entries.items():
        (t.log_dir / f"{v:020d}.json").write_text(payload)
    # replay over the crash-state log: latest snapshot is exactly base
    assert set(t.snapshot().files) == base_files
    assert [(r["id"], r["v"]) for r in t.read(spark).collect()] == [(3, 30)]
    # and the table still accepts commits from the crash state
    t.append(_df(spark, [(4, 40)]))
    assert sorted(
        (r["id"], r["v"]) for r in t.read(spark).collect()
    ) == [(3, 30), (4, 40)]


def test_empty_table_read_uses_committed_schema(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"))
    with pytest.raises(ValueError):
        t.read(spark)


def test_streaming_cdc_through_txlog(spark, tmp_path):
    """foreachBatch CDC-apply where each micro-batch is ONE atomic
    commit — closing the parquet overwrite path's two-step window."""
    import json as _json

    landing = tmp_path / "cdc"
    landing.mkdir()
    t = TxLogTable(str(tmp_path / "table"))

    def write_file(name, rows):
        with open(landing / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write_file("b1.json", [
        {"id": 1, "val": "a", "ver": 1},
        {"id": 2, "val": "b", "ver": 1},
    ])
    stream = spark.readStream.schema("id long, val string, ver long").option(
        "maxFilesPerTrigger", 1
    ).json(str(landing))

    def apply_batch(batch_df, batch_id):
        t.merge_upsert(spark, batch_df, keys=["id"], version_col="ver")

    q = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        write_file("b2.json", [
            {"id": 1, "val": "a2", "ver": 2},
            {"id": 3, "val": "c", "ver": 1},
        ])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["id"]: (r["val"], r["ver"]) for r in t.read(spark).collect()}
    assert got == {1: ("a2", 2), 2: ("b", 1), 3: ("c", 1)}
    assert len(t.history()) == t.latest_version() + 1


def test_zone_map_data_skipping(spark, tmp_path):
    """Per-file min/max from the commit log prune the file list before
    Spark sees it: two appends with disjoint id ranges -> a ranged
    read scans only the overlapping file (verified via inputFiles)."""
    t = TxLogTable(str(tmp_path / "t"), stats_cols=("id",))
    t.append(_df(spark, [(i, i * 10) for i in range(0, 100)]).coalesce(1))
    t.append(_df(spark, [(i, i * 10) for i in range(1000, 1100)]).coalesce(1))
    snap = t.snapshot()
    assert len(snap.files) == 2 and len(snap.stats) == 2
    for f, zm in snap.stats.items():
        assert set(zm) == {"id"}

    pruned = t.read(spark, where=("id", 1050, 1060))
    assert len(pruned.inputFiles()) == 1
    got = sorted(r["id"] for r in pruned.filter("id between 1050 and 1060").collect())
    assert got == list(range(1050, 1061))
    # full read still sees both files; a no-overlap range sees none
    assert len(t.read(spark).inputFiles()) == 2
    assert t.read(spark, where=("id", 5000, 6000)).count() == 0


def test_zone_maps_survive_vacuum(spark, tmp_path):
    t = TxLogTable(str(tmp_path / "t"), stats_cols=("id",))
    t.append(_df(spark, [(1, 10)]).coalesce(1))
    t.overwrite(_df(spark, [(2, 20)]).coalesce(1))
    t.overwrite(_df(spark, [(3, 30)]).coalesce(1))
    t.vacuum(keep_versions=1)
    snap = t.snapshot()
    assert snap.stats and all("id" in zm for zm in snap.stats.values())
    assert t.read(spark, where=("id", 3, 3)).count() == 1
    assert len(t.read(spark, where=("id", 100, 200)).inputFiles()) == 0


def test_log_replay_matches_model_over_random_ops(spark, tmp_path):
    """Seeded random append/overwrite/merge sequence executed against
    the table AND a driver-side model; every historical version must
    replay to the model's snapshot at that point (full time-travel
    consistency, not just the final state)."""
    import random

    rng = random.Random(20240814)
    t = TxLogTable(str(tmp_path / "t"))
    model: dict[int, int] = {}
    history: list[dict[int, int]] = []

    next_id = 0
    for _ in range(12):
        op = rng.choice(["append", "overwrite", "merge"])
        rows = [(next_id + i, rng.randrange(100)) for i in range(rng.randint(1, 3))]
        next_id += len(rows)
        if op == "append":
            t.append(_df(spark, rows))
            model.update(dict(rows))
        elif op == "overwrite":
            t.overwrite(_df(spark, rows))
            model = dict(rows)
        else:
            upd = [(k, v, 1) for k, v in rows]
            # also update one existing key when possible
            if model:
                k = rng.choice(sorted(model))
                upd.append((k, rng.randrange(100), 1))
            t.merge_upsert(
                spark,
                _df(spark, upd, "id long, v long, ver long").select("id", "v", "ver"),
                keys=["id"],
                version_col="ver",
            )
            for k, v, _ in upd:
                model[k] = v
        history.append(dict(model))

    for version, expected in enumerate(history):
        got = {
            r["id"]: r["v"]
            for r in t.read(spark, version=version).select("id", "v").collect()
        }
        assert got == expected, f"version {version}"


def test_concurrent_appends_all_land(spark, tmp_path):
    """Real thread-level races on the commit log: every append must
    survive (conflicts retried), versions must be contiguous."""
    import threading

    t = TxLogTable(str(tmp_path / "t"))
    errors = []

    def worker(wid: int):
        try:
            for j in range(3):
                t.append(_df(spark, [(wid * 100 + j, wid)]))
        except Exception as e:  # pragma: no cover - failure diagnostics
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors
    assert t.latest_version() == 11  # 12 contiguous commits, 0..11
    ids = sorted(r["id"] for r in t.read(spark).collect())
    assert len(ids) == 12
