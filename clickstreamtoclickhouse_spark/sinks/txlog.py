"""Minimal native transaction log over plain parquet (Delta-style).

``sinks/lakehouse.py`` maps the reference's ReplacingMergeTree
semantics onto Delta Lake, but the delta jars are absent here, so
that sink is env-gated. This module implements the CORE mechanism
natively — a file-based commit log — so transactional semantics are
actually exercised in this repo, not just designed:

- **Log-derived listings.** A table is a directory with ``_txlog/``
  holding one JSON file per version: ``{version, adds, removes,
  schema}``. Readers reconstruct the active file set from the log —
  never from a directory listing. At 100 TB this is the difference
  between an O(1)-ish metadata read and a multi-minute S3 LIST, and
  it is why Delta/Iceberg exist (Armbrust et al., VLDB 2020 — public
  design).
- **Atomic, exclusive commits.** A commit is written to a temp file
  and ``os.link``ed to its final ``{version}.json`` name. ``link``
  is atomic and fails with EEXIST if the version is taken, giving
  both crash-atomicity (readers never see a partial commit) and
  optimistic concurrency (the loser re-reads and retries). On object
  stores without atomic create-if-absent this step needs a LogStore
  analog (S3: conditional PUT / DynamoDB lock) — same caveat Delta
  documents.
- **Snapshot isolation + time travel.** ``read(version=N)`` resolves
  the file set as of N; an in-flight reader of version N is untouched
  by any later commit because its files are never mutated, only
  de-referenced (and reclaimed by an explicit ``vacuum``).
- **Atomic MERGE.** ``merge_upsert`` = read snapshot -> merge
  (operators/merge semantics) -> write new files -> ONE commit that
  adds them and removes the old set. This closes the non-atomic
  two-step window called out in ``streaming/stateful.py``'s
  parquet-overwrite CDC path: with the log, replayed micro-batches
  and concurrent readers see version N or N+1, never a truncated
  table.

Scale stance: the log carries file PATHS and a schema string —
kilobytes per commit, independent of data size. Data moves only
through normal distributed parquet writes. Log replay is O(versions);
production systems checkpoint the replay — noted in ``history()`` —
the mechanism is identical.
"""

from __future__ import annotations

import json
import logging
import os
import uuid
from dataclasses import dataclass
from pathlib import Path

logger = logging.getLogger(__name__)

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..util import release_local_checkpoint


class CommitConflict(Exception):
    """Another writer committed this version first (optimistic
    concurrency): re-read the table and retry the transaction."""


@dataclass
class Snapshot:
    version: int
    files: tuple[str, ...]
    schema_json: str | None
    stats: dict[str, dict] | None = None  # relpath -> {col: [min, max]}


class TxLogTable:
    """A parquet directory governed by a ``_txlog/`` commit log.

    `stats_cols`: columns whose per-FILE min/max are captured from the
    parquet footers at write time and stored in the commit — the zone
    maps behind ``read(where=...)`` data skipping. Footer reads happen
    once per written file; queries prune from the log alone."""

    def __init__(self, path: str, stats_cols: tuple[str, ...] = ()) -> None:
        self.path = Path(path)
        self.log_dir = self.path / "_txlog"
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self.stats_cols = tuple(stats_cols)

    # -- log plumbing ---------------------------------------------------

    def _log_entries(self) -> list[dict]:
        entries = []
        for p in sorted(self.log_dir.glob("*.json")):
            if p.stem.isdigit():
                entries.append(json.loads(p.read_text()))
        return entries

    def latest_version(self) -> int:
        """-1 = empty table (no commits yet)."""
        versions = [
            int(p.stem) for p in self.log_dir.glob("*.json") if p.stem.isdigit()
        ]
        return max(versions, default=-1)

    def snapshot(self, version: int | None = None) -> Snapshot:
        """Active file set as of `version` (default: latest). Replays
        the log; a production variant checkpoints the replayed state
        every N commits (same mechanism, fewer reads)."""
        active: set[str] = set()
        stats: dict[str, dict] = {}
        schema_json = None
        seen = -1
        for e in self._log_entries():
            if version is not None and e["version"] > version:
                break
            active -= set(e["removes"])
            active |= set(e["adds"])
            stats.update(e.get("stats") or {})
            schema_json = e.get("schema") or schema_json
            seen = e["version"]
        if version is not None and seen < version:
            raise ValueError(f"version {version} does not exist (latest {seen})")
        return Snapshot(
            seen,
            tuple(sorted(active)),
            schema_json,
            {f: stats[f] for f in active if f in stats},
        )

    def history(self) -> list[dict]:
        return [
            {k: e[k] for k in ("version", "n_adds", "n_removes")}
            for e in (
                {**e, "n_adds": len(e["adds"]), "n_removes": len(e["removes"])}
                for e in self._log_entries()
            )
        ]

    def last_txn_version(self, app: str) -> int:
        """Highest idempotence-token version committed for writer
        `app` (-1 if none) — the Delta txnAppId/txnVersion mechanism:
        a replayed writer checks this before re-appending."""
        best = -1
        for e in self._log_entries():
            t = e.get("txn")
            if t and t.get("app") == app:
                best = max(best, int(t["ver"]))
        return best

    def _txn_already_applied(self, txn: tuple[str, int]) -> bool:
        """True if a commit for this (app, ver) token — or a LATER ver
        for the same app — already exists, i.e. the write is a replay
        to skip. Logs a warning when `ver` arrives FAR below the app's
        high-water mark: tokens persist in the log forever, so if a
        stream's checkpoint directory is deleted and the query
        restarted with the SAME app id, batch ids reset to 0 and
        genuinely new batches would be silently skipped as replays
        (the Delta txnAppId contract: never reuse an app id with reset
        versions — use a fresh app id per checkpoint incarnation)."""
        last = self.last_txn_version(txn[0])
        if last < txn[1]:
            return False
        if txn[1] < last:
            logger.warning(
                "txlog %s: txn token (%s, %d) arrived below the app's "
                "high-water mark %d — treating as a replay and SKIPPING "
                "the write. If this writer's checkpoint was reset (batch "
                "ids restarted from 0), this silently drops new data: "
                "never reuse an app id with reset versions; use a fresh "
                "app id per checkpoint incarnation.",
                self.path, txn[0], txn[1], last,
            )
        return True

    def _commit(
        self,
        version: int,
        adds: list[str],
        removes: list[str],
        schema_json: str,
        stats: dict[str, dict] | None = None,
        txn: tuple[str, int] | None = None,
    ) -> None:
        """Atomically publish `version`; raises CommitConflict if a
        concurrent writer took it."""
        entry = {
            "version": version,
            "adds": sorted(adds),
            "removes": sorted(removes),
            "schema": schema_json,
            "stats": stats or {},
        }
        if txn is not None:
            entry["txn"] = {"app": txn[0], "ver": int(txn[1])}
        tmp = self.log_dir / f".tmp-{uuid.uuid4().hex}.json"
        tmp.write_text(json.dumps(entry, indent=1))
        final = self.log_dir / f"{version:020d}.json"
        try:
            os.link(tmp, final)  # atomic create-if-absent
        except FileExistsError as e:
            raise CommitConflict(
                f"version {version} already committed; re-read and retry"
            ) from e
        finally:
            tmp.unlink(missing_ok=True)

    # -- data path ------------------------------------------------------

    def _write_files(self, df: DataFrame) -> tuple[list[str], dict[str, dict]]:
        """Distributed parquet write into a unique subdir; returns the
        table-relative data file paths (from the filesystem ONCE, at
        write time — reads never list directories) plus per-file
        min/max zone maps for `stats_cols` (footer metadata only, no
        row reads)."""
        sub = f"data/{uuid.uuid4().hex}"
        out = self.path / sub
        df.write.parquet(str(out))
        files = [
            f"{sub}/{p.name}"
            for p in out.glob("*.parquet")
            if not p.name.startswith("_")
        ]
        return files, self._collect_stats(files)

    def _collect_stats(self, files: list[str]) -> dict[str, dict]:
        if not self.stats_cols:
            return {}
        import pyarrow.parquet as pq

        def _plain(v):
            if isinstance(v, bytes):
                return v.decode("utf-8", "replace")
            return v if isinstance(v, (int, float, str, bool)) else str(v)

        out: dict[str, dict] = {}
        for rel in files:
            md = pq.ParquetFile(str(self.path / rel)).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            per_col: dict[str, list] = {}
            for col in self.stats_cols:
                if col not in names:
                    continue
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(names[col]).statistics
                    if st is None or not st.has_min_max:
                        mins = []  # any statless row group voids the zone map
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    per_col[col] = [_plain(min(mins)), _plain(max(maxs))]
            if per_col:
                out[rel] = per_col
        return out

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        where: tuple[str, object, object] | None = None,
    ) -> DataFrame:
        """Snapshot read; `where=(col, lo, hi)` prunes files whose
        committed zone map cannot overlap [lo, hi] BEFORE Spark sees
        them (files without a zone map for `col` are kept — skipping
        must never drop data). This is log-metadata data skipping —
        the predicate itself must still be applied by the query; the
        log only shrinks the file list, exactly like Delta's
        stats-based pruning."""
        snap = self.snapshot(version)
        files = list(snap.files)
        if where is not None and files:
            col, lo, hi = where
            kept = []
            for f in files:
                zm = (snap.stats or {}).get(f, {}).get(col)
                if zm is None or not (zm[1] < lo or zm[0] > hi):
                    kept.append(f)
            files = kept
        if not files:
            if snap.schema_json is None:
                raise ValueError("empty table with no committed schema")
            schema = T.StructType.fromJson(json.loads(snap.schema_json))
            return spark.createDataFrame([], schema)
        return (
            spark.read.option("mergeSchema", "true")
            .parquet(*[str(self.path / f) for f in files])
        )

    def append(
        self,
        df: DataFrame,
        _max_retries: int = 10,
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Append-commit (blind adds commute, so conflicts just retry
        with the next version number). Returns the committed version.

        `txn=(app, ver)` makes the append IDEMPOTENT per writer (the
        Delta txnAppId/txnVersion pattern): if the log already holds a
        commit for `app` at `ver` or later, the append is skipped and
        the current latest version is returned — this is how an
        at-least-once micro-batch replay achieves exactly-once output
        (key the token on (checkpoint identity, batch_id)).

        CAVEAT (same as Delta's txnAppId contract): tokens persist in
        the log forever. If a stream's checkpoint directory is deleted
        and the query restarted with the SAME app id, batch ids reset
        to 0 and genuinely new batches are skipped as replays — silent
        data loss. Never reuse an app id with reset versions; key the
        app id on the checkpoint incarnation. A token arriving below
        the app's high-water mark logs a warning."""
        if txn is not None and self._txn_already_applied(txn):
            return self.latest_version()
        adds, stats = self._write_files(df)
        schema_json = df.schema.json()
        for _ in range(_max_retries):
            if txn is not None and self.last_txn_version(txn[0]) >= txn[1]:
                # a concurrent replay committed this token while we
                # were writing files; abandon ours (never referenced
                # by any commit, reclaimed by vacuum)
                return self.latest_version()
            v = self.latest_version() + 1
            try:
                self._commit(v, adds, [], schema_json, stats, txn=txn)
                return v
            except CommitConflict:
                continue
        raise CommitConflict(f"gave up after {_max_retries} retries")

    def overwrite(self, df: DataFrame, txn: tuple[str, int] | None = None) -> int:
        """Replace the table contents in ONE commit: readers see the
        old or the new snapshot, never an in-between state (unlike
        mode('overwrite') on a plain directory, which deletes before
        it writes). `txn` carries the same idempotence token as
        `append` — a replayed overwrite for an already-committed
        (app, ver) is skipped, which is what lets incremental view
        maintenance advance its high-water mark ATOMICALLY with the
        data it derives from (operators/incremental.py). The append()
        token-reuse caveat applies identically: an app id whose
        versions reset (deleted checkpoint, same app id) silently
        skips new overwrites — a below-high-water token logs a
        warning."""
        if txn is not None and self._txn_already_applied(txn):
            return self.latest_version()
        base = self.snapshot()
        adds, stats = self._write_files(df)
        v = base.version + 1
        self._commit(v, adds, list(base.files), df.schema.json(), stats, txn=txn)
        return v

    def commit_txn(
        self, txn: tuple[str, int], _max_retries: int = 10
    ) -> int:
        """Metadata-ONLY commit: advance the idempotence token for
        `txn` without touching any data files (empty adds/removes; the
        prior snapshot's file set and schema are untouched). This is
        how incremental view maintenance advances its high-water mark
        when the source gained commits but no data files — a
        kilobyte-sized log entry instead of rewriting the whole rollup
        (O(table) read+write that `overwrite` would cost). Returns the
        committed (or already-current) version."""
        if self._txn_already_applied(txn):
            return self.latest_version()
        for _ in range(_max_retries):
            snap = self.snapshot()
            try:
                self._commit(
                    snap.version + 1, [], [], snap.schema_json, {}, txn=txn
                )
                return snap.version + 1
            except CommitConflict:
                if self._txn_already_applied(txn):
                    return self.latest_version()
                continue
        raise CommitConflict(f"gave up after {_max_retries} retries")

    def merge_upsert(
        self,
        spark: SparkSession,
        updates: DataFrame,
        keys: list[str],
        version_col: str | None = None,
        delete_col: str | None = None,
        _max_retries: int = 5,
    ) -> int:
        """Transactional MERGE: snapshot -> merge (latest-version-wins
        upsert + tombstone deletes, operators/merge semantics) -> one
        atomic swap commit. On a concurrent-commit conflict the WHOLE
        merge re-runs against the new snapshot (optimistic
        concurrency — merges do not commute, unlike appends)."""
        from ..operators.merge import merge_upsert as _merge

        for _ in range(_max_retries):
            base_snap = self.snapshot()
            if base_snap.version == -1:
                base = updates.limit(0)
                if delete_col is not None:
                    base = base.drop(delete_col)
            else:
                base = self.read(spark)
            merged = _merge(
                base, updates, keys=keys,
                version_col=version_col, delete_col=delete_col,
            )
            # materialize BEFORE committing: the merged plan reads the
            # snapshot files; localCheckpoint cuts that lineage so the
            # new files are complete before the old ones are
            # de-referenced (and later vacuumed)
            merged = merged.localCheckpoint(eager=True)
            try:
                adds, stats = self._write_files(merged)
                self._commit(
                    base_snap.version + 1, adds, list(base_snap.files),
                    merged.schema.json(), stats,
                )
                return base_snap.version + 1
            except CommitConflict:
                # orphaned `adds` files are reclaimed by vacuum()
                continue
            finally:
                # checkpoint blocks are only GC-reclaimed at driver
                # GC; a per-micro-batch MERGE stream would otherwise
                # accumulate one merged-table copy per commit (r15 —
                # the streaming-sink release stance)
                release_local_checkpoint(merged)
        raise CommitConflict(f"gave up after {_max_retries} retries")

    def optimize(
        self,
        spark: SparkSession,
        min_files: int = 2,
        target_file_bytes: int = 128 << 20,
        _max_retries: int = 5,
    ) -> int | None:
        """Small-file compaction as ONE atomic commit — the OPTIMIZE
        analog of Delta/Iceberg table maintenance: rewrite the current
        snapshot's files into ceil(total_bytes / target_file_bytes)
        right-sized files and commit (adds=new, removes=old), so
        readers see the pre- or post-compaction snapshot, never a mix;
        the superseded files stay on disk for time travel until
        ``vacuum`` reclaims them. Content is unchanged — pure layout
        maintenance (per-append file sets from a streaming ingest are
        the usual input); zone maps are recomputed for the new files.
        No-op (returns None) below `min_files`.

        Concurrency: compaction removes specific files, so it
        conflicts with ANY concurrent commit; on CommitConflict the
        whole rewrite re-runs against the new snapshot (the
        merge_upsert optimistic loop — compactions do not commute)."""
        for _ in range(_max_retries):
            snap = self.snapshot()
            if snap.version == -1 or len(snap.files) < min_files:
                return None
            total = sum((self.path / f).stat().st_size for f in snap.files)
            n_out = max(1, (total + target_file_bytes - 1) // target_file_bytes)
            # materialize before committing (merge_upsert's rationale):
            # the rewrite reads the snapshot files; the checkpoint cuts
            # that lineage so the new files are complete before the old
            # ones are de-referenced
            df = self.read(spark, version=snap.version).coalesce(
                int(n_out)
            ).localCheckpoint(eager=True)
            try:
                adds, stats = self._write_files(df)
                self._commit(
                    snap.version + 1, adds, list(snap.files),
                    df.schema.json(), stats,
                )
                return snap.version + 1
            except CommitConflict:
                continue
            finally:
                # merge_upsert's release rationale: bounded storage
                # across repeated compactions
                release_local_checkpoint(df)
        raise CommitConflict(f"gave up after {_max_retries} retries")

    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Delete data files not referenced by any of the last
        `keep_versions` snapshots (and prune their log entries).
        Time travel works within the retained window — the same
        retention contract as Delta VACUUM. Returns deleted paths."""
        latest = self.latest_version()
        if latest < 0:
            return []
        cutoff = max(latest - keep_versions + 1, 0)
        referenced: set[str] = set()
        for v in range(cutoff, latest + 1):
            referenced |= set(self.snapshot(v).files)
        deleted = []
        for sub in (self.path / "data").glob("*/"):
            for p in sub.glob("*.parquet"):
                rel = f"data/{sub.name}/{p.name}"
                if rel not in referenced:
                    p.unlink()
                    deleted.append(rel)
        # fold pre-cutoff history into a base commit so replay still
        # starts from a valid state. CRASH-SAFETY ORDER (an advisor
        # flagged the old unlink-then-plain-write sequence as a data
        # loss window): (1) write the folded entry to a temp file and
        # atomically rename it over the cutoff entry, (2) only then
        # unlink the pre-cutoff entries. The folded entry also REMOVES
        # every file any earlier entry ever added (minus the base set),
        # so the log is replay-valid at EVERY intermediate state: with
        # all, some, or none of the pre-cutoff entries still present,
        # snapshot(cutoff) resolves to exactly the base file set
        # (replay applies an entry's removes before its adds).
        if cutoff > 0:
            base = self.snapshot(cutoff)
            pre = [e for e in self._log_entries() if e["version"] < cutoff]
            ever_added: set[str] = set()
            for e in pre:
                ever_added |= set(e["adds"])
            rewritten = {
                "version": cutoff,
                "adds": list(base.files),
                "removes": sorted(ever_added - set(base.files)),
                "schema": base.schema_json,
                "stats": base.stats or {},
            }
            tmp = self.log_dir / f".tmp-vacuum-{uuid.uuid4().hex}.json"
            tmp.write_text(json.dumps(rewritten, indent=1))
            os.replace(tmp, self.log_dir / f"{cutoff:020d}.json")
            for e in pre:
                (self.log_dir / f"{e['version']:020d}.json").unlink()
        return sorted(deleted)
