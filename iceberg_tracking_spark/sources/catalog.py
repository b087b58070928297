"""Versioned table catalog: Iceberg-style snapshot semantics on Parquet.

BASELINE.json's north star names "Spark's native Iceberg integration
for read/write/metadata operations" with storage external; this module
is the engine-side implementation of that contract, degrading cleanly
to plain Parquet when no Iceberg runtime is present (this container).
The mapping:

| Iceberg concept            | here                                    |
|----------------------------|-----------------------------------------|
| snapshot                   | immutable `v=<n>/` data directory       |
| table metadata / manifest  | `_manifest.json` (version log + schema) |
| time travel (snapshot-id)  | `read(version=n)`                       |
| append / overwrite commit  | `write(mode=...)` → new version         |
| rollback                   | `rollback(n)` (metadata-only)           |
| rewrite_data_files         | `compact()` → new compacted version     |
| expire_snapshots           | `expire(keep_last=k)`                   |

Commits are atomic at the manifest level: data is fully written to the
new version directory first, then the manifest is swapped via
write-to-temp + `os.replace` (atomic on POSIX). Readers always resolve
through the manifest, so a torn write is invisible. On a real cluster
the same protocol runs against an object store with a conditional-put
on the manifest key — the standard Iceberg/Delta commit pattern; the
local filesystem rename stands in for it here.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_manifest.json"


class ConcurrentWriteError(RuntimeError):
    """Raised when a commit's base version is no longer current
    (optimistic concurrency, the Iceberg commit model): the caller
    should re-read the table and retry its merge."""


class VersionedTable:
    """A directory-backed table with immutable snapshot versions."""

    def __init__(self, base_path: str):
        self.base = base_path.rstrip("/")
        os.makedirs(self.base, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def _manifest_path(self) -> str:
        return os.path.join(self.base, MANIFEST)

    def _load_manifest(self) -> dict:
        p = self._manifest_path()
        if not os.path.exists(p):
            return {"current": None, "versions": []}
        with open(p) as f:
            return json.load(f)

    def _commit(self, manifest: dict) -> None:
        tmp = self._manifest_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, self._manifest_path())  # atomic swap

    def _data_dir(self, version: int) -> str:
        return os.path.join(self.base, f"v={version}")

    @staticmethod
    def _entry_for(manifest: dict, version: int) -> dict:
        """Manifest entry of a specific version — NOT versions[-1]: after
        a rollback the current snapshot is not the newest one, and
        upsert/compact must inherit the CURRENT snapshot's layout."""
        for e in manifest["versions"]:
            if e["version"] == version:
                return e
        raise ValueError(f"version {version} not in manifest")

    # ------------------------------------------------------------ write

    @staticmethod
    def _collect_file_stats(target: str, stats_cols: list[str]) -> list[dict]:
        """Per-data-file min/max for `stats_cols`, read once from the
        parquet footers at COMMIT time — the Iceberg manifest-entry
        stats that let `read_pruned` eliminate files at planning time
        without touching any footer at query time. A column whose
        stats are absent or non-JSON-typed is recorded as unknown
        (None) for that file: unknown is always read, never pruned."""
        import pyarrow.parquet as pq

        out = []
        for root, _dirs, fs in os.walk(target):
            for fname in sorted(fs):
                if not fname.endswith(".parquet"):
                    continue
                p = os.path.join(root, fname)
                md = pq.ParquetFile(p).metadata
                stats: dict[str, list | None] = {c: None for c in stats_cols}
                seen: dict[str, list] = {}
                ok: dict[str, bool] = {c: True for c in stats_cols}
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        col = g.column(ci)
                        name = col.path_in_schema
                        if name not in ok or not ok[name]:
                            continue
                        s = col.statistics
                        if s is None or not s.has_min_max:
                            ok[name] = False
                            continue
                        mn, mx = s.min, s.max
                        if isinstance(mn, bytes):
                            mn = mn.decode("utf-8", "replace")
                            mx = mx.decode("utf-8", "replace")
                        if not isinstance(mn, (int, float, str)):
                            ok[name] = False
                            continue
                        if name in seen:
                            seen[name][0] = min(seen[name][0], mn)
                            seen[name][1] = max(seen[name][1], mx)
                        else:
                            seen[name] = [mn, mx]
                for c in stats_cols:
                    if ok[c] and c in seen:
                        stats[c] = seen[c]
                out.append(
                    {"path": p, "rows": md.num_rows, "stats": stats}
                )
        return out

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        txn: tuple[str, int] | None = None,
        expected_current: int | None | str = "any",
        stats_cols: list[str] | None = None,
    ) -> int:
        """Commit a new snapshot; returns its version number.

        `append` reads the current snapshot and unions it with `df` —
        the new version is still a full immutable copy (snapshot
        isolation; an Iceberg fast-append would share unchanged files
        via the manifest, which plain parquet directories cannot).

        `txn` = (app_id, batch_id) records an idempotency token INSIDE
        the same atomic manifest swap as the data commit (the
        Delta/Iceberg txn pattern): `last_txn(app_id)` then answers
        "did this writer's batch land?" with no window where data is
        committed but the token is not.

        `expected_current` is Iceberg-style optimistic concurrency:
        pass the version the write was BASED on (None for "table was
        empty") and the commit raises ConcurrentWriteError if another
        writer landed in between — without it, the second of two
        read-modify-write merges from the same base silently erases
        the first (lost update). The MERGE paths pass it automatically.
        """
        m = self._load_manifest()
        if expected_current != "any" and m["current"] != expected_current:
            raise ConcurrentWriteError(
                f"table advanced to version {m['current']} since this "
                f"write was planned against {expected_current}; re-read "
                "and retry the merge"
            )
        version = (m["versions"][-1]["version"] + 1) if m["versions"] else 0
        if mode == "append" and m["current"] is not None:
            prev = df.sparkSession.read.parquet(self._data_dir(m["current"]))
            df = prev.unionByName(df)
        elif mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode: {mode}")
        target = self._data_dir(version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        n_rows = df.sparkSession.read.parquet(target).count()
        entry = {
            "version": version,
            "mode": mode,
            "n_rows": n_rows,
            "schema": df.schema.jsonValue(),
            "partition_by": partition_by or [],
        }
        if stats_cols:
            entry["stats_cols"] = list(stats_cols)
            entry["files"] = self._collect_file_stats(target, list(stats_cols))
        m["versions"].append(entry)
        m["current"] = version
        if txn is not None:
            app_id, batch_id = txn
            m.setdefault("txns", {})[app_id] = int(batch_id)
        self._commit(m)
        return version

    def last_txn(self, app_id: str) -> int:
        """Latest batch id committed under `app_id`, or -1 if none."""
        return int(self._load_manifest().get("txns", {}).get(app_id, -1))

    @staticmethod
    def _validate_merge_keys(
        changes: DataFrame, key_cols: list[str], label: str
    ) -> None:
        """MERGE semantics require a usable key: reject NULL keys (the
        equality anti-join can never match them → silent duplicates)
        and duplicate keys within `changes` (Iceberg/Delta MERGE raises
        on multiple source matches). One small agg job on the CDC
        batch, which is the small side by construction."""
        from pyspark.sql import functions as F

        any_null = F.lit(False)
        for c in key_cols:
            any_null = any_null | F.col(c).isNull()
        bad = changes.agg(
            F.sum(F.when(any_null, 1).otherwise(0)).alias("n_null"),
            # countDistinct skips NULL-containing tuples — count dups
            # among non-null keys only so NULL rows aren't re-reported.
            (
                F.sum(F.when(~any_null, 1).otherwise(0))
                - F.countDistinct(*key_cols)
            ).alias("n_dup"),
        ).collect()[0]
        if bad["n_null"] or bad["n_dup"]:
            raise ValueError(
                f"{label} changes invalid: {bad['n_null']} NULL-key rows, "
                f"{bad['n_dup']} duplicate-key rows on {key_cols}"
            )

    def _commit_current_layout(
        self, merged: DataFrame, m: dict, txn: tuple[str, int] | None = None
    ) -> int:
        """Overwrite-commit `merged` inheriting the CURRENT snapshot's
        partition layout (shared tail of both MERGE paths). Passes the
        base version for the optimistic-concurrency check: the merge
        was computed against `m`, so a commit over any OTHER version
        would silently drop a concurrent writer's rows."""
        entry = self._entry_for(m, m["current"])
        return self.write(
            merged,
            mode="overwrite",
            partition_by=entry["partition_by"] or None,
            txn=txn,
            expected_current=m["current"],
        )

    def upsert(
        self,
        changes: DataFrame,
        key_cols: list[str],
        txn: tuple[str, int] | None = None,
        partition_by_on_create: list[str] | None = None,
    ) -> int:
        """MERGE: rows in `changes` replace current rows with the same
        key; unmatched keys are inserted. Commits a new snapshot.

        The matched-row removal is a left_anti join on the key — one
        shuffle (or broadcast when `changes` is small, the common CDC
        case); no full-table rewrite logic lives caller-side. This is
        the plain-parquet analog of Iceberg/Delta `MERGE INTO` in
        copy-on-write mode.

        `txn` = (app_id, batch_id): same idempotency token as `write`
        — replaying streaming maintainers (streaming/materialized.py)
        gate on `last_txn` so a redelivered micro-batch is a no-op.
        Upsert itself is idempotent per batch CONTENT, but the token
        spares the replay a full merge commit and keeps the version
        history one-entry-per-batch.

        `partition_by_on_create` sets the partition layout when this
        upsert CREATES the table (first commit); later upserts inherit
        the current snapshot's layout like every MERGE path, so the
        layout is declared once at table birth and sticks.
        """
        self._validate_merge_keys(changes, key_cols, "upsert")
        m = self._load_manifest()
        if m["current"] is None:
            return self.write(
                changes,
                txn=txn,
                expected_current=None,
                partition_by=partition_by_on_create,
            )
        spark = changes.sparkSession
        current = spark.read.parquet(self._data_dir(m["current"]))
        kept = current.join(changes.select(*key_cols), key_cols, "left_anti")
        merged = kept.unionByName(changes)
        return self._commit_current_layout(merged, m, txn=txn)

    def delete_where(self, spark: SparkSession, predicate: str) -> int:
        """Row-level DELETE (copy-on-write): commit a new snapshot
        without the rows matching the SQL `predicate`. The deletion is
        visible to `changes()` as `delete` rows between the two
        snapshots, so CDC consumers see it like any other mutation.
        Pairs with time travel: the pre-delete snapshot stays readable
        until `expire()`."""
        m = self._load_manifest()
        if m["current"] is None:
            raise ValueError("delete_where on an empty table")
        current = spark.read.parquet(self._data_dir(m["current"]))
        # SQL DELETE (and Iceberg/Delta row-level delete) removes only
        # rows where the predicate is TRUE. A bare NOT(pred) would also
        # drop rows where pred evaluates to NULL — silent data loss that
        # CDC would then report as legitimate deletes. Keep NULLs:
        remaining = current.filter(
            ~F.coalesce(F.expr(predicate), F.lit(False))
        )
        return self._commit_current_layout(remaining, m)

    def merge_aggregate(
        self,
        delta: DataFrame,
        key_cols: list[str],
        sum_cols: list[str],
        txn: tuple[str, int] | None = None,
    ) -> int:
        """Additive MERGE (incremental view maintenance): matched keys
        combine as `old + delta` per `sum_cols`; unmatched keys insert.

        Where `upsert` replaces matched rows (CDC), this maintains a
        running aggregate — the table IS the materialized rollup, and
        a micro-batch only ever touches its own delta keys, never the
        full history. NOT idempotent under redelivery (old+delta twice
        double-counts): replaying callers must pass `txn` and gate on
        `last_txn` — see streaming/materialized.py. Every snapshot has
        exactly the key_cols + sum_cols schema (the first commit is
        projected too, so extra delta columns can't appear in v0 and
        vanish later).
        """
        from pyspark.sql import functions as F

        self._validate_merge_keys(delta, key_cols, "merge_aggregate")
        delta = delta.select(*key_cols, *sum_cols)
        m = self._load_manifest()
        if m["current"] is None:
            return self.write(delta, txn=txn, expected_current=None)
        spark = delta.sparkSession
        current = spark.read.parquet(self._data_dir(m["current"]))
        # USING-style full outer join coalesces the key columns; each
        # sum column combines with 0-defaults for one-sided rows.
        cur = current.alias("c")
        d = delta.alias("d")
        merged = cur.join(d, on=key_cols, how="full").select(
            *key_cols,
            *[
                (
                    F.coalesce(F.col(f"c.{v}"), F.lit(0))
                    + F.coalesce(F.col(f"d.{v}"), F.lit(0))
                ).alias(v)
                for v in sum_cols
            ],
        )
        return self._commit_current_layout(merged, m, txn=txn)

    # ------------------------------------------------------------ read

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Read the current snapshot, or time-travel to `version`."""
        m = self._load_manifest()
        if m["current"] is None:
            raise FileNotFoundError(f"{self.base}: no committed version")
        v = m["current"] if version is None else version
        known = {e["version"] for e in m["versions"]}
        if v not in known:
            raise ValueError(f"unknown version {v}; have {sorted(known)}")
        return spark.read.parquet(self._data_dir(v))

    def prune_files(
        self, col: str, lo, hi, version: int | None = None
    ) -> tuple[list[str], int]:
        """Planning-time file selection from the manifest's min/max
        stats: (paths whose [min, max] overlaps [lo, hi], total file
        count). Files with unknown stats are kept — pruning is an
        optimization, never a correctness filter. Raises if the
        snapshot was not written with `stats_cols` covering `col`."""
        m = self._load_manifest()
        v = m["current"] if version is None else version
        entry = self._entry_for(m, v)
        if col not in (entry.get("stats_cols") or []):
            raise ValueError(
                f"snapshot v{v} has no manifest stats for column {col!r}; "
                "write it with stats_cols=[...]"
            )
        files = entry["files"]
        keep = []
        for f in files:
            s = (f.get("stats") or {}).get(col)
            if s is None or not (s[1] < lo or s[0] > hi):
                keep.append(f["path"])
        return keep, len(files)

    def read_pruned(
        self, spark: SparkSession, col: str, lo, hi, version: int | None = None
    ) -> DataFrame:
        """Range read with Iceberg-style manifest pruning: data files
        whose recorded [min, max] cannot contain the predicate are
        eliminated BEFORE Spark ever lists them — zero footer I/O at
        query time (the planning-time complement of parquet row-group
        skipping, which still opens every file). The surviving files
        get the exact filter, so results equal `read().filter(...)`
        always; on a range-clustered layout (sources/zorder.py) the
        file list shrinks to the overlapping slice."""
        m = self._load_manifest()
        v = m["current"] if version is None else version
        keep, _total = self.prune_files(col, lo, hi, version=v)
        rng = (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
        if not keep:
            return self.read(spark, v).filter(F.lit(False))
        base = self._data_dir(v)
        return (
            spark.read.option("basePath", base).parquet(*keep).filter(rng)
        )

    def changes(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: int | None = None,
        key_cols: list[str] | None = None,
    ) -> DataFrame:
        """Change-data-feed between two snapshots (Delta `table_changes`
        / Iceberg `create_changelog_view` column contract): the returned
        frame carries every data column plus `_change_type` and
        `_commit_version`.

        Without `key_cols`: row-level multiset diff via `exceptAll`
        both ways → change types `insert` / `delete`. Correct for any
        schema, but both diffs hash-partition on ALL columns — use the
        keyed path for wide tables at scale.

        With `key_cols`: key-level diff — ONE full-outer shuffle on the
        keys (the partitioning a downstream MERGE consumer needs
        anyway), emitting `insert`, `delete`, and for changed keys the
        Delta-style `update_preimage` + `update_postimage` row pair.
        Non-key comparison is a null-safe struct equality, evaluated
        inside the join projection — no second pass.
        """
        to_v = self.current_version() if to_version is None else to_version
        old = self.read(spark, from_version)
        new = self.read(spark, to_v)
        # Schema evolution (Iceberg add-column semantics): a column
        # present in only one snapshot reads as NULL in the other, so
        # CDC spans an ALTER without erroring — an added column makes
        # rows differ only where it is non-NULL in the new snapshot.
        for c, t in [(f.name, f.dataType) for f in new.schema.fields]:
            if c not in old.columns:
                old = old.withColumn(c, F.lit(None).cast(t))
        for c, t in [(f.name, f.dataType) for f in old.schema.fields]:
            if c not in new.columns:
                new = new.withColumn(c, F.lit(None).cast(t))
        new = new.select(*old.columns)
        if key_cols is None:
            ins = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
            dels = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
            out = ins.unionByName(dels)
            return out.withColumn("_commit_version", F.lit(to_v))
        data_cols = [c for c in new.columns if c not in key_cols]
        o = old.select(
            *key_cols, F.struct(*[F.col(c) for c in data_cols]).alias("_o")
        )
        n = new.select(
            *key_cols, F.struct(*[F.col(c) for c in data_cols]).alias("_n")
        )
        j = o.join(n, list(key_cols), "full_outer")
        def _emit(src: str, ctype: str):
            return [
                *key_cols,
                *[F.col(f"{src}.{c}").alias(c) for c in data_cols],
                F.lit(ctype).alias("_change_type"),
            ]
        inserts = j.filter(F.col("_o").isNull() & F.col("_n").isNotNull()).select(
            *_emit("_n", "insert")
        )
        deletes = j.filter(F.col("_o").isNotNull() & F.col("_n").isNull()).select(
            *_emit("_o", "delete")
        )
        changed = j.filter(
            F.col("_o").isNotNull()
            & F.col("_n").isNotNull()
            & ~F.col("_o").eqNullSafe(F.col("_n"))
        )
        pre = changed.select(*_emit("_o", "update_preimage"))
        post = changed.select(*_emit("_n", "update_postimage"))
        out = inserts.unionByName(deletes).unionByName(pre).unionByName(post)
        return out.withColumn("_commit_version", F.lit(to_v))

    def tag(self, name: str, version: int | None = None) -> None:
        """Iceberg-style named tag on a snapshot (defaults to current).
        Tagged snapshots are pinned: `expire` never deletes them."""
        m = self._load_manifest()
        v = m["current"] if version is None else version
        if v not in {e["version"] for e in m["versions"]}:
            raise ValueError(f"unknown version {v}")
        m.setdefault("tags", {})[name] = int(v)
        self._commit(m)

    def tags(self) -> dict[str, int]:
        return dict(self._load_manifest().get("tags", {}))

    def read_tag(self, spark: SparkSession, name: str) -> DataFrame:
        t = self.tags()
        if name not in t:
            raise ValueError(f"unknown tag {name!r}; have {sorted(t)}")
        return self.read(spark, version=t[name])

    def history(self) -> list[dict]:
        return list(self._load_manifest()["versions"])

    def current_version(self) -> int | None:
        return self._load_manifest()["current"]

    # ------------------------------------------------------- maintenance

    def rollback(self, version: int) -> None:
        """Metadata-only rollback: point `current` at an old snapshot."""
        m = self._load_manifest()
        if version not in {e["version"] for e in m["versions"]}:
            raise ValueError(f"unknown version {version}")
        m["current"] = version
        self._commit(m)

    def compact(
        self, spark: SparkSession, target_file_bytes: int = 128 * 1024 * 1024
    ) -> int:
        """Rewrite the current snapshot into ~target-sized files as a
        NEW version (Iceberg `rewrite_data_files`: compaction is a
        commit, old snapshots stay readable until expired)."""
        m = self._load_manifest()
        if m["current"] is None:
            raise FileNotFoundError("nothing to compact")
        cur = self._data_dir(m["current"])
        size = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(cur)
            for f in fs
            if f.endswith(".parquet")
        )
        n_files = max(1, math.ceil(size / target_file_bytes))
        df = spark.read.parquet(cur).repartition(n_files)
        entry = self._entry_for(m, m["current"])
        return self.write(df, mode="overwrite", partition_by=entry["partition_by"] or None)

    def expire(self, keep_last: int = 1) -> list[int]:
        """Delete data of all but the newest `keep_last` snapshots
        (never the current one). Returns expired version numbers."""
        m = self._load_manifest()
        keep = (
            {e["version"] for e in m["versions"][-keep_last:]}
            | {m["current"]}
            | set(m.get("tags", {}).values())  # tagged snapshots are pinned
        )
        expired = [e["version"] for e in m["versions"] if e["version"] not in keep]
        # Commit the pruned manifest FIRST, then delete data: a crash
        # in between leaves unreferenced directories (harmless garbage,
        # re-collectable) — deleting first would leave the manifest
        # advertising snapshots whose data is gone.
        m["versions"] = [e for e in m["versions"] if e["version"] in keep]
        self._commit(m)
        for v in expired:
            shutil.rmtree(self._data_dir(v), ignore_errors=True)
        return expired

    def stage(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        expected_current: int | None | str = "any",
    ) -> int:
        """WAP (write-audit-publish) step 1: commit the DATA and its
        manifest entry WITHOUT advancing `current`. Plain readers never
        see the snapshot; auditors read it with `read(version=...)`.
        `mode="append"` stages current ∪ df. Pair with `publish()` —
        the Iceberg stage-commit/WAP-branch pattern on the plain-
        parquet layout.

        `expected_current` is the same optimistic-concurrency token as
        `write()`: stage() is a read-modify-write of the manifest too
        (it appends a version entry computed from the versions it read),
        so without the check two concurrent stagers — or a stage racing
        a write — would compute the same version number and the later
        `_commit` would drop the earlier manifest entry, orphaning its
        data. Pass the version the stage was planned against (None for
        "table was empty"); the default "any" preserves the single-
        writer convenience path."""
        m = self._load_manifest()
        if expected_current != "any" and m["current"] != expected_current:
            raise ConcurrentWriteError(
                f"table advanced to version {m['current']} since this "
                f"stage was planned against {expected_current}; re-read "
                "and retry"
            )
        version = (m["versions"][-1]["version"] + 1) if m["versions"] else 0
        if mode == "append" and m["current"] is not None:
            prev = df.sparkSession.read.parquet(self._data_dir(m["current"]))
            df = prev.unionByName(df)
        elif mode not in ("overwrite", "append"):
            raise ValueError(f"unsupported mode: {mode}")
        target = self._data_dir(version)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        n_rows = df.sparkSession.read.parquet(target).count()
        m["versions"].append(
            {
                "version": version,
                "mode": mode,
                "n_rows": n_rows,
                "schema": df.schema.jsonValue(),
                "partition_by": partition_by or [],
                "staged": True,
            }
        )
        # `current` deliberately unchanged — that flip is publish().
        self._commit(m)
        return version

    def publish(
        self,
        version: int,
        spark: SparkSession | None = None,
        checks: dict[str, str] | None = None,
    ) -> int:
        """WAP step 3: flip `current` to an audited staged snapshot —
        a manifest-only atomic swap, no data movement. With `checks`
        (and `spark`), the quality gate re-runs against the staged
        data immediately before the flip, so a snapshot that decayed
        between stage and publish still cannot go live. Abandoned
        staged snapshots are reclaimed by `expire()` like any other
        old version."""
        m = self._load_manifest()
        entry = self._entry_for(m, version)
        if checks:
            if spark is None:
                raise ValueError("publish with checks needs a SparkSession")
            from .quality import QualityGateError, evaluate_expectations

            staged_df = spark.read.parquet(self._data_dir(version))
            results = evaluate_expectations(staged_df, checks)
            failures = [k for k, ok in results.items() if not ok]
            if failures:
                raise QualityGateError(failures)
        entry.pop("staged", None)
        m["current"] = version
        self._commit(m)
        return version

    def remove_orphans(self, older_than_seconds: float = 3 * 86400) -> list[str]:
        """Delete data directories under the table root that NO
        manifest version references — debris from crashed writes
        (data landed, manifest swap never happened) or interrupted
        `expire` runs (manifest pruned, rmtree died). Returns the
        removed directory names. The Iceberg `remove_orphan_files`
        maintenance job, on the plain-parquet layout.

        "Unreferenced" alone is NOT sufficient to reclaim: write() and
        stage() land data in v=<n> BEFORE their manifest commit, so an
        in-flight writer's target directory is indistinguishable from
        a crashed write's debris at the moment of the scan — reclaiming
        it would let the writer commit a manifest entry pointing at
        deleted/partial data (a corrupted snapshot). `older_than_seconds`
        is the same safety valve as Iceberg's `remove_orphan_files`
        `older_than` (default ~3 days): a directory younger than the
        cutoff (by mtime) is never reclaimed, bounding the race to
        writes that stall longer than the cutoff. Tests pass 0 for
        immediate reclamation of known-dead debris."""
        m = self._load_manifest()
        live = {
            os.path.basename(self._data_dir(e["version"]))
            for e in m["versions"]
        }
        cutoff = time.time() - older_than_seconds
        removed = []
        for name in sorted(os.listdir(self.base)):
            p = os.path.join(self.base, name)
            if (
                os.path.isdir(p)
                and name.startswith("v=")
                and name not in live
                and os.path.getmtime(p) <= cutoff
            ):
                shutil.rmtree(p, ignore_errors=True)
                removed.append(name)
        return removed

    def evolve_partitioning(
        self, spark: SparkSession, partition_by: list[str] | None
    ) -> int:
        """Partition evolution: rewrite the CURRENT snapshot under a
        new partition layout as a new commit. Old snapshots keep their
        own layouts (each manifest entry records `partition_by`, and
        reads/time travel resolve per snapshot — Iceberg's spec-v2
        evolution semantics, where layout is snapshot metadata, not
        table DDL). Lets a table start unpartitioned and adopt e.g.
        daily partitioning once it grows, without rewriting history."""
        m = self._load_manifest()
        if m["current"] is None:
            raise FileNotFoundError("nothing to repartition")
        df = spark.read.parquet(self._data_dir(m["current"]))
        return self.write(
            df,
            mode="overwrite",
            partition_by=partition_by,
            expected_current=m["current"],
        )


# ---------------------------------------------------- write-path switch

def iceberg_catalog(spark: SparkSession) -> str | None:
    """Name of an Iceberg catalog configured on this session, or None.

    Iceberg's Spark integration is declared purely via conf
    (`spark.sql.catalog.<name> = org.apache.iceberg.spark.SparkCatalog`);
    `SET` lists every explicitly-set conf, including runtime ones, so
    detection works under any caller-provided session.
    """
    for r in spark.sql("SET").collect():
        k, v = r["key"], str(r["value"])
        # exactly `spark.sql.catalog.<name>` — sub-keys like
        # `spark.sql.catalog.<name>.type` have one more dot
        if (
            k.startswith("spark.sql.catalog.")
            and k.count(".") == 3
            and "iceberg" in v.lower()
        ):
            return k.rsplit(".", 1)[1]
    return None


class CatalogTable:
    """Interchangeable write path (SURVEY §7.1): one API that commits to
    a Spark-native Iceberg table when an Iceberg catalog is configured
    on the session, and to the parquet-backed `VersionedTable` (same
    snapshot semantics, this module) when none is — so local runs and a
    real lakehouse deployment share call sites.

    `backend` forces the choice ("iceberg" / "parquet"); by default it
    is resolved per-session via `iceberg_catalog`. The Iceberg branch
    uses only the public DataFrameWriterV2 / SQL-procedure surface
    (`writeTo(...).using("iceberg")`, `VERSION AS OF`,
    `system.rewrite_data_files`, `system.expire_snapshots`,
    `system.rollback_to_snapshot`) — any failure from a missing runtime
    surfaces as Spark's own "iceberg data source not found" error.
    """

    def __init__(
        self,
        spark: SparkSession,
        identifier: str,
        base_path: str,
        backend: str | None = None,
    ):
        if backend not in (None, "iceberg", "parquet"):
            raise ValueError(f"unknown backend: {backend}")
        self.spark = spark
        self.identifier = identifier
        self.backend = backend or (
            "iceberg" if iceberg_catalog(spark) else "parquet"
        )
        self._vt = (
            VersionedTable(base_path) if self.backend == "parquet" else None
        )

    # -- write / merge

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ):
        if self.backend == "parquet":
            return self._vt.write(df, mode=mode, partition_by=partition_by)
        from pyspark.sql import functions as F

        w = df.writeTo(self.identifier).using("iceberg")
        if partition_by:
            w = w.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "overwrite":
            w.createOrReplace()
        elif mode == "append":
            w.append()
        else:
            raise ValueError(f"unsupported mode: {mode}")
        return None

    def upsert(self, changes: DataFrame, key_cols: list[str]):
        if self.backend == "parquet":
            return self._vt.upsert(changes, key_cols)
        # Unique per-call view: a fixed name would race concurrent
        # upserts on the same session (one caller's MERGE reading
        # another's rows) and leak the view afterwards.
        import uuid

        view = f"_catalog_upsert_{uuid.uuid4().hex}"
        changes.createOrReplaceTempView(view)
        try:
            on = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
            self.spark.sql(
                f"MERGE INTO {self.identifier} t USING {view} s "
                f"ON {on} WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        finally:
            self.spark.catalog.dropTempView(view)
        return None

    # -- read / time travel

    def read(self, version: int | None = None) -> DataFrame:
        """Current snapshot, or time-travel to sequential `version`.

        `version` keeps VersionedTable's sequential meaning (0 = first
        commit) on BOTH backends: Iceberg snapshot IDs are random longs,
        so the ordinal is resolved through the table's `snapshots`
        metadata relation (ordered by commit time) before `VERSION AS
        OF` — call sites stay interchangeable.
        """
        if self.backend == "parquet":
            return self._vt.read(self.spark, version=version)
        if version is None:
            return self.spark.read.table(self.identifier)
        snaps = (
            self.spark.sql(
                f"SELECT snapshot_id FROM {self.identifier}.snapshots "
                "ORDER BY committed_at"
            )
            .collect()
        )
        if not 0 <= int(version) < len(snaps):
            raise ValueError(
                f"unknown version {version}; have 0..{len(snaps) - 1}"
            )
        sid = snaps[int(version)]["snapshot_id"]
        return self.spark.sql(
            f"SELECT * FROM {self.identifier} VERSION AS OF {sid}"
        )

    # -- maintenance

    def _catalog_name(self) -> str:
        """Catalog for `CALL <cat>.system.*`: the identifier's first
        part only when fully qualified (cat.db.table) — a 2-part
        identifier's first part is a NAMESPACE in the session default
        catalog, so fall back to the configured Iceberg catalog."""
        parts = self.identifier.split(".")
        if len(parts) >= 3:
            return parts[0]
        cat = iceberg_catalog(self.spark)
        if cat is None:
            raise ValueError(
                f"cannot derive Iceberg catalog for '{self.identifier}'"
            )
        return cat

    def compact(self, target_file_bytes: int = 128 * 1024 * 1024):
        if self.backend == "parquet":
            return self._vt.compact(self.spark, target_file_bytes)
        cat = self._catalog_name()
        self.spark.sql(
            f"CALL {cat}.system.rewrite_data_files(table => "
            f"'{self.identifier}', options => map("
            f"'target-file-size-bytes', '{int(target_file_bytes)}'))"
        )
        return None

    def expire(self, keep_last: int = 1):
        if self.backend == "parquet":
            return self._vt.expire(keep_last=keep_last)
        cat = self._catalog_name()
        self.spark.sql(
            f"CALL {cat}.system.expire_snapshots(table => "
            f"'{self.identifier}', retain_last => {int(keep_last)})"
        )
        return None
