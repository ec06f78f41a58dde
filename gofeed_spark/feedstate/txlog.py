"""Multi-writer atomic multi-table commits over plain parquet.

``transactional_write`` (admin.py) is the single-writer staging dance; this
log provides the piece the reference gets from its DB and Delta gets from
its log protocol — ARBITRATION BETWEEN CONCURRENT COMMITTERS — using the
one primitive every local/posix filesystem gives us: create-exclusive
(``os.open(..., O_CREAT | O_EXCL)``).  It is the storage-layer twin of the
reference's transaction + optimistic save (repo.go:125-138, 164-170): a
losing committer gets a ``CommitConflict`` and re-reads, exactly the
``dirty=false`` path.

Layout::

    base/_txlog/00000001.json           manifest: {"tables": {name: dir}}
    base/items__v00000001_ab12cd34/     immutable parquet snapshot dirs
    base/partitions__v00000001_ab12cd34/  (writer-unique suffix: racing
                                         committers never share a dir)

Commit protocol (optimistic):

1. resolve the current version V (highest parseable manifest),
2. write every table's new snapshot dir suffixed ``__V+1`` (invisible —
   readers only follow manifests),
3. claim ``_txlog/V+1.json`` with O_CREAT|O_EXCL — exactly one concurrent
   committer can win the claim; losers remove their orphan snapshot dirs
   and raise ``CommitConflict``,
4. write the manifest payload to the claimed fd, fsync, close.

Crash analysis: before (3) → invisible orphan dirs, removed by ``vacuum``;
during (4) → an unparseable manifest *burns* that version number (readers
skip it, the next committer claims V+2) but never exposes a torn state;
readers always see the highest fully-written manifest, which names only
completely-written snapshot dirs.  Multi-table atomicity holds because one
manifest names every table of the commit.

On S3-class object stores without atomic create-exclusive, step (3) maps
to a conditional PUT (if-none-match) — same protocol, same guarantees.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class CommitConflict(Exception):
    """Another committer claimed this version first — re-read and retry."""


class TxLog:
    """Versioned multi-table parquet store with optimistic multi-writer
    commits (see module docstring for the protocol)."""

    def __init__(self, base: str):
        self.base = base
        self.logdir = os.path.join(base, "_txlog")
        os.makedirs(self.logdir, exist_ok=True)

    # -- resolution ------------------------------------------------------
    def _manifest_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.logdir):
            stem, ext = os.path.splitext(name)
            if ext == ".json" and stem.isdigit():
                out.append(int(stem))
        return sorted(out)

    def _load(self, version: int) -> dict | None:
        try:
            with open(os.path.join(self.logdir, f"{version:08d}.json")) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None  # burned version (crash mid-write) — skip

    def latest(self) -> tuple[int, dict[str, str]]:
        """(version, {table: snapshot dir}) of the newest complete commit;
        (0, {}) for an empty log."""
        for v in reversed(self._manifest_versions()):
            m = self._load(v)
            if m is not None:
                return v, dict(m["tables"])
        return 0, {}

    def read(self, spark: SparkSession, table: str, version: int | None = None) -> DataFrame:
        """Read ``table`` at the latest (or a pinned) committed version."""
        if version is None:
            _, tables = self.latest()
        else:
            m = self._load(version)
            if m is None:
                raise ValueError(f"no complete commit at version {version}")
            tables = m["tables"]
        if table not in tables:
            raise ValueError(f"table {table!r} not in commit: {sorted(tables)}")
        return spark.read.parquet(os.path.join(self.base, tables[table]))

    # -- commit ----------------------------------------------------------
    def commit(
        self,
        writes: dict[str, DataFrame],
        expected_version: int | None = None,
    ) -> int:
        """Atomically commit new contents for every table in ``writes``.

        A value may be a DataFrame (staged as a new snapshot dir) or a str
        naming an EXISTING snapshot dir from a prior manifest — carrying an
        unchanged table into the new commit without rewriting a byte
        (vacuum keeps every dir the retained manifests reference).

        ``expected_version`` (optional OCC pre-check): conflict immediately
        if the log has moved past the version this writer based its work
        on — saves staging work; the O_EXCL claim is the real arbiter.
        Returns the committed version; raises ``CommitConflict`` on loss.
        """
        versions = self._manifest_versions()
        # OCC pre-check compares COMPLETE commits only (latest() semantics):
        # a burned manifest must not wedge every expected_version commit
        # forever.  The claim target still skips burned numbers.
        if expected_version is not None:
            current_complete = self.latest()[0]
            if current_complete != expected_version:
                raise CommitConflict(
                    f"log at v{current_complete}, expected v{expected_version}"
                )
        target = (versions[-1] if versions else 0) + 1
        # Writer-unique snapshot names: two committers racing for the same
        # target version must never stage into one directory (the manifest,
        # not the name, decides which becomes visible).
        token = uuid.uuid4().hex[:8]
        staged: dict[str, str] = {}
        fresh: list[str] = []
        for name, df in writes.items():
            if isinstance(df, str):  # re-reference an existing snapshot
                staged[name] = df
                continue
            rel = f"{name}__v{target:08d}_{token}"
            df.write.mode("overwrite").parquet(os.path.join(self.base, rel))
            staged[name] = rel
            fresh.append(rel)
        claim = os.path.join(self.logdir, f"{target:08d}.json")
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            for rel in fresh:  # lost the race: remove OUR orphans only
                shutil.rmtree(os.path.join(self.base, rel), ignore_errors=True)
            raise CommitConflict(f"version {target} claimed by another writer") from None
        with os.fdopen(fd, "w") as f:
            json.dump({"version": target, "tables": staged}, f)
            f.flush()
            os.fsync(f.fileno())
        return target

    def commit_retry(
        self,
        compute: "callable",
        max_attempts: int = 16,
    ) -> int:
        """The reference's re-read loop: ``compute(spark_unused, version,
        tables)`` → writes dict, retried until a commit lands."""
        for _ in range(max_attempts):
            version, tables = self.latest()
            writes = compute(version, tables)
            try:
                return self.commit(writes, expected_version=version)
            except CommitConflict:
                continue
        raise CommitConflict(f"no commit after {max_attempts} attempts")

    # -- maintenance -----------------------------------------------------
    def vacuum(self, keep: int = 2, min_age_s: float = 3600.0) -> list[str]:
        """Remove snapshot dirs not referenced by the last ``keep`` complete
        commits (and orphans from crashed/conflicted commits).  Returns the
        removed dir names.

        ``min_age_s`` is the retention window (Delta-style): a dir younger
        than this is NEVER removed even if unreferenced, because it may be
        an in-flight committer's staged snapshot that has not claimed its
        manifest yet — deleting it would let the claim succeed and publish
        a manifest pointing at nothing."""
        import time

        complete = [v for v in self._manifest_versions() if self._load(v) is not None]
        keep_versions = complete[-keep:] if keep else []
        live = set()
        for v in keep_versions:
            live.update(self._load(v)["tables"].values())
        removed = []
        now = time.time()
        for name in os.listdir(self.base):
            if name.startswith("_") or name in live:
                continue
            if "__v" not in name:  # not ours (snapshot-dir naming convention)
                continue
            full = os.path.join(self.base, name)
            try:
                if now - os.path.getmtime(full) < min_age_s:
                    continue  # possibly an in-flight commit's staging
            except OSError:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed.append(name)
        return removed
