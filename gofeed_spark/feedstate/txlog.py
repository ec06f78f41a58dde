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
3. write the FULL manifest payload to a writer-unique temp file in the
   log dir, fsync it,
4. publish atomically via ``_claim`` — ``os.link(tmp, V+1.json)`` — which
   fails with EEXIST when another committer already published V+1; losers
   remove their orphan snapshot dirs and raise ``CommitConflict``.

A manifest therefore either does not exist or is complete: there is no
claim-to-fsync window in which a competitor's ``latest()`` could observe
V+1 as claimed-but-torn and base a V+2 commit on V (the lost-update race
of a claim-then-write protocol), and no version number is ever "burned"
by a crash mid-manifest-write — a crash before (4) leaves only an
invisible temp file and orphan snapshot dirs, both removed by ``vacuum``.
Readers always see the highest fully-written manifest, which names only
completely-written snapshot dirs.  Multi-table atomicity holds because
one manifest names every table of the commit.  (Readers still skip any
unparseable manifest defensively — e.g. one hand-corrupted on disk.)

Deployment mapping for the arbitration primitive (``_claim``): POSIX
filesystems use hard-link-exclusive as above; S3 maps to a conditional
PUT (``If-None-Match: *``), GCS to ``x-goog-if-generation-match: 0`` —
same protocol, same guarantees.  ``_claim`` is the single seam to swap.
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
        # Write the complete manifest to a writer-unique temp file FIRST
        # (fsynced), then publish it atomically: the manifest never exists
        # in a half-written state, so a competitor's latest() can never
        # observe a claimed-but-torn version and base a commit that drops
        # this one's changes.
        tmp = os.path.join(self.logdir, f".tmp_{target:08d}_{token}.json")
        with open(tmp, "w") as f:
            json.dump({"version": target, "tables": staged}, f)
            f.flush()
            os.fsync(f.fileno())
        claim = os.path.join(self.logdir, f"{target:08d}.json")
        try:
            self._claim(tmp, claim)
        except FileExistsError:
            for rel in fresh:  # lost the race: remove OUR orphans only
                shutil.rmtree(os.path.join(self.base, rel), ignore_errors=True)
            os.unlink(tmp)
            raise CommitConflict(f"version {target} claimed by another writer") from None
        os.unlink(tmp)  # the published link keeps the inode alive
        return target

    @staticmethod
    def _claim(tmp: str, claim: str) -> None:
        """The arbitration primitive: atomically publish a fully-written
        manifest, failing with ``FileExistsError`` if another committer
        already published this version.

        POSIX: hard link (atomic, create-exclusive).  Object-store
        deployments replace exactly this method: S3 → ``PUT`` with
        ``If-None-Match: *``; GCS → ``x-goog-if-generation-match: 0``;
        Azure → ``If-None-Match: *`` on Put Blob.  Everything else in the
        protocol is already object-store-safe (immutable snapshot dirs,
        manifest-only visibility)."""
        os.link(tmp, claim)

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
        # Stale manifest temp files (crash between manifest write and
        # publish) — invisible to readers, reclaimed after the window.
        for name in os.listdir(self.logdir):
            if not name.startswith(".tmp_"):
                continue
            full = os.path.join(self.logdir, name)
            try:
                if now - os.path.getmtime(full) >= min_age_s:
                    os.unlink(full)
                    removed.append(os.path.join("_txlog", name))
            except OSError:
                continue
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
