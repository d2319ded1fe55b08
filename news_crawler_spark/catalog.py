"""Snapshot catalog: Iceberg-shaped table API with a parquet fallback.

The engine's state tables (frontier, documents, lineage, tokens, pops)
are written as round-numbered snapshots with atomic commit markers, giving
the two properties the design needs without an Iceberg runtime jar (none is
available in-sandbox — download_jars.sh in the reference pulls them from
Maven, which we cannot do):

- MERGE-equivalent round transitions: the *pending* slice of the frontier
  is rewritten per round while completed/failed rows are append-only —
  the same write amplification profile as an Iceberg copy-on-write MERGE
  partitioned by status.
- snapshot isolation + resume: a round's writes become visible only when
  its ``_COMMIT_<k>`` marker lands; resume = read the largest committed
  round. A crash mid-round leaves a dangling uncommitted directory that is
  ignored and overwritten on retry (write path is idempotent).

On a real cluster, swap ``SnapshotCatalog`` for Iceberg
(``MERGE INTO frontier``, snapshot ids instead of round markers); the
engine only uses this module's narrow API, so nothing else changes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from .functions import fsio

_COMMIT_RE = re.compile(r"^_COMMIT_(\d+)$")


class SnapshotCatalog:
    """All direct (non-Spark) IO goes through :mod:`functions.fsio`, so
    ``root`` may be a plain local path or any ``pyarrow.fs``-resolvable
    URI (``file://``, ``hdfs://``, ``s3://``/``s3a://``, ``gs://``) —
    the Spark read/write paths already accepted URIs, and round 5 made
    the marker/listing/prune side match (ADVICE round 4)."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        fsio.makedirs(root)

    # -- commit protocol ----------------------------------------------------
    def committed_rounds(self) -> list[int]:
        out = []
        for name in fsio.listdir(self.root):
            m = _COMMIT_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_round(self) -> int | None:
        rounds = self.committed_rounds()
        return rounds[-1] if rounds else None

    def commit(self, round_no: int) -> None:
        fsio.touch(fsio.join(self.root, f"_COMMIT_{round_no}"))

    # -- table io -----------------------------------------------------------
    def _path(self, table: str, round_no: int) -> str:
        return fsio.join(self.root, table, f"round={round_no}")

    def write(self, table: str, round_no: int, df: DataFrame) -> None:
        """Idempotent snapshot write (overwrite → crash-retry safe)."""
        df.write.mode("overwrite").parquet(self._path(table, round_no))

    def read(self, table: str, round_no: int) -> DataFrame:
        return self.spark.read.parquet(self._path(table, round_no))

    def copy_snapshot(self, table: str, from_round: int, to_round: int) -> None:
        """Carry a snapshot forward unchanged as a file copy — no Spark
        job for a byte-identical table (Iceberg analog: a new snapshot
        pointing at the same data files, metadata-only)."""
        src, dst = self._path(table, from_round), self._path(table, to_round)
        fsio.copytree(src, dst)

    def exists(self, table: str, round_no: int) -> bool:
        return any(
            f.endswith(".parquet") or f == "_SUCCESS"
            for f in fsio.listdir(self._path(table, round_no))
        )

    def latest_existing(self, table: str, upto_round: int) -> int | None:
        """Largest round ≤ upto_round with a written snapshot of ``table``
        (commit-agnostic — callers pass an already-committed upper bound)."""
        for r in range(upto_round, -1, -1):
            if self.exists(table, r):
                return r
        return None

    def prune_upto(self, table: str, upto_round: int) -> None:
        """Remove snapshots of ``table`` with round ≤ upto_round — called
        only AFTER a commit whose compacted snapshot supersedes them, so
        a crash mid-prune just leaves unread garbage for the next call."""
        tdir = fsio.join(self.root, table)
        for name in fsio.listdir(tdir):
            if name.startswith("round=") and int(name.split("=", 1)[1]) <= upto_round:
                fsio.rmtree(fsio.join(tdir, name))

    def read_all(self, table: str, upto_round: int | None = None) -> DataFrame:
        """Union of all committed snapshots of an append-only table."""
        rounds = self.committed_rounds()
        if upto_round is not None:
            rounds = [r for r in rounds if r <= upto_round]
        paths = [self._path(table, r) for r in rounds if self.exists(table, r)]
        if not paths:
            raise FileNotFoundError(f"no committed snapshots for {table}")
        return self.spark.read.parquet(*paths)

    def drop_uncommitted(self) -> None:
        """Remove dangling round dirs newer than the last commit (crash
        cleanup before resume)."""
        latest = self.latest_round()
        for table in fsio.listdir(self.root):
            if _COMMIT_RE.match(table):
                continue
            tdir = fsio.join(self.root, table)
            if not fsio.is_dir(tdir):
                continue
            for name in fsio.listdir(tdir):
                if not name.startswith("round="):
                    continue
                rno = int(name.split("=", 1)[1])
                if latest is None or rno > latest:
                    fsio.rmtree(fsio.join(tdir, name))
