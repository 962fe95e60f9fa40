"""Sink compaction: the small-files maintenance pass.

A streaming/batch fan-out sink accumulates many small parquet files per
partition (one per task per micro-batch/run); at warehouse scale that
degrades every downstream scan (file-open overhead, tiny row groups, NN
pressure). This job rewrites each route partition to ~target-sized
files, idempotently, preserving the partition layout and every row.

Spark-first shape: per-partition byte size comes from the Hadoop
FileSystem (works for local, hdfs://, s3a://), the rewrite is a
coalesce to ceil(bytes/target) — a NARROW dependency, no shuffle — and
the swap uses a hidden staging area at ``<root>/_compaction`` (the
``_`` prefix keeps Spark's partition discovery and the stats walk away
from in-flight data, so readers NEVER see swap directories as bogus
partition values).

Crash-safety protocol per partition (raw filesystems have no atomic
dir swap; Iceberg's RewriteDataFiles makes this a metadata commit —
that is the upgrade path this seam maps to):

1. write compacted copy to   _compaction/tmp/<relpath>
2. rename live partition to  _compaction/old/<relpath>   (backup)
3. rename tmp into place
4. delete the backup

Every rename's boolean return is CHECKED (Hadoop reports failure by
returning false, not raising); a failed step 3 rolls the backup
straight back. ``recover_sinks`` — run automatically at the start of
``compact_sinks`` — restores any partition left at step 2/3 by a crash
and clears stale tmp dirs, so a crashed compaction is always healed by
the next run.

NOT valid for Iceberg table directories (renames under the manifests
would corrupt the table) — job.py gates --compact to parquet.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession

DEFAULT_TARGET_BYTES = 128 * 1024 * 1024
_STAGING = "_compaction"


def _fs(spark: SparkSession, path: str):
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath


def _rename(fs, src, dst, what: str) -> None:
    if not fs.rename(src, dst):
        raise IOError(f"compaction rename failed ({what}): {src} -> {dst}")


def partition_stats(spark: SparkSession, root: str) -> list[dict]:
    """(partition_path, n_files, n_bytes) for every leaf partition dir
    under root (recursive; a leaf = dir containing data files). Hidden
    dirs (``_``/``.`` prefix — including the _compaction staging area)
    are skipped, matching Spark's own partition discovery."""
    fs, jroot = _fs(spark, root)
    out: list[dict] = []

    def walk(jdir):
        files, dirs = [], []
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            if st.isDirectory():
                if not name.startswith(("_", ".")):
                    dirs.append(st.getPath())
            elif not name.startswith(("_", ".")):
                files.append(st)
        if files:
            out.append(
                {
                    "path": jdir.toString(),
                    "n_files": len(files),
                    "n_bytes": sum(st.getLen() for st in files),
                }
            )
        for d in dirs:
            walk(d)

    walk(jroot)
    return out


def _qualified_path(spark: SparkSession, path: str) -> str:
    """Comparable fully-qualified form of a path: the owning FileSystem
    adds scheme/authority and resolves relative paths, then the URI is
    rebuilt as scheme://authority/path. ``/root/x``, ``file:/root/x``
    and ``file:///root/x`` normalize identically — partition_stats hands
    back qualified URIs while callers pass plain roots — but paths on
    DIFFERENT filesystems/buckets stay distinct (dropping the scheme
    would let s3a://bucket-b/sink pass a bucket-a root check and park a
    backup across filesystems)."""
    fs, jpath = _fs(spark, path)
    uri = fs.makeQualified(jpath).toUri()
    scheme = uri.getScheme() or ""
    authority = uri.getAuthority() or ""
    return f"{scheme}://{authority}{uri.getPath()}".rstrip("/")


def _staging_paths(spark: SparkSession, root: str, partition_path: str):
    """(tmp, old) staging paths for a partition, keyed by its FULL path
    relative to root so the layout nests cleanly for any partition depth
    (``batch=0/route=hit`` parks at ``_compaction/old/batch=0/route=hit``,
    never at a leaf-only name that recovery would restore to the wrong
    level)."""
    root_str = root.rstrip("/")
    root_norm = _qualified_path(spark, root)
    part_norm = _qualified_path(spark, partition_path)
    if part_norm == root_norm:
        rel = ""
    elif part_norm.startswith(root_norm + "/"):
        rel = part_norm[len(root_norm) + 1:]
    else:
        raise ValueError(
            f"partition {partition_path!r} is not under sink root {root!r}; "
            "refusing to stage it (a misplaced backup corrupts recovery)"
        )
    suffix = f"/{rel}" if rel else ""
    return (
        f"{root_str}/{_STAGING}/tmp{suffix}",
        f"{root_str}/{_STAGING}/old{suffix}",
    )


def _list_data_files(fs, jdir):
    return [
        st.getPath()
        for st in fs.listStatus(jdir)
        if not st.isDirectory() and not st.getPath().getName().startswith(("_", "."))
    ]


def _compact_root(
    spark: SparkSession,
    root: str,
    file_format: str,
    target_bytes: int,
) -> int:
    """Unpartitioned layout: the data files sit directly at the sink
    root, which cannot be dir-renamed into its own ``_compaction``
    subtree (the round-2 advisor's finding — Hadoop rename returns false
    and the pass aborted). Same four-step protocol at FILE granularity,
    made crash-recoverable by a manifest:

    1. write the compacted copy to   _compaction/tmp
    2. write _compaction/old/_MANIFEST naming the tmp data files (the
       only way recovery can tell a swapped-in file from an original —
       tmp part-file names are fresh UUIDs, disjoint from the originals)
    3. move each original root file to _compaction/old/
    4. move each tmp file into the root; delete old (originals +
       manifest) FIRST, then tmp

    ``_recover_root`` heals any crash point: a crash before the swap-in
    completes rolls BACK (delete manifest-named root files, restore the
    parked originals); a crash during step 4's old/ cleanup — detected
    by every manifest-named file being live at the root, or by parked
    files surviving the manifest — rolls FORWARD (finish deleting
    old/), since by then some originals may already be gone and a
    rollback would lose or duplicate rows."""
    root_str = root.rstrip("/")
    fs, jroot = _fs(spark, root_str)
    # ONLY the files sitting directly at the root: a mixed layout (root
    # files + partition subdirs) compacts each leaf with its own
    # protocol, and a recursive read here would either fail on
    # conflicting directory depths or fold subdir bytes into n_out.
    root_files = [st for st in fs.listStatus(jroot)
                  if not st.isDirectory()
                  and not st.getPath().getName().startswith(("_", "."))]
    n_bytes = sum(st.getLen() for st in root_files)
    n_out = max(1, math.ceil(n_bytes / target_bytes))
    tmp, old = f"{root_str}/{_STAGING}/tmp", f"{root_str}/{_STAGING}/old"
    df = spark.read.format(file_format).load(
        [st.getPath().toString() for st in root_files]
    )
    df.coalesce(n_out).write.mode("overwrite").format(file_format).save(tmp)
    _f1, jtmp = _fs(spark, tmp)
    _f2, jold = _fs(spark, old)
    jvm = spark._jvm
    tmp_files = _list_data_files(fs, jtmp)
    fs.mkdirs(jold)
    jman = jvm.org.apache.hadoop.fs.Path(f"{old}/_MANIFEST")
    out = fs.create(jman, True)
    out.write(bytearray("\n".join(p.getName() for p in tmp_files).encode()))
    out.close()
    for p in _list_data_files(fs, jroot):
        _rename(fs, p, jvm.org.apache.hadoop.fs.Path(f"{old}/{p.getName()}"),
                "backup-file")
    for p in tmp_files:
        _rename(fs, p, jvm.org.apache.hadoop.fs.Path(f"{root_str}/{p.getName()}"),
                "swap-in-file")
    fs.delete(jold, True)
    fs.delete(jtmp, True)
    return n_out


def _recover_root(spark: SparkSession, root_str: str) -> bool:
    """Heal a crashed root-level compaction (see _compact_root). Returns
    True when originals were restored (rollback); False when there was
    nothing to do or the compaction had already completed (roll-forward).

    The direction is decided by whether step 4's swap-in finished:

    - manifest present and EVERY named file live at the root: the swap
      completed and the crash hit the old/ cleanup (which may have
      already deleted some parked originals — rolling back here would
      lose the rows that existed only in those originals, or duplicate
      rows if the manifest died first). Roll FORWARD: finish deleting
      old/.
    - manifest missing but parked files remain: the cleanup's recursive
      delete removed the manifest before the originals. The manifest is
      written before any original is parked, so this state is only
      reachable after a completed swap — roll forward too.
    - manifest present with named files missing from the root: the
      crash interrupted the swap-in. Roll back: delete the swapped-in
      files, restore the parked originals."""
    fs, jold = _fs(spark, f"{root_str}/{_STAGING}/old")
    if not fs.exists(jold):
        return False
    jvm = spark._jvm
    jman = jvm.org.apache.hadoop.fs.Path(f"{root_str}/{_STAGING}/old/_MANIFEST")
    parked = [
        st.getPath()
        for st in fs.listStatus(jold)
        if not st.isDirectory() and st.getPath().getName() != "_MANIFEST"
    ]
    if not fs.exists(jman):
        if parked:  # completed swap, manifest deleted first: roll forward
            fs.delete(jold, True)
        return False
    stream = fs.open(jman)
    text = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    stream.close()
    names = [n for n in text.split("\n") if n]
    live = [
        jvm.org.apache.hadoop.fs.Path(f"{root_str}/{name}") for name in names
    ]
    if names and all(fs.exists(jf) for jf in live):
        fs.delete(jold, True)  # completed swap: roll forward
        return False
    for jf in live:
        if fs.exists(jf):
            fs.delete(jf, False)
    restored = False
    for p in parked:
        dst = jvm.org.apache.hadoop.fs.Path(f"{root_str}/{p.getName()}")
        if fs.exists(dst):
            fs.delete(dst, False)
        _rename(fs, p, dst, "recover-file")
        restored = True
    fs.delete(jold, True)  # consumed: originals restored, manifest stale
    return restored


def compact_partition(
    spark: SparkSession,
    root: str,
    partition_path: str,
    file_format: str = "parquet",
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> int:
    """Rewrite ONE leaf partition into ceil(bytes/target) files via the
    staged swap (module docstring); a partition that IS the sink root
    (unpartitioned layout) takes the file-granular protocol instead.
    Returns the new file count."""
    if _qualified_path(spark, partition_path) == _qualified_path(spark, root):
        return _compact_root(spark, root, file_format, target_bytes)
    stats = partition_stats(spark, partition_path)
    n_bytes = sum(s["n_bytes"] for s in stats)
    n_out = max(1, math.ceil(n_bytes / target_bytes))
    tmp, old = _staging_paths(spark, root, partition_path)
    df = spark.read.format(file_format).load(partition_path)
    df.coalesce(n_out).write.mode("overwrite").format(file_format).save(tmp)
    fs, jtmp = _fs(spark, tmp)
    _f1, jdst = _fs(spark, partition_path)
    _f2, jold = _fs(spark, old)
    fs.delete(jold, True)
    fs.mkdirs(jold.getParent())
    _rename(fs, jdst, jold, "backup")
    try:
        _rename(fs, jtmp, jdst, "swap-in")
    except IOError:
        _rename(fs, jold, jdst, "rollback")  # restore, then re-raise
        raise
    fs.delete(jold, True)
    return n_out


def recover_sinks(spark: SparkSession, root: str) -> list[str]:
    """Heal partitions left mid-swap by a crashed compaction: for every
    backup under ``_compaction/old`` whose live partition is missing,
    rename the backup into place; then clear all staging state.
    Returns the restored partition paths."""
    root_str = root.rstrip("/")
    fs, jstage = _fs(spark, f"{root_str}/{_STAGING}/old")
    restored: list[str] = []
    if _recover_root(spark, root_str):
        restored.append(root_str)

    def walk(jdir, rel: str):
        for st in fs.listStatus(jdir):
            name = st.getPath().getName()
            sub = f"{rel}/{name}" if rel else name
            if not st.isDirectory():
                continue
            _f, jlive = _fs(spark, f"{root_str}/{sub}")
            # a backup dir containing files = a parked partition
            has_files = any(
                not s.isDirectory() for s in fs.listStatus(st.getPath())
            )
            if has_files:
                if not fs.exists(jlive):
                    fs.mkdirs(jlive.getParent())
                    _rename(fs, st.getPath(), jlive, "recover")
                    restored.append(f"{root_str}/{sub}")
            else:
                walk(st.getPath(), sub)

    if fs.exists(jstage):
        walk(jstage, "")
    _f, jall = _fs(spark, f"{root_str}/{_STAGING}")
    fs.delete(jall, True)
    return restored


def compact_sinks(
    spark: SparkSession,
    root: str,
    file_format: str = "parquet",
    target_bytes: int = DEFAULT_TARGET_BYTES,
    min_files: int = 2,
) -> dict:
    """Recover any crashed prior compaction, then compact every leaf
    partition under root that has more than ``min_files`` files AND more
    files than the target layout needs. A single small file has nothing
    to merge — skip it. Returns {partition: (files_before, files_after)}."""
    if file_format != "parquet":
        raise ValueError(
            "compact_sinks only supports raw parquet layouts; table "
            "formats (iceberg) compact via their own metadata-commit "
            "rewrite (RewriteDataFiles)"
        )
    recover_sinks(spark, root)
    summary: dict[str, tuple[int, int]] = {}
    for s in partition_stats(spark, root):
        if s["n_files"] <= min_files:
            continue
        if s["n_files"] <= math.ceil(s["n_bytes"] / target_bytes):
            continue  # already at (or below) the target file count
        after = compact_partition(spark, root, s["path"], file_format, target_bytes)
        summary[s["path"]] = (s["n_files"], after)
    # Clear the (now-empty) staging skeleton so a healthy sink carries
    # no hidden dirs between maintenance runs.
    fs, jstage = _fs(spark, f"{root.rstrip('/')}/{_STAGING}")
    fs.delete(jstage, True)
    return summary
