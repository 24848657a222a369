"""hfind — predicate find over a file tree.

Parity target: ``/root/reference/src/com/blackberry/logdriver/admin/
HFind.java`` — a find(1) analog over HDFS with name/size/mtime/type
predicates, pruning directories whose mtime window can't contain
matches.

Spark-first: the file *listing* is driver/metastore work in any engine
(the reference walks the NameNode; we walk the local/posix FS or rely on
Spark's file index), but the predicate *evaluation* is a DataFrame over
the listing, so the same filters compose with everything else.
"""

from __future__ import annotations

import fnmatch
import os
import stat

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("is_dir", T.BooleanType()),
        T.StructField("size", T.LongType()),
        T.StructField("mtime_ms", T.LongType()),
        T.StructField("depth", T.IntegerType()),
    ]
)


def list_tree(root: str, max_depth: int | None = None) -> list[tuple]:
    """Recursive listing → (path, name, is_dir, size, mtime_ms, depth).

    ``max_depth`` follows find(1) -maxdepth: entries deeper than it are
    neither listed nor descended into.

    SCALE BOUND (deliberate): the walk runs DRIVER-SIDE, faithful to
    the reference's HFind.java — itself a single-process tree walker —
    and right-sized for admin trees (10^4-10^6 entries). At 10^7+
    files the driver enumerates alone; the scale path is to parallelize
    per top-level subtree (one ``list_tree(child)`` task per first-level
    directory via the JVM-side file index or a small RDD of subtree
    roots) and union the results — the schema and downstream filters
    are unchanged. Not done here because every reference workload this
    mirrors (log-store maintenance listings) is driver-tractable.
    """
    out: list[tuple] = []

    def walk(dirpath: str, depth: int) -> None:
        if max_depth is not None and depth + 1 > max_depth:
            return
        try:
            entries = sorted(os.listdir(dirpath))
        except OSError:
            return
        for entry in entries:
            p = os.path.join(dirpath, entry)
            try:
                # lstat: do not follow symlinks (find(1) default) — a
                # symlink cycle back to an ancestor must not recurse.
                st = os.lstat(p)
            except OSError:
                continue
            is_dir = stat.S_ISDIR(st.st_mode)
            out.append(
                (p, entry, is_dir, int(st.st_size), int(st.st_mtime * 1000), depth + 1)
            )
            if is_dir:
                walk(p, depth + 1)

    walk(root.rstrip("/"), 0)
    return out


def hfind(
    spark: SparkSession,
    root: str,
    name_glob: str | None = None,
    min_size: int | None = None,
    max_size: int | None = None,
    mtime_after_ms: int | None = None,
    mtime_before_ms: int | None = None,
    file_type: str | None = None,  # 'f' | 'd'
    max_depth: int | None = None,
) -> DataFrame:
    """find(1)-style query returning a DataFrame of matching entries."""
    df = spark.createDataFrame(list_tree(root, max_depth), FILE_SCHEMA)
    if name_glob is not None:
        # fnmatch.translate targets re.match (implicitly start-anchored,
        # \Z-suffixed) but rlike has unanchored find() semantics — anchor
        # the start explicitly so 'foo.log' does not match 'xfoo.log'
        # (full-name matching, as in find(1) -name / HFind).
        df = df.filter(F.col("name").rlike("\\A" + fnmatch.translate(name_glob)))
    if file_type == "f":
        df = df.filter(~F.col("is_dir"))
    elif file_type == "d":
        df = df.filter(F.col("is_dir"))
    if min_size is not None:
        df = df.filter(F.col("size") >= min_size)
    if max_size is not None:
        df = df.filter(F.col("size") <= max_size)
    if mtime_after_ms is not None:
        df = df.filter(F.col("mtime_ms") >= mtime_after_ms)
    if mtime_before_ms is not None:
        df = df.filter(F.col("mtime_ms") <= mtime_before_ms)
    return df.orderBy("path")
