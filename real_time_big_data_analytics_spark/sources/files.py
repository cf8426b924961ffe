"""Schema'd CSV / JSON-lines file sources and sinks (SURVEY.md §2.1 S4/S5).

The reference reads its training table as schema-less text lines and
hand-splits them (reference ConsumerESFinal.scala:50-51) and writes
micro-batch output with ``saveAsTextFile`` (reference
ConsumerESFinal.scala:87, which crashes on the second batch — SURVEY.md
§1.4.3). Here every file source takes an explicit ``StructType`` — no
sampling-based inference pass, which at 100 TB means zero extra scans
and a stable schema regardless of which files a job happens to read —
and sinks go through the DataFrame writers (atomic per-partition task
commits, re-runnable with ``mode``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    *,
    header: bool = True,
    sep: str = ",",
) -> DataFrame:
    """S4 — columnar CSV scan with a declared schema.

    Malformed rows go to permissive-mode nulls rather than corrupting
    neighbouring fields (the reference's ``split(",")`` failure mode,
    SURVEY.md §1.4.1).
    """
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("sep", sep)
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """S4 (JSON-lines) — schema'd newline-delimited JSON scan."""
    return spark.read.schema(schema).json(path)


def write_csv(df: DataFrame, path: str, *, header: bool = True, mode: str = "overwrite") -> None:
    """S5 — CSV sink via the DataFrame writer (quoted fields, so
    embedded commas survive — unlike reference ProducerFinal.scala:79)."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S5 (JSON-lines) — lossless text sink for comma-bearing fields."""
    df.write.mode(mode).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, *, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Hive-layout partitioned parquet sink (``path/col=value/…``).

    This is the 100 TB table layout: readers filtering on the
    partition columns prune whole directories before any IO (static
    partition pruning; dynamic via DPP when joined on the partition
    key). Fact tables (orders/lineitem/events) would partition by
    date-derived columns.
    """
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    *,
    num_partitions: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Data-skipping parquet layout: range-partition on the sort key,
    then sort within each partition before writing.

    Each output file covers a disjoint key range and each row group
    inside it a contiguous sub-range, so the parquet min/max column
    stats ("zone maps") are tight: a selective predicate on the sort
    key prunes almost every row group at the footer, before any page
    IO. At 100 TB this — not the query plan — decides whether a
    point/range query reads megabytes or the whole table. The
    complement to ``write_partitioned_parquet``: directory pruning
    for the coarse (low-cardinality) key, row-group skipping for the
    fine-grained one.
    """
    if num_partitions is not None:
        ranged = df.repartitionByRange(num_partitions, *sort_cols)
    else:
        ranged = df.repartitionByRange(*sort_cols)
    ranged.sortWithinPartitions(*sort_cols).write.mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_by: str,
    n_buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Bucketed (+sorted) table layout — the co-located-join primitive.

    Two fact tables bucketed with the SAME bucket count on their join
    key sort-merge-join with ZERO Exchange: each task reads one
    matching bucket pair directly (proved by
    ``tests/test_bucketing.py``). At 100 TB this converts the
    dominant lineitem ⋈ orders shuffle into a scan-local join; the
    trade is that bucketing metadata lives in the catalog, so the
    write goes through ``saveAsTable`` and readers use
    ``spark.table(name)``, not a bare parquet path.
    """
    w = df.write.bucketBy(n_buckets, bucket_by)
    if sort:
        w = w.sortBy(bucket_by)
    w.option("path", path).mode(mode).format("parquet").saveAsTable(table)


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    *,
    target_mb: int = 128,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a parquet directory into files
    sized for scan efficiency; returns the output file count.

    Streaming sinks and fine-grained ingestion leave thousands of
    KB-scale files whose open/footer cost dominates reads at scale —
    the classic small-file problem. Sizing from the actual on-disk
    bytes (not a row-count guess) keeps output files near the target
    regardless of schema width; ``coalesce`` avoids a shuffle when
    only narrowing the partition count. Run per partition directory
    in a partitioned table so partition pruning survives compaction.

    Directory size comes from the Hadoop FileSystem API, so ``src``
    may be any Spark-readable URI (hdfs://, s3a://, file:), not just
    a bare local path — ``os.walk`` would silently report 0 bytes for
    URIs and collapse the dataset to one file.
    """
    df = spark.read.parquet(src)
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(src)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    n_bytes = fs.getContentSummary(hpath).getLength()
    n_files = max(1, round(n_bytes / (target_mb * 1024 * 1024)))
    if n_files < df.rdd.getNumPartitions():
        out = df.coalesce(n_files)
    else:
        out = df.repartition(n_files)
    out.write.mode(mode).parquet(dst)
    return n_files


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S4 (ORC) — columnar ORC scan: the second self-describing
    columnar format besides parquet (warehouse interchange with
    Hive/Trino-managed tables). Vectorized reader, predicate pushdown
    and column pruning apply exactly as for parquet; no schema
    argument because the format carries its own."""
    return spark.read.orc(path)


def write_orc(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """S5 (ORC) — ORC sink via the DataFrame writer (zlib by default;
    same atomic task-commit semantics as the parquet sink)."""
    df.write.mode(mode).orc(path)


def morton_code(a, b, bits: int = 16):
    """Z-order (Morton) interleave of two non-negative integer
    columns, ``bits`` bits each — a pure Catalyst bitwise expression
    (2·bits shift/mask/or terms, codegen'd; no UDF)."""
    from pyspark.sql import Column

    a = a if isinstance(a, Column) else F.col(a)
    b = b if isinstance(b, Column) else F.col(b)
    a = a.cast("bigint")
    b = b.cast("bigint")
    code = F.lit(0).cast("bigint")
    for i in range(bits):
        code = code.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return code


def write_zordered_parquet(
    df: DataFrame, path: str, col_a: str, col_b: str, *, n_files: int = 8,
    bits: int = 10, mode: str = "overwrite",
) -> None:
    """Multi-dimensional clustering: range-partition + sort rows by
    the Morton code of (col_a, col_b) before writing, so EVERY file
    covers a tight range in BOTH dimensions — parquet min/max
    (zone-map) stats then let predicates on either column skip most
    files, where a linear sort bounds only its leading column. This
    is the Z-ORDER layout Delta/Iceberg expose, as plain DataFrame
    ops over plain parquet.

    Both columns are min/max-normalized onto the ``bits``-bit grid
    before interleaving (Delta's OPTIMIZE ZORDER does the same via
    range-partition ids) — raw values would waste interleave levels
    on constant high bits whenever the two ranges differ. The min/max
    pair per column is a metadata-scale driver lookup from one tiny
    aggregate.
    """
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]

    def norm(col, lo, hi):
        span = max(int(hi) - int(lo), 1)
        scaled = (F.col(col).cast("double") - float(lo)) / span * ((1 << bits) - 1)
        return F.floor(scaled).cast("bigint")

    z = morton_code(norm(col_a, lo_a, hi_a), norm(col_b, lo_b, hi_b), bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
