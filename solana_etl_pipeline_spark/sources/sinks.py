"""File sources & sinks (SURVEY.md §2.1 S4-S10).

The reference hand-rolls every one of these against boto3 — paginated
listings (S5/S9), one-object-per-record JSON puts (S4), StringIO CSV
round-trips (S7/S8), and a 60-line incremental Parquet writer with
manual schema harmonization (S10, ``clean_data.py:305-365``). Each maps
to one Spark reader/writer call; the harmonize dance is
``mergeSchema``/``unionByName``.

Scale posture: writers take explicit ``partition_cols`` — at 100 TB the
silver tables are partitioned by event date so per-day queries prune to
1/365th of the scan; readers push filters and projections into the
parquet footers (verified by `.explain` in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S4: JSON sink (newline-delimited objects, one dir per table —
    replaces one-S3-object-per-record, ``my_websocket.py:31-45``)."""
    df.write.mode(mode).json(path)


def read_json_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    path_glob: str | None = None,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """S5/S6: schema-enforced JSON directory scan. ``path_glob`` is the
    reference's suffix predicate (P5, ``endswith('.json')``) pushed to
    the listing, not a row filter. ``mode='DROPMALFORMED'`` is the
    row-level form of the reference's skip-empty/corrupt-file guards
    (P12, ``clean_data.py:315-328``): bad records drop instead of
    crashing the batch."""
    reader = spark.read.schema(schema).option("mode", mode)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S7: CSV sink with header (``cleandata1.py:43-47``)."""
    df.write.mode(mode).option("header", True).csv(path)


def read_csv_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    path_glob: str | None = None,
) -> DataFrame:
    """S8/S9: schema-enforced CSV directory scan (header skipped by
    contract, not inferred — inference is an extra full pass at scale)."""
    reader = spark.read.schema(schema).option("header", True)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.csv(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
) -> None:
    """S10: Parquet sink. Appends with a widened schema are legal —
    the read side harmonizes (see :func:`read_parquet_merged`), which
    replaces the reference's null-fill/reorder writer loop
    (``clean_data.py:340-349``)."""
    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """S11 + harmonize: ``mergeSchema=true`` unions all footer schemas;
    files missing a column yield nulls — exactly the reference's
    first-file-wins + null-fill semantics, but symmetric."""
    return spark.read.option("mergeSchema", True).parquet(path)


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Compact a directory of small parquet files to ~``target_file_bytes``
    files; returns the output file count.

    The reference's micro-batch loop (``cleandata1.py:36-51``) writes
    one object per record — the small-files problem in its purest
    form; at 100 TB a streaming sink emitting a file per micro-batch
    per partition produces millions of KB-sized files whose open/footer
    costs dominate scans. Sizing reads the actual on-disk bytes (not
    row counts, which mispredict wide/compressed tables), then
    rewrites in one job: ``repartition(n)`` for plain compaction or a
    ``repartitionByRange`` + ``sortWithinPartitions`` when ``sort_cols``
    is given, laying rows out for min/max row-group skipping on those
    columns.

    Hive-partitioned layouts (``col=value`` subdirectories) are
    compacted leaf-by-leaf, preserving the partition tree (so
    ``sort_cols`` must name data columns, not partition columns).
    Each leaf rewrite lands in a sibling temp dir and swaps in via
    rename; a failed swap restores the original directory. The
    two-rename window is small but NOT atomic for concurrent
    readers — run this in the table's maintenance window; true
    reader-transparent compaction needs a table format whose commit
    is a metadata pointer swap, which plain parquet dirs don't have.
    Returns the output file count (0 for an empty directory).
    """
    import math
    import shutil
    import uuid
    from pathlib import Path

    src = Path(path)
    part_dirs = sorted(
        d for d in src.iterdir() if d.is_dir() and "=" in d.name
    )
    if part_dirs:
        return sum(
            compact_parquet_dir(spark, str(d), target_file_bytes, sort_cols)
            for d in part_dirs
        )
    files = list(src.glob("*.parquet"))
    if not files:
        return 0
    total = sum(f.stat().st_size for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(str(src))
    if sort_cols:
        df = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        df = df.repartition(n_out)
    run_id = uuid.uuid4().hex[:8]
    tmp = src.with_name(f"{src.name}.compact-{run_id}")
    try:
        df.write.mode("overwrite").parquet(str(tmp))
        # unique backup name: a stale backup from a crashed run can
        # never collide with (and so never block) a later compaction
        backup = src.with_name(f"{src.name}.precompact-{run_id}")
        src.rename(backup)
        try:
            tmp.rename(src)
        except BaseException:
            backup.rename(src)  # restore the original table
            raise
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    shutil.rmtree(backup)
    return len(list(src.glob("*.parquet")))
