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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
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


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """S10-adjacent: ORC sink — the second columnar format Spark
    ships natively (zlib-compressed stripes, predicate-pushdown-
    capable scans like parquet). Lets the engine interoperate with
    Hive-era ORC lakes without an extra package."""
    df.write.mode(mode).orc(path)


def read_orc_dir(
    spark: SparkSession,
    path: str,
    schema: StructType,
    path_glob: str | None = None,
) -> DataFrame:
    """Schema-enforced ORC directory scan (same contract as the
    parquet/CSV/JSON scans: the schema is pinned, never inferred)."""
    reader = spark.read.schema(schema)
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return reader.orc(path)


def resolve_sink_format(fmt: str) -> str:
    """Validate a table-sink format name (the BASELINE north star is
    "Parquet/Delta Lake sinks"). ``parquet`` always works; ``delta``
    resolves only when the ``delta-spark`` package is importable, so
    on clusters with Delta configured the same pipeline code writes
    transactional tables with no further changes — and on this
    container (no delta in the dependency set) the error is immediate
    and actionable instead of a JVM ClassNotFound at write time."""
    if fmt == "parquet":
        return fmt
    if fmt == "delta":
        try:
            import delta  # noqa: F401
        except ImportError as exc:
            raise ImportError(
                "format='delta' needs the delta-spark package (and the "
                "DeltaCatalog/extension session configs); it is not "
                "installed in this environment — use format='parquet'"
            ) from exc
        return fmt
    raise ValueError(f"unsupported sink format: {fmt!r} (parquet|delta)")


def write_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    mode: str = "append",
    format: str = "parquet",
) -> None:
    """S10: table sink (parquet default, delta via the format seam —
    see :func:`resolve_sink_format`). Appends with a widened schema are
    legal — the read side harmonizes (see :func:`read_parquet_merged`),
    which replaces the reference's null-fill/reorder writer loop
    (``clean_data.py:340-349``)."""
    writer = df.write.mode(mode).format(resolve_sink_format(format))
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.save(path)


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """S11 + harmonize: ``mergeSchema=true`` unions all footer schemas;
    files missing a column yield nulls — exactly the reference's
    first-file-wins + null-fill semantics, but symmetric."""
    return spark.read.option("mergeSchema", True).parquet(path)


def zorder_key(
    x: Column,
    x_min: Column,
    x_max: Column,
    y: Column,
    y_min: Column,
    y_max: Column,
    bits: int = 16,
) -> Column:
    """Morton (z-order) key over two numeric columns.

    A single-column sorted layout localizes only that column's
    min/max per file; filtering on a second column still scans every
    file. Interleaving the bits of both (min-max quantized to
    ``bits`` each) gives a 1-D sort order in which every file covers
    a bounded rectangle of BOTH dimensions, so two-column range
    predicates prune on parquet row-group statistics — the standard
    multi-dimensional-clustering trick, as a plain codegen-friendly
    integer expression (no UDF).

    ``x_min``/``x_max``/``y_min``/``y_max`` are the global bounds
    (pass 1-row-aggregate columns via a broadcast crossJoin, or
    literals when known); degenerate ranges quantize to 0. Values
    outside the bounds (stale literal stats) clamp to the edge
    quantile — without the clamp an out-of-range coordinate's bits
    would spill into the other dimension's interleave positions and
    silently break the bounded-rectangle property.
    """
    scale = float((1 << bits) - 1)

    def _q(c: Column, lo: Column, hi: Column) -> Column:
        span = hi.cast("double") - lo.cast("double")
        frac = F.when(span > 0.0, (c.cast("double") - lo.cast("double")) / span)
        clamped = F.greatest(
            F.lit(0.0), F.least(F.lit(1.0), F.coalesce(frac, F.lit(0.0)))
        )
        return F.round(clamped * scale).cast("bigint")

    qx, qy = _q(x, x_min, x_max), _q(y, y_min, y_max)
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_x = F.shiftright(qx, i).bitwiseAND(F.lit(1))
        bit_y = F.shiftright(qy, i).bitwiseAND(F.lit(1))
        key = (
            key
            + F.shiftleft(bit_x, 2 * i)
            + F.shiftleft(bit_y, 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int,
    bits: int = 16,
    format: str = "parquet",
) -> None:
    """Write ``df`` as ``n_files`` parquet files range-partitioned and
    sorted by the two-column z-order key, so per-file min/max bound a
    rectangle in (x, y) and range filters on EITHER column prune."""
    bounds = df.select(
        F.min(x_col).alias("_xmin"),
        F.max(x_col).alias("_xmax"),
        F.min(y_col).alias("_ymin"),
        F.max(y_col).alias("_ymax"),
    )
    keyed = df.crossJoin(F.broadcast(bounds)).withColumn(
        "_zkey",
        zorder_key(
            F.col(x_col),
            F.col("_xmin"),
            F.col("_xmax"),
            F.col(y_col),
            F.col("_ymin"),
            F.col("_ymax"),
            bits,
        ),
    )
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey", "_xmin", "_xmax", "_ymin", "_ymax")
        .write.mode("overwrite")
        .format(resolve_sink_format(format))
        .save(path)
    )


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
    # skip dot/underscore-prefixed siblings: those are this function's
    # own in-flight temp/backup dirs (plus Spark markers like
    # _SUCCESS), which Spark's file listing and partition discovery
    # ignore — recursing into one would re-compact half-swapped state
    part_dirs = sorted(
        d
        for d in src.iterdir()
        if d.is_dir() and "=" in d.name and d.name[0] not in "._"
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
    # dot-prefixed siblings: Spark's file listing AND partition
    # discovery skip paths starting with '.' or '_', so residue from a
    # crash mid-swap can never be read as data or parsed as a phantom
    # hive partition (for a leaf like 'p=0', a visible sibling
    # 'p=0.precompact-x' would register as partition value
    # '0.precompact-x' and silently duplicate the leaf's rows)
    run_id = uuid.uuid4().hex[:8]
    tmp = src.with_name(f".{src.name}.compact-{run_id}")
    try:
        df.write.mode("overwrite").parquet(str(tmp))
        # unique backup name: a stale backup from a crashed run can
        # never collide with (and so never block) a later compaction
        backup = src.with_name(f".{src.name}.precompact-{run_id}")
        src.rename(backup)
        try:
            tmp.rename(src)
        except BaseException:
            backup.rename(src)  # restore the original table
            raise
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    try:
        shutil.rmtree(backup)
    except OSError as exc:  # pragma: no cover - environment-dependent
        # data already swapped in and the leftover is invisible to
        # Spark (dot prefix) — but leaking disk silently is how stores
        # fill up, so surface it instead of ignore_errors
        raise RuntimeError(
            f"compaction swapped in successfully but could not remove "
            f"the backup {backup}; remove it manually"
        ) from exc
    return len(list(src.glob("*.parquet")))
