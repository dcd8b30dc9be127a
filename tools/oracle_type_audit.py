"""Audit: DuckDB oracle Arrow types vs Spark result types, per query.

The driver fetches oracle results via Arrow; DuckDB integer aggregates
(sum over BIGINT, ``%`` over HUGEINT) come back as decimal128(38,0),
which serializes differently from Spark's int64 even when values are
equal. This script flags every oracle column whose Arrow type class
disagrees with the Spark column's type class so we can pin casts in the
oracle SQL before the driver does the comparison.

Run: python tools/oracle_type_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, "/root/repo")

from solana_etl_pipeline_spark.queries import QUERIES  # noqa: E402
from solana_etl_pipeline_spark.session import build_session  # noqa: E402
from tests.oracle_utils import duckdb_connection  # noqa: E402


def type_class(t: pa.DataType) -> str:
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return "decimal"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def spark_type_class(dt: str) -> str:
    if dt in ("tinyint", "smallint", "int", "bigint", "long"):
        return "int"
    if dt in ("float", "double"):
        return "float"
    if dt.startswith("decimal"):
        return "decimal"
    if dt == "boolean":
        return "bool"
    if dt == "string":
        return "str"
    if dt.startswith("timestamp"):
        return "timestamp"
    if dt == "date":
        return "date"
    if dt.startswith("array"):
        return "list"
    return dt


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    con = duckdb_connection(sf_dir)
    spark = build_session(app_name="oracle-type-audit")
    spark.sparkContext.setLogLevel("ERROR")

    bad = 0
    for name, spec in QUERIES.items():
        if not spec.oracle:
            continue
        try:
            tbl = con.execute(spec.oracle).arrow()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error {e}")
            bad += 1
            continue
        try:
            sdt = dict(spec.spark(spark, sf_dir).dtypes)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error {e}")
            bad += 1
            continue
        for field in tbl.schema:
            oc = type_class(field.type)
            sc = spark_type_class(sdt.get(field.name, "<missing>"))
            if oc == "decimal":
                print(f"HUGEINT {name}.{field.name}: duckdb={field.type}")
                bad += 1
            elif oc != sc:
                print(
                    f"MISMATCH {name}.{field.name}: "
                    f"duckdb={field.type}({oc}) spark={sdt.get(field.name)}({sc})"
                )
                bad += 1
    print(f"done: {bad} flagged columns")
    spark.stop()


if __name__ == "__main__":
    main()
