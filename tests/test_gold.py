"""Gold-layer and maintenance tests: the full medallion path
bronze → silver → gold over reference-true columns, plus small-file
compaction and malformed-record tolerance.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from solana_etl_pipeline_spark.pipelines.bronze_silver import (
    build_silver,
    silver_schema_columns,
    write_silver,
)
from solana_etl_pipeline_spark.pipelines.gold import (
    build_risk_gold,
    refresh_gold,
    top_tokens,
)
from solana_etl_pipeline_spark.pipelines.maintenance import compact_parquet
from solana_etl_pipeline_spark.schemas import EVENTS
from solana_etl_pipeline_spark.sources.sinks import read_json_dir


def _wrapped_doc(mint: str, sigs: list[str], accounts: list[tuple[str, str]]):
    return json.dumps(
        {
            "metadata": {"token_name": f"Tok-{mint}", "token_symbol": "TK",
                         "mint": mint},
            "transactions": [
                {
                    "signature": sig,
                    "type": "SWAP",
                    "timestamp": 1700000000 + i,
                    "tokenTransfers": [
                        {"fromUserAccount": fr, "toUserAccount": to,
                         "tokenAmount": 1.0, "mint": mint,
                         "tokenStandard": "Fungible"}
                    ],
                }
                for i, (sig, (fr, to)) in enumerate(zip(sigs, accounts))
            ],
        }
    )


def test_bronze_to_gold_end_to_end(spark, tmp_path):
    """Full medallion path: raw docs -> silver parquet -> gold risk
    table; a mint with many distinct holders scores safer than one
    where a single account does everything."""
    docs = [
        # diverse mint: 4 txns, 4 distinct holders/buyers
        _wrapped_doc(
            "mintDiverse",
            [f"s{i}" for i in range(4)],
            [(f"buyer{i}", f"holder{i}") for i in range(4)],
        ),
        # concentrated mint: 4 txns, one account both sides
        _wrapped_doc(
            "mintConc",
            [f"c{i}" for i in range(4)],
            [("whale", "whale")] * 4,
        ),
    ]
    helius_raw = spark.createDataFrame([Row(raw=d) for d in docs])
    ws_raw = spark.createDataFrame(
        [Row(raw=json.dumps({"mint": "mintWs", "txType": "create"}))]
    )
    silver = build_silver(helius_raw, ws_raw)
    silver_path = str(tmp_path / "silver")
    write_silver(silver, silver_path, mode="overwrite")

    gold_path = str(tmp_path / "gold")
    gold = refresh_gold(spark, silver_path, gold_path)
    rows = {r.mint: r for r in gold.collect()}
    assert rows["mintDiverse"].unique_holders == 4
    assert rows["mintConc"].unique_holders == 1
    assert (
        rows["mintDiverse"].safety_score > rows["mintConc"].safety_score
    )
    assert rows["mintDiverse"].token_name == "Tok-mintDiverse"

    top = top_tokens(spark.read.parquet(gold_path), k=1).collect()
    assert top[0].mint == "mintDiverse"


def test_gold_token_name_enrichment(spark):
    helius_raw = spark.createDataFrame(
        [Row(raw=_wrapped_doc("m1", ["s1"], [("a", "b")]))]
    )
    ws_raw = spark.createDataFrame([Row(raw=json.dumps({"mint": "zz"}))])
    silver = build_silver(helius_raw, ws_raw)
    dim = spark.createDataFrame([Row(mint="m1", token_name="FromAPI")])
    gold = build_risk_gold(silver, token_names=dim)
    rows = {r.mint: r.token_name for r in gold.collect()}
    assert rows["m1"] == "FromAPI"
    assert rows["zz"] == "Unknown"  # dim miss -> default (J1)


def test_compact_parquet(spark, tmp_path):
    src = str(tmp_path / "src")
    # 40 tiny files
    spark.range(4000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(src)
    n_before = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    assert n_before >= 30
    out = str(tmp_path / "compacted")
    compact_parquet(spark, src, out, target_bytes=64 * 1024 * 1024)
    n_after = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_after <= 2
    assert spark.read.parquet(out).count() == 4000
    assert (
        spark.read.parquet(out).agg(F.sum("v")).collect()[0][0]
        == spark.read.parquet(src).agg(F.sum("v")).collect()[0][0]
    )


def test_dropmalformed_json_rows(spark, tmp_path):
    """P12: corrupt records drop instead of crashing the batch."""
    landing = tmp_path / "landing"
    landing.mkdir()
    good = {"event_id": 1, "ts": "2024-01-01T00:00:00.000Z", "user_id": 2,
            "event_type": "purchase", "value": 1.5, "props": "{}"}
    with open(landing / "f1.json", "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("{not valid json at all\n")
        f.write(json.dumps({**good, "event_id": 2}) + "\n")
    df = read_json_dir(spark, str(landing), EVENTS, mode="DROPMALFORMED")
    ids = sorted(r.event_id for r in df.collect())
    assert ids == [1, 2]


def test_gold_prefers_real_name_over_empty_pad(spark):
    """Review r15: a bare-shape row pads token_name with "" — the
    name aggregation must prefer a real name over the pad regardless
    of signature ordering (min_by(token_name, signature) could pick
    "" from a lexicographically smaller signature)."""
    import datetime as _dt

    cols = silver_schema_columns()

    def row(sig, name, ts):
        base = {c: "" for c in cols}
        base.update(
            mint="M", signature=sig, token_name=name, ts=ts,
            fee=0, slot=0, token_amount=1.0, type="buy",
            from_account="f", to_account="t",
        )
        return Row(**{c: base[c] for c in cols})

    silver = spark.createDataFrame(
        [
            # "0sig" sorts before "zsig": the old min_by picked ""
            row("0sig", "", _dt.datetime(2024, 1, 1)),
            row("zsig", "RealName", _dt.datetime(2024, 1, 2)),
        ]
    )
    gold = build_risk_gold(silver)
    assert {r.token_name for r in gold.collect()} == {"RealName"}


def test_compact_parquet_partitioned_parallelizes_each_value(
    spark, tmp_path
):
    """Review r15: with partition_cols, hash-partitioning on only the
    partition columns collapsed each value to ONE task/file; each
    value must instead spread over multiple shards when the byte
    target asks for more files than there are values."""
    src = str(tmp_path / "psrc")
    (
        spark.range(20000)
        .withColumn("day", (F.col("id") % 2).cast("string"))
        .withColumn("v", F.col("id") * 2)
        .repartition(16)
        .write.partitionBy("day")
        .parquet(src)
    )
    out = str(tmp_path / "pout")
    # tiny target -> many files; 2 partition values must not cap the
    # output at 2 files
    n = compact_parquet(
        spark, src, out, partition_cols=["day"], target_bytes=16 * 1024
    )
    assert n > 2
    per_day = {}
    for day in ("0", "1"):
        files = [
            f
            for f in os.listdir(os.path.join(out, f"day={day}"))
            if f.endswith(".parquet")
        ]
        per_day[day] = len(files)
    assert all(c > 1 for c in per_day.values()), per_day
    back = spark.read.parquet(out)
    assert back.count() == 20000
    assert (
        back.agg(F.sum("v")).collect()[0][0]
        == spark.read.parquet(src).agg(F.sum("v")).collect()[0][0]
    )
