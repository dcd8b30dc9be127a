"""Tests for the custom streaming source (S1), landing writer, and the
REST batch source (S2) — injectable transports, no network.
"""

from __future__ import annotations

import asyncio
import json
import os

from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from solana_etl_pipeline_spark.sources.message_stream import (
    MessageReplayDataSource,
    write_messages_to_landing,
)
from solana_etl_pipeline_spark.sources.rest import fetch_batch_to_dataframe

WS_SCHEMA = (
    "mint string, txType string, solAmount double, name string, symbol string"
)


def _feed_file(path: str, n: int) -> None:
    with open(path, "w") as f:
        for i in range(n):
            f.write(
                json.dumps(
                    {
                        "mint": f"m{i}",
                        "txType": "create",
                        "solAmount": float(i),
                        "name": f"N{i}",
                        "symbol": "S",
                    }
                )
                + "\n"
            )


def test_message_replay_datasource_streams_all_rows(spark, tmp_path):
    feed = str(tmp_path / "feed.jsonl")
    _feed_file(feed, 25)
    spark.dataSource.register(MessageReplayDataSource)
    stream = (
        spark.readStream.format("message_replay")
        .option("path", feed)
        .option("batchSize", 10)  # 25 rows -> 3 micro-batches
        .schema(WS_SCHEMA)
        .load()
    )
    query = (
        stream.writeStream.format("memory")
        .queryName("replay_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    # poll until the feed is drained (3 micro-batches), then stop
    import time as _time

    deadline = _time.time() + 120
    while (
        spark.table("replay_sink").count() < 25 and _time.time() < deadline
    ):
        _time.sleep(1)
    query.stop()
    query.awaitTermination(30)
    got = spark.table("replay_sink").collect()
    assert len(got) == 25
    assert {r.mint for r in got} == {f"m{i}" for i in range(25)}
    assert {r.solAmount for r in got} == {float(i) for i in range(25)}


def test_landing_writer_atomic_files(spark, tmp_path):
    landing = str(tmp_path / "landing")

    async def fake_socket_messages():
        for i in range(8):
            yield {"mint": f"m{i}", "txType": "create", "solAmount": 1.5,
                   "name": "N", "symbol": "S"}

    n = asyncio.run(
        write_messages_to_landing(fake_socket_messages(), landing)
    )
    assert n == 8
    files = sorted(os.listdir(landing))
    assert len(files) == 8
    assert all(f.endswith(".json") and not f.startswith(".") for f in files)

    # the landing dir is directly consumable by the engine
    schema = StructType(
        [
            StructField("mint", StringType()),
            StructField("txType", StringType()),
            StructField("solAmount", DoubleType()),
            StructField("name", StringType()),
            StructField("symbol", StringType()),
        ]
    )
    back = spark.read.schema(schema).json(landing)
    assert back.count() == 8


def test_rest_batch_source(spark):
    schema = StructType(
        [
            StructField("mint", StringType()),
            StructField("signature", StringType()),
        ]
    )

    def fake_api(mint: str) -> list[dict]:
        return [{"mint": mint, "signature": f"{mint}-sig{j}"} for j in range(3)]

    df = fetch_batch_to_dataframe(
        spark, ["a", "b"], fake_api, schema, rate_limit_per_sec=1000
    )
    rows = df.collect()
    assert len(rows) == 6
    assert {r.signature for r in rows if r.mint == "a"} == {
        "a-sig0", "a-sig1", "a-sig2"
    }
