"""Live-ingest shim tests: an in-process RFC 6455 server feeds the
socket→landing→readStream→silver path end-to-end (reference
``my_websocket.py:47-69`` semantics, exactly-once included)."""

from __future__ import annotations

import asyncio
import json

from pyspark.sql import functions as F

from solana_etl_pipeline_spark.schemas import WEBSOCKET_MESSAGE
from solana_etl_pipeline_spark.sources.live_socket import (
    OP_CLOSE,
    OP_PING,
    OP_TEXT,
    _accept_key,
    encode_frame,
    read_frame,
    run_live_ingest,
)
from solana_etl_pipeline_spark.streaming.ingest import (
    landing_stream,
    run_available_now_to_parquet,
)


def _msg(i: int, pad: str = "") -> dict:
    return {
        "mint": f"MINT{i}",
        "txType": "create" if i % 2 else "buy",
        "solAmount": round(0.5 * i, 4),
        "name": f"Token {i}{pad}",
        "symbol": f"T{i}",
    }


async def _start_fake_server(messages: list[dict], received_subs: list):
    """Server half of the handshake + frames: enough RFC 6455 to host
    the client — reads the subscription, pings once (exercising the
    client's pong), streams messages, closes."""

    async def handler(reader, writer):
        key = None
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b""):
                break
            if line.lower().startswith(b"sec-websocket-key:"):
                key = line.split(b":", 1)[1].strip().decode()
        writer.write(
            (
                "HTTP/1.1 101 Switching Protocols\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Accept: {_accept_key(key)}\r\n\r\n"
            ).encode()
        )
        await writer.drain()
        opcode, payload = await read_frame(reader)
        assert opcode == OP_TEXT
        received_subs.append(json.loads(payload.decode()))
        writer.write(encode_frame(b"hb", OP_PING, mask=False))
        for m in messages:
            writer.write(
                encode_frame(json.dumps(m).encode(), OP_TEXT, mask=False)
            )
        writer.write(encode_frame(b"", OP_CLOSE, mask=False))
        await writer.drain()
        # wait for the client's pong + close echo, then drop
        try:
            while True:
                op, _ = await read_frame(reader)
                if op == OP_CLOSE:
                    break
        except asyncio.IncompleteReadError:
            pass
        writer.close()

    return await asyncio.start_server(handler, "127.0.0.1", 0)


def _ingest(messages: list[dict], landing: str, prefix: str) -> tuple[int, list]:
    async def run():
        subs = []
        server = await _start_fake_server(messages, subs)
        port = server.sockets[0].getsockname()[1]
        try:
            n = await run_live_ingest(
                f"ws://127.0.0.1:{port}/stream",
                landing,
                subscriptions=[{"method": "subscribeRaydiumLiquidity"}],
                prefix=prefix,
            )
        finally:
            server.close()
            await server.wait_closed()
        return n, subs

    return asyncio.run(run())


def test_live_socket_to_silver_exactly_once(spark, tmp_path):
    landing = str(tmp_path / "landing")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")

    # batch 1 — includes a >125-byte message to cover the 16-bit
    # frame-length path
    batch1 = [_msg(i, pad="x" * 150 if i == 3 else "") for i in range(20)]
    n, subs = _ingest(batch1, landing, prefix="a")
    assert n == 20
    assert subs == [{"method": "subscribeRaydiumLiquidity"}]

    def drain():
        stream = landing_stream(
            spark, landing, WEBSOCKET_MESSAGE, max_files_per_trigger=None
        )
        run_available_now_to_parquet(stream, silver, ckpt)
        return spark.read.parquet(silver)

    got = drain()
    assert got.count() == 20
    assert {r.mint for r in got.select("mint").collect()} == {
        f"MINT{i}" for i in range(20)
    }
    # the long-name message survived frame re-assembly intact
    long_name = got.filter(F.col("mint") == "MINT3").collect()[0].name
    assert long_name == "Token 3" + "x" * 150

    # re-drain with the same checkpoint: nothing reprocessed (T5)
    assert drain().count() == 20

    # batch 2 over a fresh socket session lands alongside batch 1; the
    # checkpointed source picks up ONLY the new files
    n2, _ = _ingest([_msg(100 + i) for i in range(5)], landing, prefix="b")
    assert n2 == 5
    final = drain()
    assert final.count() == 25
    # exactly-once across the whole path: no duplicate (mint, txType)
    assert final.select("mint").distinct().count() == 25
