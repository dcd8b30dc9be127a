"""Custom streaming source (SURVEY.md §2.1 S1) — the one genuinely
custom connector in the project (SURVEY §7 "what's hard" #2).

The reference holds a WebSocket open and writes one S3 object per
message (``my_websocket.py:62-69,31-45``). Two Spark-native paths
replace it:

1. **Landing-writer indirection** (default, SURVEY §7 Step 6): a thin
   non-Spark async writer lands messages as files; the engine only ever
   sees ``spark.readStream.json(landing_dir)`` — see
   :func:`write_messages_to_landing`. The engine never depends on a
   live socket.
2. **Python DataSource** (Spark 4 ``pyspark.sql.datasource``):
   :class:`MessageReplayDataSource` — a ``SimpleDataSourceStreamReader``
   that serves messages from a JSON-lines feed file with offset
   tracking, exactly-once via Spark's own offset log. A production
   deployment swaps the file tail for a socket client with the same
   offset contract; the replay form keeps it deterministic and
   testable offline.

Register + use::

    spark.dataSource.register(MessageReplayDataSource)
    df = (spark.readStream.format("message_replay")
          .option("path", feed_file).option("batchSize", 100)
          .schema("mint string, txType string, solAmount double, "
                  "name string, symbol string")
          .load())
"""

from __future__ import annotations

import json
import os
from collections.abc import AsyncIterator

from pyspark.sql.datasource import (
    DataSource,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _ReplayStreamReader(SimpleDataSourceStreamReader):
    """Offset = line number into the feed file. ``read`` serves at most
    ``batch_size`` lines past the last offset; ``readBetweenOffsets``
    re-serves a committed range verbatim on recovery (exactly-once)."""

    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("message_replay requires option 'path'")
        self.batch_size = int(options.get("batchsize", 1000))
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self) -> dict:
        return {"line": 0}

    def _read_lines(self, start: int, end: int | None):
        rows = []
        with open(self.path) as f:
            for i, line in enumerate(f):
                if i < start:
                    continue
                if end is not None and i >= end:
                    break
                if len(rows) >= self.batch_size and end is None:
                    break
                doc = json.loads(line)
                rows.append(tuple(doc.get(c) for c in self.fields))
        return rows, start + len(rows)

    def read(self, start: dict):
        rows, next_line = self._read_lines(start["line"], None)
        return iter(rows), {"line": next_line}

    def readBetweenOffsets(self, start: dict, end: dict):
        rows, _ = self._read_lines(start["line"], end["line"])
        return iter(rows)


class MessageReplayDataSource(DataSource):
    """``format("message_replay")`` — streaming replay of a JSON-lines
    message feed with offset tracking."""

    @classmethod
    def name(cls) -> str:
        return "message_replay"

    def schema(self) -> str:
        # caller normally passes .schema(...); this is the websocket
        # message default (FIXTURES.md §B1)
        return (
            "mint string, txType string, solAmount double, "
            "name string, symbol string"
        )

    def simpleStreamReader(self, schema: StructType):
        return _ReplayStreamReader(schema, dict(self.options))


async def write_messages_to_landing(
    messages: AsyncIterator[dict],
    landing_dir: str,
    prefix: str = "msg",
) -> int:
    """Path 1: the thin landing writer (``my_websocket.py:31-45``
    re-done without the engine in the loop). One JSON file per message,
    monotonically numbered — a live deployment passes an async iterator
    wrapping its socket client; tests pass a fake iterator. Returns the
    number of files written."""
    os.makedirs(landing_dir, exist_ok=True)
    # Resume numbering AFTER any file already in the dir: restarting
    # at 0 on a reconnect would os.rename over the previous run's
    # files, and Spark's file source tracks seen files by PATH — the
    # replaced message is never re-read and the new one never
    # ingested (silent loss on every restart).
    start = 0
    plen = len(prefix) + 1
    for name in os.listdir(landing_dir):
        if name.startswith(f"{prefix}-") and name.endswith(".json"):
            try:
                start = max(start, int(name[plen:-5]) + 1)
            except ValueError:
                continue
    n = 0
    async for msg in messages:
        idx = start + n
        tmp = os.path.join(landing_dir, f".{prefix}-{idx:012d}.json.tmp")
        final = os.path.join(landing_dir, f"{prefix}-{idx:012d}.json")
        with open(tmp, "w") as f:
            json.dump(msg, f)
        os.rename(tmp, final)  # atomic: readers never see partial files
        n += 1
    return n
