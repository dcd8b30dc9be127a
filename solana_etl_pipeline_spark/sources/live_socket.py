"""Live WebSocket → landing-dir shim (SURVEY.md §2.1 S1, reference
``my_websocket.py:62-69``: subscribe, receive JSON messages forever,
persist one file per message).

This closes the "no actual wss:// subscriber exists" gap while keeping
the engine decoupled: the socket client only *feeds*
:func:`~solana_etl_pipeline_spark.sources.message_stream.write_messages_to_landing`;
Spark still reads the landing directory and never holds the socket.

The container has no websocket library, so the client is a minimal
RFC 6455 implementation over ``asyncio`` streams — text frames,
ping/pong, close, client-side masking, 7/16/64-bit payload lengths.
That is the full surface the reference uses (``websocket.WebSocketApp``
with JSON text messages). ``wss://`` is first-class: the connect wraps
the stream via ``asyncio.open_connection(..., ssl=...)`` with
``ssl.create_default_context()`` by default (CA-verified, hostname
checked — what pointing at the reference's ``wss://`` endpoint,
``my_websocket.py:19,63``, needs), and every entry point accepts an
``ssl_context`` override for pinned CAs or test servers with
self-signed certs (see tests/test_live_socket.py's TLS path).
"""

from __future__ import annotations

import asyncio
import base64
import hashlib
import json
import os
import struct
from collections.abc import AsyncIterator
from urllib.parse import urlparse

from solana_etl_pipeline_spark.sources.message_stream import (
    write_messages_to_landing,
)

#: RFC 6455 §1.3 handshake GUID (a protocol constant, not a secret).
_WS_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

# opcodes (RFC 6455 §5.2)
OP_CONT = 0x0
OP_TEXT = 0x1
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


def _accept_key(key: str) -> str:
    digest = hashlib.sha1((key + _WS_GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def encode_frame(payload: bytes, opcode: int, mask: bool) -> bytes:
    """One FIN frame. Clients MUST mask (RFC 6455 §5.3); servers must
    not."""
    head = bytes([0x80 | opcode])
    mask_bit = 0x80 if mask else 0
    n = len(payload)
    if n < 126:
        head += bytes([mask_bit | n])
    elif n < 1 << 16:
        head += bytes([mask_bit | 126]) + struct.pack(">H", n)
    else:
        head += bytes([mask_bit | 127]) + struct.pack(">Q", n)
    if not mask:
        return head + payload
    key = os.urandom(4)
    masked = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return head + key + masked


async def read_frame(
    reader: asyncio.StreamReader,
) -> tuple[bool, int, bytes]:
    """→ (fin, opcode, payload). Unmasks if the mask bit is set. The
    FIN bit matters: servers may fragment a large message into a text
    frame with FIN=0 plus continuation frames (opcode 0x0) — dropping
    it would hand partial JSON to the consumer."""
    b0, b1 = await reader.readexactly(2)
    fin = bool(b0 & 0x80)
    opcode = b0 & 0x0F
    masked = bool(b1 & 0x80)
    n = b1 & 0x7F
    if n == 126:
        (n,) = struct.unpack(">H", await reader.readexactly(2))
    elif n == 127:
        (n,) = struct.unpack(">Q", await reader.readexactly(8))
    key = await reader.readexactly(4) if masked else None
    payload = await reader.readexactly(n)
    if key:
        payload = bytes(b ^ key[i % 4] for i, b in enumerate(payload))
    return fin, opcode, payload


async def websocket_connect(
    uri: str,
    ssl_context: "object | None" = None,
) -> tuple[asyncio.StreamReader, asyncio.StreamWriter]:
    """Open + upgrade: HTTP/1.1 Upgrade handshake, validating the
    server's Sec-WebSocket-Accept echo.

    ``wss://`` TLS-wraps the connection: by default with
    ``ssl.create_default_context()`` (system CAs, hostname
    verification), or with the caller's ``ssl_context``
    (:class:`ssl.SSLContext`) for pinned/self-signed setups. Passing
    an ``ssl_context`` with a ``ws://`` uri is rejected — silently
    ignoring it would downgrade an intended-encrypted connection."""
    u = urlparse(uri)
    if u.scheme not in ("ws", "wss"):
        raise ValueError(f"not a websocket uri: {uri}")
    ssl_ctx = None
    if u.scheme == "wss":
        if ssl_context is None:
            import ssl

            ssl_ctx = ssl.create_default_context()
        else:
            ssl_ctx = ssl_context
    elif ssl_context is not None:
        raise ValueError(
            "ssl_context given with a ws:// uri — use wss:// (refusing "
            "to silently send plaintext when TLS was clearly intended)"
        )
    port = u.port or (443 if u.scheme == "wss" else 80)
    reader, writer = await asyncio.open_connection(u.hostname, port, ssl=ssl_ctx)
    try:
        key = base64.b64encode(os.urandom(16)).decode()
        # keep the query string: the reference's endpoint family
        # authenticates via `wss://host/?api-key=...` — dropping
        # u.query turns every connect into a 401
        path = (u.path or "/") + (f"?{u.query}" if u.query else "")
        # Host: bracket IPv6 literals (u.hostname strips the
        # brackets), omit the default port (exact-match routing/SNI
        # setups reject `example.com:443`)
        hostname = u.hostname or ""
        host = f"[{hostname}]" if ":" in hostname else hostname
        default_port = 443 if u.scheme == "wss" else 80
        if port != default_port:
            host = f"{host}:{port}"
        request = (
            f"GET {path} HTTP/1.1\r\n"
            f"Host: {host}\r\n"
            "Upgrade: websocket\r\n"
            "Connection: Upgrade\r\n"
            f"Sec-WebSocket-Key: {key}\r\n"
            "Sec-WebSocket-Version: 13\r\n\r\n"
        )
        writer.write(request.encode())
        await writer.drain()
        status = await reader.readline()
        if b"101" not in status:
            raise ConnectionError(f"handshake rejected: {status!r}")
        accept = None
        while True:
            line = await reader.readline()
            if line in (b"\r\n", b""):
                break
            name, _, value = line.decode().partition(":")
            if name.strip().lower() == "sec-websocket-accept":
                accept = value.strip()
        if accept != _accept_key(key):
            raise ConnectionError("bad Sec-WebSocket-Accept")
    except BaseException:
        # a rejected handshake must not leak the TCP/TLS connection:
        # a reconnect-with-backoff loop would otherwise accumulate one
        # open socket per attempt until fd exhaustion
        writer.close()
        try:
            await writer.wait_closed()
        except Exception:
            pass  # teardown errors must not mask the handshake error
        raise
    return reader, writer


async def websocket_messages(
    uri: str,
    subscriptions: list[dict] | None = None,
    max_messages: int | None = None,
    ssl_context: "object | None" = None,
) -> AsyncIterator[dict]:
    """Subscribe-then-receive, the reference's ``on_open``/``on_message``
    loop (``my_websocket.py:47-60``): send each subscription as a JSON
    text frame, then yield one dict per received text frame. Answers
    ping with pong; a close frame (or EOF) ends the stream."""
    reader, writer = await websocket_connect(uri, ssl_context=ssl_context)
    try:
        for sub in subscriptions or []:
            writer.write(
                encode_frame(json.dumps(sub).encode(), OP_TEXT, mask=True)
            )
        await writer.drain()
        served = 0
        fragments: list[bytes] = []  # in-flight fragmented text message
        while max_messages is None or served < max_messages:
            try:
                fin, opcode, payload = await read_frame(reader)
            except (asyncio.IncompleteReadError, ConnectionResetError):
                break
            if opcode == OP_CLOSE:
                writer.write(encode_frame(payload, OP_CLOSE, mask=True))
                await writer.drain()
                break
            if opcode == OP_PING:
                writer.write(encode_frame(payload, OP_PONG, mask=True))
                await writer.drain()
                continue
            # RFC 6455 §5.4 fragmentation: a text frame with FIN=0
            # starts a message; continuation frames (opcode 0) carry
            # the rest; only the final fragment completes the JSON.
            # Control frames may interleave (handled above).
            if opcode == OP_TEXT and not fin:
                fragments = [payload]
                continue
            if opcode == OP_CONT:
                if not fragments:
                    continue  # stray continuation: drop, keep stream up
                fragments.append(payload)
                if not fin:
                    continue
                payload = b"".join(fragments)
                fragments = []
            elif opcode != OP_TEXT:
                continue
            else:
                # FIN=1 TEXT while a fragmented message is in flight
                # (server violating RFC 6455 §5.4): drop the stale
                # buffer, or a later stray continuation would be
                # appended to it and the joined garbage would kill the
                # generator inside json.loads.
                fragments = []
            # a non-JSON text message (plain-text keepalive, relayed
            # error page) must not kill the generator — skip it and
            # keep the stream up; only parsed messages count toward
            # max_messages
            try:
                message = json.loads(payload.decode())
            except (UnicodeDecodeError, json.JSONDecodeError):
                continue
            served += 1
            yield message
    finally:
        writer.close()
        try:
            # complete TLS close_notify before the event loop goes
            # away — close() alone only SCHEDULES teardown, producing
            # "unclosed transport" noise and an abrupt RST under wss
            await writer.wait_closed()
        except Exception:
            pass


async def run_live_ingest(
    uri: str,
    landing_dir: str,
    subscriptions: list[dict] | None = None,
    max_messages: int | None = None,
    prefix: str = "msg",
    ssl_context: "object | None" = None,
) -> int:
    """The full live path: socket → one-file-per-message landing dir
    (which ``spark.readStream.json(landing_dir)`` then consumes with
    checkpointed exactly-once). Returns files written. ``max_messages``
    bounds the run for tests/drains; None = until the server closes.
    ``ssl_context`` overrides the default ``wss://`` TLS context."""
    return await write_messages_to_landing(
        websocket_messages(uri, subscriptions, max_messages, ssl_context),
        landing_dir,
        prefix=prefix,
    )
