"""Kafka wire protocol, pure stdlib: client + in-process test broker.

The reference ships Kafka ingestion as the direct stream
(`external/kafka/.../DirectKafkaInputDStream.scala`,
`KafkaUtils.scala`): deterministic (topic, partition, offset-range)
batches fetched straight from the log, no receivers, exactly-once by
offset arithmetic. This container has neither a broker nor the
`spark-sql-kafka` connector jar, so both halves are built here from
the PUBLIC Apache Kafka protocol specification (kafka.apache.org
/protocol): the v0 generation of Metadata / ListOffsets / Fetch /
Produce over the 4-byte-length-framed binary format, with v0
message-sets (CRC-32 over magic+attrs+key+value).

Three pieces:

- codec: big-endian primitive/request/response encoders (`struct`);
- :class:`KafkaClient`: a blocking socket client speaking the four
  APIs — enough to resolve partition leaders, bound offsets, fetch
  message-sets, and (for tests) produce;
- :class:`MiniBroker`: an in-process single-node broker backed by an
  in-memory ``{(topic, partition): [records]}`` log — the test
  harness, exactly the role embedded Derby plays for the JDBC row.

The Spark-facing half is ``kafka_source.py`` (the ``pykafka`` Python
DataSource). Everything here is deliberately version-pinned to v0:
the oldest, simplest, still-spec-published protocol generation — the
features the direct stream needs (leaders, earliest/latest offsets,
offset-addressed fetch) were complete in v0.
"""

from __future__ import annotations

import io
import socket
import socketserver
import struct
import threading
import zlib
from dataclasses import dataclass, field
from typing import Iterator

API_PRODUCE = 0
API_FETCH = 1
API_LIST_OFFSETS = 2
API_METADATA = 3

EARLIEST = -2
LATEST = -1


# ------------------------------------------------------------- codec

def _i8(n: int) -> bytes:
    return struct.pack(">b", n)


def _i16(n: int) -> bytes:
    return struct.pack(">h", n)


def _i32(n: int) -> bytes:
    return struct.pack(">i", n)


def _i64(n: int) -> bytes:
    return struct.pack(">q", n)


def _string(s: str | None) -> bytes:
    if s is None:
        return _i16(-1)
    b = s.encode("utf-8")
    return _i16(len(b)) + b


def _bytes(b: bytes | None) -> bytes:
    if b is None:
        return _i32(-1)
    return _i32(len(b)) + b


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.b = buf
        self.o = 0

    def i8(self) -> int:
        (v,) = struct.unpack_from(">b", self.b, self.o)
        self.o += 1
        return v

    def i16(self) -> int:
        (v,) = struct.unpack_from(">h", self.b, self.o)
        self.o += 2
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.b, self.o)
        self.o += 4
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.b, self.o)
        self.o += 8
        return v

    def string(self) -> str | None:
        n = self.i16()
        if n < 0:
            return None
        v = self.b[self.o : self.o + n].decode("utf-8")
        self.o += n
        return v

    def raw(self, n: int) -> bytes:
        v = self.b[self.o : self.o + n]
        self.o += n
        return v

    def remaining(self) -> int:
        return len(self.b) - self.o


# v0 message: crc(4) magic(1) attributes(1) key(bytes) value(bytes)
def encode_message(key: bytes | None, value: bytes | None) -> bytes:
    body = _i8(0) + _i8(0) + _bytes(key) + _bytes(value)
    return struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF) + body


def encode_message_set(
    entries: list[tuple[int, bytes | None, bytes | None]],
) -> bytes:
    out = b""
    for offset, key, value in entries:
        msg = encode_message(key, value)
        out += _i64(offset) + _i32(len(msg)) + msg
    return out


def decode_message_set(
    buf: bytes,
) -> Iterator[tuple[int, bytes | None, bytes | None]]:
    """Yields (offset, key, value); stops cleanly at a truncated tail
    (the broker may cut the last message at max_bytes, per spec)."""
    r = _Reader(buf)
    while r.remaining() >= 12:
        offset = r.i64()
        size = r.i32()
        if r.remaining() < size:
            return
        m = _Reader(r.raw(size))
        crc = m.i32() & 0xFFFFFFFF
        body = m.b[m.o :]
        if zlib.crc32(body) & 0xFFFFFFFF != crc:
            raise ValueError(f"kafka message CRC mismatch at offset {offset}")
        m.i8()  # magic
        m.i8()  # attributes
        klen = m.i32()
        key = m.raw(klen) if klen >= 0 else None
        vlen = m.i32()
        value = m.raw(vlen) if vlen >= 0 else None
        yield offset, key, value


# ------------------------------------------------------------- client

def _request(api_key: int, correlation_id: int, body: bytes) -> bytes:
    head = (
        _i16(api_key)
        + _i16(0)  # api_version: pinned v0 throughout
        + _i32(correlation_id)
        + _string("pykafka")
    )
    payload = head + body
    return _i32(len(payload)) + payload


class KafkaClient:
    """Minimal blocking client for one bootstrap broker (the direct
    stream re-resolves leaders via Metadata, which a multi-node
    cluster would answer per-partition; MiniBroker is single-node so
    every leader is itself)."""

    def __init__(self, host: str, port: int, timeout: float = 10.0) -> None:
        self.addr = (host, port)
        self.timeout = timeout
        self._sock: socket.socket | None = None
        self._corr = 0

    def _conn(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(self.addr, self.timeout)
        return self._sock

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def _roundtrip(self, api_key: int, body: bytes) -> _Reader:
        self._corr += 1
        corr = self._corr
        s = self._conn()
        s.sendall(_request(api_key, corr, body))
        raw = self._read_exact(s, 4)
        (n,) = struct.unpack(">i", raw)
        resp = _Reader(self._read_exact(s, n))
        got = resp.i32()
        if got != corr:
            raise ValueError(f"correlation id mismatch: {got} != {corr}")
        return resp

    @staticmethod
    def _read_exact(s: socket.socket, n: int) -> bytes:
        chunks = b""
        while len(chunks) < n:
            c = s.recv(n - len(chunks))
            if not c:
                raise ConnectionError("kafka broker closed connection")
            chunks += c
        return chunks

    # Metadata v0 → {topic: [partition, ...]}
    def metadata(self, topics: list[str] | None = None) -> dict[str, list[int]]:
        topics = topics or []
        body = _i32(len(topics)) + b"".join(_string(t) for t in topics)
        r = self._roundtrip(API_METADATA, body)
        for _ in range(r.i32()):  # brokers
            r.i32()
            r.string()
            r.i32()
        out: dict[str, list[int]] = {}
        for _ in range(r.i32()):  # topics
            err = r.i16()
            name = r.string()
            parts = []
            for _ in range(r.i32()):
                r.i16()  # partition error
                pid = r.i32()
                r.i32()  # leader
                for _ in range(r.i32()):
                    r.i32()  # replicas
                for _ in range(r.i32()):
                    r.i32()  # isr
                parts.append(pid)
            if err == 0 and name is not None:
                out[name] = sorted(parts)
        return out

    # ListOffsets v0 → the single boundary offset for EARLIEST/LATEST
    def list_offset(self, topic: str, partition: int, when: int) -> int:
        body = (
            _i32(-1)  # replica_id
            + _i32(1)
            + _string(topic)
            + _i32(1)
            + _i32(partition)
            + _i64(when)
            + _i32(1)  # max_num_offsets
        )
        r = self._roundtrip(API_LIST_OFFSETS, body)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                offs = [r.i64() for _ in range(r.i32())]
                if err:
                    raise ValueError(f"ListOffsets error {err}")
                return offs[0] if offs else 0
        raise ValueError("empty ListOffsets response")

    def fetch(
        self,
        topic: str,
        partition: int,
        offset: int,
        max_bytes: int = 1 << 20,
    ) -> tuple[int, list[tuple[int, bytes | None, bytes | None]]]:
        """One Fetch round-trip: (high_watermark, [(offset, key, value)])."""
        body = (
            _i32(-1)  # replica_id
            + _i32(0)  # max_wait_ms
            + _i32(0)  # min_bytes
            + _i32(1)
            + _string(topic)
            + _i32(1)
            + _i32(partition)
            + _i64(offset)
            + _i32(max_bytes)
        )
        r = self._roundtrip(API_FETCH, body)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                hw = r.i64()
                size = r.i32()
                if err:
                    raise ValueError(f"Fetch error {err}")
                return hw, list(decode_message_set(r.raw(size)))
        raise ValueError("empty Fetch response")

    def fetch_range(
        self, topic: str, partition: int, start: int, end: int
    ) -> Iterator[tuple[int, bytes | None, bytes | None]]:
        """The direct-stream read: every record in [start, end), by
        repeated Fetch — deterministic replay for any fixed range."""
        offset = start
        while offset < end:
            _, msgs = self.fetch(topic, partition, offset)
            if not msgs or msgs[-1][0] < offset:
                # no progress (empty set, or — with a log-compacted
                # broker — only pre-offset records): failing loudly
                # beats spinning forever against a stalled partition
                raise ValueError(
                    f"fetch stalled at {topic}-{partition}:{offset} < {end}"
                )
            for off, key, value in msgs:
                if off >= end:
                    return
                if off >= offset:
                    yield off, key, value
            offset = msgs[-1][0] + 1

    # Produce v0 (test harness side)
    def produce(
        self,
        topic: str,
        partition: int,
        entries: list[tuple[bytes | None, bytes | None]],
    ) -> int:
        ms = encode_message_set([(0, k, v) for k, v in entries])
        body = (
            _i16(-1)  # acks: all
            + _i32(10_000)
            + _i32(1)
            + _string(topic)
            + _i32(1)
            + _i32(partition)
            + _i32(len(ms))
            + ms
        )
        r = self._roundtrip(API_PRODUCE, body)
        for _ in range(r.i32()):
            r.string()
            for _ in range(r.i32()):
                r.i32()
                err = r.i16()
                base = r.i64()
                if err:
                    raise ValueError(f"Produce error {err}")
                return base
        raise ValueError("empty Produce response")


# ------------------------------------------------------------- broker

@dataclass
class _Log:
    records: list[tuple[bytes | None, bytes | None]] = field(
        default_factory=list
    )


class MiniBroker:
    """Single-node in-process broker: v0 Metadata / ListOffsets /
    Fetch / Produce over an in-memory log. Spec-shaped enough that the
    client above (and therefore the ``pykafka`` DataSource) exercises
    real framing, correlation ids, CRCs, and offset arithmetic over a
    real socket — the JDBC-row testing discipline (embedded Derby)
    applied to the Kafka row."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self.logs: dict[tuple[str, int], _Log] = {}
        self.lock = threading.Lock()
        broker = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                try:
                    while True:
                        raw = self._read(4)
                        (n,) = struct.unpack(">i", raw)
                        req = _Reader(self._read(n))
                        api = req.i16()
                        req.i16()  # version (v0 assumed)
                        corr = req.i32()
                        req.string()  # client id
                        body = broker._dispatch(api, req)
                        resp = _i32(corr) + body
                        self.request.sendall(_i32(len(resp)) + resp)
                except (ConnectionError, OSError):
                    return

            def _read(self, n: int) -> bytes:
                chunks = b""
                while len(chunks) < n:
                    c = self.request.recv(n - len(chunks))
                    if not c:
                        raise ConnectionError("client gone")
                    chunks += c
                return chunks

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self.server = Server((host, port), Handler)
        self.host, self.port = self.server.server_address
        self.thread = threading.Thread(
            target=self.server.serve_forever, daemon=True
        )

    def start(self) -> "MiniBroker":
        self.thread.start()
        return self

    def stop(self) -> None:
        self.server.shutdown()
        self.server.server_close()

    def create_topic(self, topic: str, partitions: int) -> None:
        with self.lock:
            for p in range(partitions):
                self.logs.setdefault((topic, p), _Log())

    # -- API handlers ------------------------------------------------

    def _dispatch(self, api: int, req: _Reader) -> bytes:
        if api == API_METADATA:
            return self._metadata(req)
        if api == API_LIST_OFFSETS:
            return self._list_offsets(req)
        if api == API_FETCH:
            return self._fetch(req)
        if api == API_PRODUCE:
            return self._produce(req)
        raise ValueError(f"unsupported api key {api}")

    def _metadata(self, req: _Reader) -> bytes:
        want = [req.string() for _ in range(req.i32())]
        with self.lock:
            topics: dict[str, list[int]] = {}
            for (t, p) in self.logs:
                topics.setdefault(t, []).append(p)
        if want:
            topics = {t: ps for t, ps in topics.items() if t in want}
        out = _i32(1) + _i32(0) + _string(self.host) + _i32(self.port)
        out += _i32(len(topics))
        for t, ps in sorted(topics.items()):
            out += _i16(0) + _string(t) + _i32(len(ps))
            for p in sorted(ps):
                out += (
                    _i16(0)
                    + _i32(p)
                    + _i32(0)  # leader = this node
                    + _i32(1)
                    + _i32(0)  # replicas
                    + _i32(1)
                    + _i32(0)  # isr
                )
        return out

    def _list_offsets(self, req: _Reader) -> bytes:
        req.i32()  # replica_id
        out_topics = []
        for _ in range(req.i32()):
            t = req.string()
            parts = []
            for _ in range(req.i32()):
                p = req.i32()
                when = req.i64()
                req.i32()  # max_num_offsets
                with self.lock:
                    log = self.logs.get((t, p))
                    if log is None:
                        parts.append(_i32(p) + _i16(3) + _i32(0))  # unknown
                        continue
                    off = 0 if when == EARLIEST else len(log.records)
                parts.append(_i32(p) + _i16(0) + _i32(1) + _i64(off))
            out_topics.append(
                _string(t) + _i32(len(parts)) + b"".join(parts)
            )
        return _i32(len(out_topics)) + b"".join(out_topics)

    def _fetch(self, req: _Reader) -> bytes:
        req.i32()  # replica
        req.i32()  # max_wait
        req.i32()  # min_bytes
        out_topics = []
        for _ in range(req.i32()):
            t = req.string()
            parts = []
            for _ in range(req.i32()):
                p = req.i32()
                offset = req.i64()
                max_bytes = req.i32()
                with self.lock:
                    log = self.logs.get((t, p))
                    if log is None:
                        parts.append(
                            _i32(p) + _i16(3) + _i64(0) + _i32(0)
                        )
                        continue
                    hw = len(log.records)
                    entries = []
                    size = 0
                    for off in range(offset, hw):
                        k, v = log.records[off]
                        m = len(encode_message(k, v)) + 12
                        if entries and size + m > max_bytes:
                            break
                        entries.append((off, k, v))
                        size += m
                ms = encode_message_set(entries)
                parts.append(
                    _i32(p) + _i16(0) + _i64(hw) + _i32(len(ms)) + ms
                )
            out_topics.append(
                _string(t) + _i32(len(parts)) + b"".join(parts)
            )
        return _i32(len(out_topics)) + b"".join(out_topics)

    def _produce(self, req: _Reader) -> bytes:
        req.i16()  # acks
        req.i32()  # timeout
        out_topics = []
        for _ in range(req.i32()):
            t = req.string()
            parts = []
            for _ in range(req.i32()):
                p = req.i32()
                size = req.i32()
                msgs = list(decode_message_set(req.raw(size)))
                with self.lock:
                    log = self.logs.setdefault((t, p), _Log())
                    base = len(log.records)
                    for _, k, v in msgs:
                        log.records.append((k, v))
                parts.append(_i32(p) + _i16(0) + _i64(base))
            out_topics.append(
                _string(t) + _i32(len(parts)) + b"".join(parts)
            )
        return _i32(len(out_topics)) + b"".join(out_topics)
