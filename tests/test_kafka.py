"""Kafka direct-stream row: pure-stdlib wire protocol + pykafka
DataSource, live-tested against the in-process MiniBroker over real
sockets — the embedded-Derby (test_jdbc.py) discipline applied to the
one §2 source a real deployment hits daily (reference
DirectKafkaInputDStream / KafkaRDD semantics)."""

from __future__ import annotations

import threading

import pytest

from big_data_project_implementation_spark.sources import kafka_source as ks
from big_data_project_implementation_spark.sources.kafka_wire import (
    EARLIEST,
    LATEST,
    KafkaClient,
    MiniBroker,
    decode_message_set,
    encode_message_set,
)


@pytest.fixture()
def broker():
    b = MiniBroker().start()
    yield b
    b.stop()


def _producer(b: MiniBroker) -> KafkaClient:
    return KafkaClient(b.host, b.port)


# ------------------------------------------------------------- wire


def test_message_set_roundtrip_and_crc():
    entries = [
        (0, b"k0", b"v0"),
        (1, None, b"tombstone-key"),
        (2, b"k2", None),
        (3, b"", b""),
    ]
    raw = encode_message_set(entries)
    assert list(decode_message_set(raw)) == entries
    # flip one payload byte: CRC must catch it
    bad = bytearray(raw)
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC mismatch"):
        list(decode_message_set(bytes(bad)))
    # truncated tail decodes cleanly up to the cut (spec: brokers may
    # cut the final message at max_bytes)
    assert list(decode_message_set(raw[: len(raw) - 3]))[:3] == entries[:3]


def test_broker_client_roundtrip(broker):
    broker.create_topic("t", 2)
    c = _producer(broker)
    try:
        assert c.metadata() == {"t": [0, 1]}
        assert c.produce("t", 0, [(b"a", b"1"), (b"b", b"2")]) == 0
        assert c.produce("t", 0, [(None, b"3")]) == 2
        assert c.produce("t", 1, [(b"x", b"9")]) == 0
        assert c.list_offset("t", 0, EARLIEST) == 0
        assert c.list_offset("t", 0, LATEST) == 3
        hw, msgs = c.fetch("t", 0, 1)
        assert hw == 3
        assert [(o, v) for o, _, v in msgs] == [(1, b"2"), (2, b"3")]
        # bounded range replay is deterministic
        one = list(c.fetch_range("t", 0, 0, 2))
        two = list(c.fetch_range("t", 0, 0, 2))
        assert one == two == [(0, b"a", b"1"), (1, b"b", b"2")]
    finally:
        c.close()


def test_fetch_respects_max_bytes_and_resumes(broker):
    broker.create_topic("big", 1)
    c = _producer(broker)
    try:
        c.produce("big", 0, [(None, bytes([i]) * 100) for i in range(20)])
        # tiny max_bytes: at least one message per fetch, never zero
        # (otherwise a consumer would stall forever — spec behavior)
        _, msgs = c.fetch("big", 0, 0, max_bytes=50)
        assert len(msgs) == 1
        got = list(c.fetch_range("big", 0, 0, 20))
        assert len(got) == 20
        assert got[7][2] == bytes([7]) * 100
    finally:
        c.close()


def test_concurrent_clients(broker):
    broker.create_topic("cc", 4)
    errs: list[Exception] = []

    def work(p: int) -> None:
        try:
            c = _producer(broker)
            c.produce("cc", p, [(None, b"m%d" % i) for i in range(50)])
            assert c.list_offset("cc", p, LATEST) == 50
            assert len(list(c.fetch_range("cc", p, 0, 50))) == 50
            c.close()
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=work, args=(p,)) for p in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs


# ------------------------------------------------------------- Spark


def _fill(broker, topic="events", parts=3, per=40):
    broker.create_topic(topic, parts)
    c = _producer(broker)
    try:
        for p in range(parts):
            c.produce(
                topic,
                p,
                [
                    (b"u%d" % (i % 7), b"p%d-m%d" % (p, i))
                    for i in range(per)
                ],
            )
    finally:
        c.close()


def test_spark_batch_read_one_split_per_partition(spark, broker):
    _fill(broker)
    ks.register(spark)
    df = (
        spark.read.format("pykafka")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", "events")
        .load()
    )
    assert df.schema == ks.SCHEMA
    # the KafkaRDD layout: one input partition per topic-partition
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 120
    got = {(r.partition, r.offset): bytes(r.value) for r in rows}
    assert got[(1, 5)] == b"p1-m5"
    assert all(r.topic == "events" for r in rows[:5])


def test_spark_stream_exactly_once_across_restart(spark, broker, tmp_path):
    """The direct-stream contract end to end: first availableNow run
    drains everything once; records produced AFTER it are the ONLY
    rows of the second run from the same checkpoint (offset log +
    deterministic range replay — no duplicates, no loss)."""
    _fill(broker, per=25)
    ks.register(spark)
    out: list[tuple] = []

    def run_once():
        q = (
            spark.readStream.format("pykafka")
            .option("bootstrap", f"{broker.host}:{broker.port}")
            .option("topic", "events")
            .load()
            .writeStream.foreachBatch(
                lambda batch, _bid: out.extend(
                    (r.partition, r.offset, bytes(r.value))
                    for r in batch.collect()
                )
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert len(out) == 75
    assert len(set(out)) == 75, "duplicate (partition, offset) delivered"
    first = set(out)

    c = _producer(broker)
    try:
        c.produce("events", 1, [(None, b"late-1"), (None, b"late-2")])
    finally:
        c.close()
    run_once()
    assert len(out) == 77
    second = set(out) - first
    assert {v for (_, _, v) in second} == {b"late-1", b"late-2"}


def test_stream_reader_replay_is_deterministic(broker):
    """partitions(start, end) + read replayed with identical offsets
    return identical records — the property exactly-once rests on."""
    _fill(broker, topic="replay", parts=2, per=10)
    r = ks.KafkaStreamReader(
        {
            "bootstrap": f"{broker.host}:{broker.port}",
            "topic": "replay",
        }
    )
    try:
        start = r.initialOffset()
        end = r.latestOffset()
        assert start == {"replay-0": 0, "replay-1": 0}
        assert end == {"replay-0": 10, "replay-1": 10}
        splits = r.partitions(start, end)
        assert len(splits) == 2
        one = sorted(
            row for s in splits for row in r.read(s)
        )
        two = sorted(
            row for s in r.partitions(start, end) for row in r.read(s)
        )
        assert one == two and len(one) == 20
    finally:
        r.stop()


def test_spark_batch_sink_produces(spark, broker):
    """df.write.format("pykafka"): the Produce half of the connector —
    every row lands in the broker, routed by the partition column."""
    broker.create_topic("out", 2)
    ks.register(spark)
    df = spark.range(10).selectExpr(
        "CAST(CAST(id AS STRING) AS BINARY) AS key",
        "CAST(CONCAT('v', CAST(id AS STRING)) AS BINARY) AS value",
        "CAST(id % 2 AS INT) AS partition",
    )
    (
        df.write.format("pykafka")
        .mode("append")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", "out")
        .save()
    )
    c = _producer(broker)
    try:
        assert c.list_offset("out", 0, LATEST) == 5
        assert c.list_offset("out", 1, LATEST) == 5
        got = {
            (p, bytes(k).decode()): v
            for p in (0, 1)
            for _, k, v in c.fetch_range("out", p, 0, 5)
        }
        assert got[(1, "3")] == b"v3"
        assert got[(0, "4")] == b"v4"
    finally:
        c.close()


def test_spark_stream_sink_roundtrip(spark, broker, tmp_path):
    """writeStream.format("pykafka") → broker → batch read back: the
    full out-and-back loop through both halves of the connector."""
    _fill(broker, topic="src", parts=2, per=15)
    broker.create_topic("mirror", 2)
    ks.register(spark)
    q = (
        spark.readStream.format("pykafka")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", "src")
        .load()
        .select("key", "value", "partition")
        .writeStream.format("pykafka")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", "mirror")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    src = (
        spark.read.format("pykafka")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", "src")
        .load()
    )
    mirror = (
        spark.read.format("pykafka")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", "mirror")
        .load()
    )
    a = sorted((r.partition, bytes(r.key), bytes(r.value)) for r in src.collect())
    b = sorted(
        (r.partition, bytes(r.key), bytes(r.value)) for r in mirror.collect()
    )
    assert a == b and len(a) == 30


def test_batch_sink_many_records_one_task_flushes_bounded(spark, broker):
    """VERDICT r8 #4: the sink flushes each partition bucket every
    1000 records instead of buffering a task's whole split — 5,000
    records through ONE task (coalesce(1)) must all land, in order
    within each topic-partition, and NULL partition values route to
    the task's default partition instead of raising (ADVICE r8)."""
    broker.create_topic("bulk", 2)
    ks.register(spark)
    n = 5000
    df = (
        spark.range(n)
        .coalesce(1)
        .selectExpr(
            "CAST(CAST(id AS STRING) AS BINARY) AS key",
            "CAST(CONCAT('v', CAST(id AS STRING)) AS BINARY) AS value",
            # every 10th row has a NULL partition -> default routing
            "CAST(CASE WHEN id % 10 = 9 THEN NULL ELSE id % 2 END AS INT)"
            " AS partition",
        )
    )
    (
        df.write.format("pykafka")
        .mode("append")
        .option("bootstrap", f"{broker.host}:{broker.port}")
        .option("topic", "bulk")
        .save()
    )
    c = _producer(broker)
    try:
        o0 = c.list_offset("bulk", 0, LATEST)
        o1 = c.list_offset("bulk", 1, LATEST)
        assert o0 + o1 == n, "every record must land exactly once"
        got = {}
        per_part_keys: dict[int, list[int]] = {0: [], 1: []}
        for p, hi in ((0, o0), (1, o1)):
            for _, k, v in c.fetch_range("bulk", p, 0, hi):
                key = int(bytes(k).decode())
                got[key] = (p, bytes(v))
                per_part_keys[p].append(key)
        assert len(got) == n
        for i in (0, 1, 9, 999, 1000, 1001, 4999):
            assert got[i][1] == b"v%d" % i
        # NULL partitions all routed to ONE deterministic partition
        # (the single task's default), not dropped or crashed
        null_parts = {got[i][0] for i in range(9, n, 10)}
        assert len(null_parts) == 1
        # per-partition arrival order preserved across flush
        # boundaries (multiple 1000-record flushes interleave buckets
        # but must keep each bucket's internal order)
        for p in (0, 1):
            assert per_part_keys[p] == sorted(per_part_keys[p])
    finally:
        c.close()
