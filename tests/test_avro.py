"""Avro pure-stdlib codec + Python DataSource tests (round 8).

The wire-format half runs with no JVM: golden zigzag-varint bytes
straight from the Avro 1.11 spec's own examples, container roundtrips
under both codecs, and corrupted-file failure modes. The Spark half
proves the SPI wiring: partitioned write → schema-from-metadata read →
value-identical rows, overwrite semantics, and parallel decode (one
input partition per part file).
"""

from __future__ import annotations

import datetime as dt
import io
import os
from decimal import Decimal

import pytest

from big_data_project_implementation_spark.sources import avro_format as av
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DateType,
    DecimalType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SF_DIR = "/root/testdata/sf0.001"


# ------------------------------------------------------------- codec


def test_zigzag_varint_golden_bytes():
    """The spec's published example encodings, byte for byte."""
    golden = {
        0: b"\x00",
        -1: b"\x01",
        1: b"\x02",
        -2: b"\x03",
        2: b"\x04",
        -64: b"\x7f",
        64: b"\x80\x01",
        -65: b"\x81\x01",
        8192: b"\x80\x80\x01",
    }
    for n, want in golden.items():
        buf = io.BytesIO()
        av.write_long(buf, n)
        assert buf.getvalue() == want, n
        assert av.read_long(io.BytesIO(want)) == n


def test_long_extremes_roundtrip():
    for n in (2**63 - 1, -(2**63), 2**31, -(2**31) - 1, 123456789012345):
        buf = io.BytesIO()
        av.write_long(buf, n)
        assert av.read_long(io.BytesIO(buf.getvalue())) == n


FULL_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("i", IntegerType(), True),
        StructField("d", DoubleType(), True),
        StructField("f", FloatType(), True),
        StructField("s", StringType(), True),
        StructField("b", BinaryType(), True),
        StructField("flag", BooleanType(), True),
        StructField("day", DateType(), True),
        StructField("ts", TimestampType(), True),
        StructField("arr", ArrayType(LongType(), True), True),
        StructField("farr", ArrayType(FloatType(), False), True),
    ]
)

FULL_ROWS = [
    (
        1,
        -42,
        3.5,
        1.25,
        "héllo\nworld \x00&<>",
        b"\x00\xff\x01",
        True,
        dt.date(2026, 2, 28),
        dt.datetime(2026, 2, 28, 12, 34, 56, 789012),
        [1, None, -3],
        [0.5, 2.0],
    ),
    (2, None, None, None, None, None, None, None, None, None, None),
    (3, 0, -0.0, 0.0, "", b"", False, dt.date(1969, 12, 31), None, [], []),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_all_types(tmp_path, codec):
    path = str(tmp_path / "t.avro")
    n = av.write_container(
        path, FULL_SCHEMA, iter(FULL_ROWS), codec=codec, block_rows=2
    )
    assert n == 3
    schema, meta = av.read_container_schema(path)
    assert meta[b"avro.codec"].decode() == codec
    assert schema == FULL_SCHEMA
    assert list(av.read_container(path, FULL_SCHEMA)) == FULL_ROWS


def test_container_multiple_blocks(tmp_path):
    path = str(tmp_path / "t.avro")
    schema = StructType([StructField("x", LongType(), False)])
    rows = [(i,) for i in range(10_001)]
    av.write_container(path, schema, iter(rows), block_rows=100)
    assert list(av.read_container(path, schema)) == rows


def test_corrupt_magic_and_sync_fail_loudly(tmp_path):
    path = str(tmp_path / "t.avro")
    schema = StructType([StructField("x", LongType(), False)])
    av.write_container(path, schema, iter([(1,), (2,)]), codec="null")
    raw = bytearray(open(path, "rb").read())
    bad = str(tmp_path / "bad.avro")
    open(bad, "wb").write(b"Nope" + raw[4:])
    with pytest.raises(ValueError, match="not an Avro container"):
        list(av.read_container(bad, schema))
    # flip a byte in the trailing sync marker
    raw[-1] ^= 0xFF
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="sync-marker mismatch"):
        list(av.read_container(bad, schema))


def test_schema_mapping_is_inverse():
    assert av.spark_schema_of(av.avro_schema_of(FULL_SCHEMA)) == FULL_SCHEMA


# --------------------------- round-9 type-matrix close (VERDICT r8 #5)

R9_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("amount", DecimalType(12, 2), True),
        StructField("tags", MapType(StringType(), LongType(), True), True),
        StructField(
            "addr",
            StructType(
                [
                    StructField("city", StringType(), True),
                    StructField("zip", IntegerType(), False),
                    StructField(
                        "geo",
                        StructType(
                            [
                                StructField("lat", DoubleType(), False),
                                StructField("lon", DoubleType(), False),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
    ]
)

R9_ROWS = [
    (
        1,
        Decimal("12345.67"),
        {"a": 1, "b": None},
        ("Berlin", 10115, (52.52, 13.405)),
    ),
    (2, Decimal("-0.01"), {}, ("Paris", 75001, None)),
    (3, None, None, None),
    (4, Decimal("0.00"), {"only": 7}, (None, 0, (0.0, -0.0))),
]


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip_decimal_map_record(tmp_path, codec):
    path = str(tmp_path / "r9.avro")
    n = av.write_container(
        path, R9_SCHEMA, iter(R9_ROWS), codec=codec, block_rows=2
    )
    assert n == 4
    schema, _ = av.read_container_schema(path)
    assert schema == R9_SCHEMA
    assert list(av.read_container(path, R9_SCHEMA)) == R9_ROWS


def test_r9_schema_mapping_is_inverse():
    avro = av.avro_schema_of(R9_SCHEMA)
    # the decimal logical type carries precision/scale through
    amt = next(f for f in avro["fields"] if f["name"] == "amount")
    body = [b for b in amt["type"] if b != "null"][0]
    assert body == {
        "type": "bytes",
        "logicalType": "decimal",
        "precision": 12,
        "scale": 2,
    }
    # nested record names are unique and deterministic
    addr = next(f for f in avro["fields"] if f["name"] == "addr")
    rec = [b for b in addr["type"] if b != "null"][0]
    geo = next(f for f in rec["fields"] if f["name"] == "geo")
    inner = [b for b in geo["type"] if b != "null"][0]
    assert rec["name"] != inner["name"]
    assert av.spark_schema_of(avro) == R9_SCHEMA


def test_decimal_golden_bytes():
    """Two's-complement big-endian unscaled value at MINIMAL length,
    per the spec's decimal-over-bytes logical type: the bytes another
    Avro implementation would write for these values."""
    enc = av._encoder_for(DecimalType(9, 2))
    golden = {
        # value -> length-prefixed bytes (zigzag varint length first)
        Decimal("1.00"): b"\x02\x64",  # unscaled 100 -> 1 byte
        Decimal("1.28"): b"\x04\x00\x80",  # 128 needs a sign byte
        Decimal("-0.01"): b"\x02\xff",  # -1 -> 0xFF
        Decimal("-1.28"): b"\x02\x80",  # -128 fits ONE signed byte
        Decimal("0.00"): b"\x02\x00",
        Decimal("655.36"): b"\x06\x01\x00\x00",  # 65536
    }
    for v, want in golden.items():
        buf = io.BytesIO()
        enc(buf, v)
        assert buf.getvalue() == want, v
        dec = av._decoder_for(DecimalType(9, 2))
        assert dec(io.BytesIO(want)) == v


def test_timestamp_micros_exact_integer_arithmetic():
    """ADVICE r8 (medium): total_seconds()*1e6 encoded ~1% of
    microsecond timestamps 1µs low via float rounding + int()
    truncation. The encoder now uses integer timedelta fields; the
    encoded long must equal exact epoch-micros for every sample,
    including pre-1970 (negative micros) values."""
    enc = av._encoder_for(TimestampType())
    samples = [
        # a previously-corrupted class: micros where float(seconds)
        # rounds below the true value
        dt.datetime(2026, 2, 28, 12, 34, 56, 100001),
        dt.datetime(1999, 12, 31, 23, 59, 59, 999999),
        dt.datetime(2085, 7, 1, 0, 0, 0, 333333),
        # pre-1970: timedelta normalization must stay exact
        dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
        dt.datetime(1901, 6, 15, 1, 2, 3, 4),
        dt.datetime(1970, 1, 1, 0, 0, 0, 0),
    ]
    for v in samples:
        want = (
            (v - dt.datetime(1970, 1, 1)) // dt.timedelta(microseconds=1)
        )
        buf = io.BytesIO()
        enc(buf, v)
        assert av.read_long(io.BytesIO(buf.getvalue())) == want, v

    # brute sweep over a full second of microsecond offsets at a
    # timestamp where the float path demonstrably truncated
    base = dt.datetime(2070, 1, 1, 0, 0, 0)
    epoch = dt.datetime(1970, 1, 1)
    for us in range(0, 1_000_000, 7919):
        v = base.replace(microsecond=us)
        buf = io.BytesIO()
        enc(buf, v)
        got = av.read_long(io.BytesIO(buf.getvalue()))
        assert got == (v - epoch) // dt.timedelta(microseconds=1), us


# ------------------------------------------------------------- Spark SPI


def test_spark_write_read_roundtrip_documents(spark, tmp_path):
    av.register(spark)
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "docs_avro")
    src.write.format("pyavro").mode("overwrite").save(out)
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    parts = [f for f in os.listdir(out) if f.startswith("part-")]
    assert len(parts) >= 1 and all(f.endswith(".avro") for f in parts)
    # schema comes from the container metadata — no user schema given
    back = spark.read.format("pyavro").load(out)
    assert back.schema == src.schema
    a = sorted(src.collect(), key=lambda r: r.doc_id)
    b = sorted(back.collect(), key=lambda r: r.doc_id)
    assert a == b
    # one input partition per part file (executor-parallel decode)
    assert back.rdd.getNumPartitions() == len(parts)


def test_spark_roundtrip_embeddings_float_arrays(spark, tmp_path):
    av.register(spark)
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = str(tmp_path / "emb_avro")
    src.write.format("pyavro").mode("overwrite").option("codec", "null").save(
        out
    )
    back = spark.read.format("pyavro").load(out)
    assert back.schema == src.schema
    a = sorted(src.collect(), key=lambda r: r.vec_id)
    b = sorted(back.collect(), key=lambda r: r.vec_id)
    assert a == b


def test_spark_roundtrip_decimal_map_record(spark, tmp_path):
    """Round-9 type-matrix close through the FULL SPI loop: Spark
    write (Row-in) → container bytes → Spark schema-from-metadata
    read (tuple/dict/Decimal-out) is value-identical, including NULL
    at every nesting level."""
    av.register(spark)
    src = spark.createDataFrame(R9_ROWS, R9_SCHEMA)
    out = str(tmp_path / "r9_avro")
    src.write.format("pyavro").mode("overwrite").save(out)
    back = spark.read.format("pyavro").load(out)
    assert back.schema == R9_SCHEMA
    a = sorted(src.collect(), key=lambda r: r.id)
    b = sorted(back.collect(), key=lambda r: r.id)
    assert a == b


def test_spark_overwrite_replaces_parts(spark, tmp_path):
    av.register(spark)
    out = str(tmp_path / "ow_avro")
    one = spark.range(10).selectExpr("id", "CAST(id AS STRING) AS s")
    two = spark.range(3).selectExpr("id", "CAST(id * 7 AS STRING) AS s")
    # Python DataSources reject the default ErrorIfExists save mode
    one.repartition(4).write.format("pyavro").mode("append").save(out)
    two.repartition(1).write.format("pyavro").mode("overwrite").save(out)
    back = spark.read.format("pyavro").load(out)
    assert sorted(r.s for r in back.collect()) == ["0", "14", "7"]


def test_stream_sink_roundtrip_documents(spark, tmp_path):
    """writeStream.format("pyavro"): the streaming half of the SPI —
    every arriving row lands in batch-stamped container files and
    reads back value-identical to the batch table."""
    from big_data_project_implementation_spark.queries.registry import (
        documents_stream,
    )

    av.register(spark)
    out = str(tmp_path / "stream_avro")
    ckpt = str(tmp_path / "ckpt")
    # run in the registering session: the DataSourceManager snapshot a
    # newSession() clones does not see post-clone registrations
    q = (
        documents_stream(spark, SF_DIR)
        .writeStream.format("pyavro")
        .option("path", out)
        .option("codec", "null")
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    src = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    back = spark.read.format("pyavro").load(out)
    assert back.schema == src.schema
    assert sorted(back.collect(), key=lambda r: r.doc_id) == sorted(
        src.collect(), key=lambda r: r.doc_id
    )
    parts = [f for f in os.listdir(out) if f.startswith("part-b")]
    assert parts, "stream sink produced no batch-stamped parts"


def test_stream_sink_replayed_batch_overwrites(tmp_path):
    """A replayed micro-batch (failure between sink commit and offset
    commit) REPLACES its own files instead of appending duplicates —
    driven directly through the writer protocol."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("x", LongType(), False)])
    path = str(tmp_path / "sink")
    w = av.AvroStreamWriter(path, schema, codec="null")

    def attempt(rows):
        stage = os.path.join(path, f".stream-manual-{len(rows)}.avro")
        av.write_container(stage, schema, iter(rows), codec="null")
        return av.AvroCommit(file=stage, rows=len(rows))

    w.commit([attempt([(1,), (2,)])], batchId=7)
    # replay of batch 7 with the same logical content
    w.commit([attempt([(1,), (2,)])], batchId=7)
    files = sorted(os.listdir(path))
    assert files == ["part-b00007-00000.avro"], files
    got = list(av.read_container(os.path.join(path, files[0]), schema))
    assert got == [(1,), (2,)]


def test_decimal_high_precision_exact(tmp_path):
    """ADVICE r9 (medium): the encoder used scaleb/to_integral_value
    under the DEFAULT decimal context (prec=28), silently rounding
    values with more significant digits — while DecimalType allows 38
    and the writer advertises that precision in the schema. The
    unscaled integer is now derived from as_tuple() in pure int
    arithmetic: every 38-digit value must round-trip bit-exactly, and
    quantization (more input scale than declared) must be HALF_UP away
    from zero at full precision."""
    s38 = StructType([StructField("v", DecimalType(38, 10), True)])
    vals = [
        Decimal("9999999999999999999999999999.9999999999"),  # 38 digits
        Decimal("-9999999999999999999999999999.9999999999"),
        Decimal("1234567890123456789012345678.9012345678"),
        Decimal("-0.0000000001"),
        Decimal("12345678901234567890123456789012345678E-10"),
    ]
    path = str(tmp_path / "p38.avro")
    av.write_container(path, s38, iter([(v,) for v in vals]))
    assert [r[0] for r in av.read_container(path, s38)] == vals

    # quantization path: 29+ significant digits, half-up both signs
    enc = av._encoder_for(DecimalType(38, 2))
    dec = av._decoder_for(DecimalType(38, 2))

    def rt(v):
        buf = io.BytesIO()
        enc(buf, v)
        return dec(io.BytesIO(buf.getvalue()))

    # NB string literals throughout: even unary minus on a Decimal is
    # a context operation that rounds >28-digit values
    big = Decimal("123456789012345678901234567890.125")
    neg = Decimal("-123456789012345678901234567890.125")
    assert rt(big) == Decimal("123456789012345678901234567890.13")
    assert rt(neg) == Decimal("-123456789012345678901234567890.13")
    assert rt(Decimal("1E-9")) == Decimal("0.00")
