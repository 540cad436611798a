"""Avro source/sink as a pure-stdlib Python DataSource (round 8).

The reference ships Avro support via the external ``spark-avro``
package (reference `external/avro` era; modern Spark loads it as the
``org.apache.spark:spark-avro`` jar). That jar is absent in this
environment, so instead of documenting the row as blocked, the format
is implemented directly against the PUBLIC Apache Avro 1.11
specification (Object Container Files): magic ``Obj\\x01``, file
metadata map (``avro.schema`` JSON + ``avro.codec``), 16-byte sync
marker, and per-block ``(row count, byte length, payload, sync)``
framing with zigzag-varint longs — wired into Spark through the
Python DataSource SPI (SPARK-44076), the same extension point as
``SyntheticDocsDataSource``.

Scale shape: one input partition per ``.avro`` part file (files decode
independently on executors — no driver funnel), and the writer emits
one container file per task with commit/abort handled by the driver
(_SUCCESS on commit, staged parts removed on abort). The codec is
row-at-a-time Python — this is an AVAILABILITY connector for Avro
interchange; parquet remains the performance path (documented, like
the deliberate ``udf_classic_python`` parity row).

Supported type subset (the engine's table surface): long/int,
double/float, string, bytes, boolean, date (logical ``date``),
timestamp (logical ``timestamp-micros``), decimal (logical
``decimal`` over bytes — two's-complement big-endian unscaled, round
9), array<T>, map<string, V> (string keys, by spec), nested records
(generated unique names ``r0, r1, …``), and nullable fields as
``["null", T]`` unions. Deflate blocks are raw RFC-1951 (``zlib``
with a -15 window), per the spec.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import glob as _glob
import io
import json
import os
import struct
import uuid
import zlib
from dataclasses import dataclass
from typing import Any, Callable, Iterator, List, Optional

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
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

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_EPOCH_DATE = _dt.date(1970, 1, 1)
_EPOCH_TS = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


# ---------------------------------------------------------------- schema

def avro_schema_of(schema: StructType, name: str = "row") -> dict:
    """Spark StructType → Avro record schema (JSON-able dict).

    Nested records get generated names ``r0, r1, …`` in field order —
    Avro requires every named type to be unique within a schema, and
    the generated names are deterministic so the writer's schema JSON
    is byte-stable for a given Spark schema."""
    ctr = iter(range(1_000_000))
    return _record_schema(schema, name, ctr)


def _record_schema(schema: StructType, name: str, ctr: Iterator[int]) -> dict:
    return {
        "type": "record",
        "name": name,
        "fields": [
            {
                "name": f.name,
                "type": (
                    ["null", _avro_type(f.dataType, ctr)]
                    if f.nullable
                    else _avro_type(f.dataType, ctr)
                ),
                **({"default": None} if f.nullable else {}),
            }
            for f in schema.fields
        ],
    }


def _avro_type(dt: DataType, ctr: Optional[Iterator[int]] = None) -> Any:
    if ctr is None:
        ctr = iter(range(1_000_000))
    if isinstance(dt, LongType):
        return "long"
    if isinstance(dt, IntegerType):
        return "int"
    if isinstance(dt, DoubleType):
        return "double"
    if isinstance(dt, FloatType):
        return "float"
    if isinstance(dt, StringType):
        return "string"
    if isinstance(dt, DecimalType):
        # spec: logical decimal over bytes — two's-complement
        # big-endian unscaled value (round 9, VERDICT r8 #5)
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, BinaryType):
        return "bytes"
    if isinstance(dt, BooleanType):
        return "boolean"
    if isinstance(dt, DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, TimestampType):
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, ArrayType):
        if dt.containsNull:
            items: Any = ["null", _avro_type(dt.elementType, ctr)]
        else:
            items = _avro_type(dt.elementType, ctr)
        return {"type": "array", "items": items}
    if isinstance(dt, MapType):
        # Avro map keys are always strings, by spec
        if not isinstance(dt.keyType, StringType):
            raise TypeError(
                f"Avro maps require string keys, got {dt.keyType}"
            )
        if dt.valueContainsNull:
            values: Any = ["null", _avro_type(dt.valueType, ctr)]
        else:
            values = _avro_type(dt.valueType, ctr)
        return {"type": "map", "values": values}
    if isinstance(dt, StructType):
        return _record_schema(dt, f"r{next(ctr)}", ctr)
    raise TypeError(f"unsupported Spark type for Avro: {dt}")


def spark_schema_of(avro: dict) -> StructType:
    """Avro record schema → Spark StructType (inverse of the above)."""
    if avro.get("type") != "record":
        raise TypeError(f"top-level Avro schema must be a record: {avro}")
    fields = []
    for f in avro["fields"]:
        t = f["type"]
        nullable = isinstance(t, list)
        if nullable:
            branches = [b for b in t if b != "null"]
            if len(branches) != 1:
                raise TypeError(f"only [null, T] unions supported: {t}")
            t = branches[0]
        fields.append(StructField(f["name"], _spark_type(t), nullable))
    return StructType(fields)


def _spark_type(t: Any) -> DataType:
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "date":
            return DateType()
        if lt == "timestamp-micros":
            return TimestampType()
        if lt == "decimal":
            return DecimalType(t["precision"], t["scale"])
        if t.get("type") == "array":
            items = t["items"]
            contains_null = isinstance(items, list)
            if contains_null:
                items = [b for b in items if b != "null"][0]
            return ArrayType(_spark_type(items), contains_null)
        if t.get("type") == "map":
            values = t["values"]
            contains_null = isinstance(values, list)
            if contains_null:
                values = [b for b in values if b != "null"][0]
            return MapType(StringType(), _spark_type(values), contains_null)
        if t.get("type") == "record":
            return spark_schema_of(t)
        t = t.get("type")
    return {
        "long": LongType(),
        "int": IntegerType(),
        "double": DoubleType(),
        "float": FloatType(),
        "string": StringType(),
        "bytes": BinaryType(),
        "boolean": BooleanType(),
    }[t]


# -------------------------------------------------------- wire encoding

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: io.BytesIO, n: int) -> None:
    z = _zigzag(n)
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.write(bytes((b | 0x80,)))
        else:
            buf.write(bytes((b,)))
            return


def read_long(buf: io.BufferedIOBase) -> int:
    shift = 0
    acc = 0
    while True:
        raw = buf.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


def _enc_bytes(buf: io.BytesIO, v: bytes) -> None:
    write_long(buf, len(v))
    buf.write(v)


def _dec_bytes(buf: io.BufferedIOBase) -> bytes:
    n = read_long(buf)
    v = buf.read(n)
    if len(v) != n:
        raise EOFError("truncated bytes")
    return v


def _encoder_for(dt: DataType) -> Callable[[io.BytesIO, Any], None]:
    """Value encoder for one non-null Spark-typed value."""
    if isinstance(dt, (LongType, IntegerType)):
        return write_long
    if isinstance(dt, DoubleType):
        return lambda buf, v: buf.write(struct.pack("<d", v))
    if isinstance(dt, FloatType):
        return lambda buf, v: buf.write(struct.pack("<f", v))
    if isinstance(dt, StringType):
        return lambda buf, v: _enc_bytes(buf, v.encode("utf-8"))
    if isinstance(dt, BinaryType):
        return lambda buf, v: _enc_bytes(buf, bytes(v))
    if isinstance(dt, BooleanType):
        return lambda buf, v: buf.write(b"\x01" if v else b"\x00")
    if isinstance(dt, DateType):
        return lambda buf, v: write_long(buf, (v - _EPOCH_DATE).days)
    if isinstance(dt, TimestampType):
        # Spark hands TimestampType to Python as naive datetimes in the
        # session zone; for epoch math they are interpreted as UTC
        # (this container pins UTC). Micros come from integer timedelta
        # fields — total_seconds() is a float whose rounding plus int()
        # truncation encoded ~1% of microsecond timestamps 1µs low
        # (ADVICE r8); timedelta normalization keeps days/seconds/
        # microseconds exact for pre-1970 values too.
        def enc_ts(buf: io.BytesIO, v: Any) -> None:
            td = (
                v.replace(tzinfo=_dt.timezone.utc) if v.tzinfo is None else v
            ) - _EPOCH_TS
            write_long(
                buf,
                (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds,
            )

        return enc_ts
    if isinstance(dt, DecimalType):
        scale = dt.scale

        def enc_decimal(buf: io.BytesIO, v: Any) -> None:
            # two's-complement big-endian unscaled value, minimal
            # length, per the spec's decimal-over-bytes encoding;
            # quantization to the declared scale is exact (Decimal in,
            # Decimal out — no float hop). The unscaled integer is
            # derived from as_tuple() with pure int arithmetic — NOT
            # scaleb/to_integral_value, whose default context
            # (prec=28) silently rounds values with more significant
            # digits than that while DecimalType allows 38 (ADVICE
            # r9); HALF_UP on the magnitude == ROUND_HALF_UP for
            # negatives (half away from zero)
            sign, digits, exp = v.as_tuple()
            d = int("".join(map(str, digits)))
            shift = exp + scale
            if shift >= 0:
                mag = d * 10**shift
            else:
                q, r = divmod(d, 10**-shift)
                mag = q + (1 if 2 * r >= 10**-shift else 0)
            unscaled = -mag if sign else mag
            # minimal signed length: sign bit + magnitude bits, so
            # e.g. 100 -> 0x64, 128 -> 0x0080, -128 -> 0x80
            bits = (
                unscaled if unscaled >= 0 else ~unscaled
            ).bit_length()
            _enc_bytes(
                buf, unscaled.to_bytes(bits // 8 + 1, "big", signed=True)
            )

        return enc_decimal
    if isinstance(dt, ArrayType):
        enc_item = _encoder_for(dt.elementType)
        nullable_items = dt.containsNull

        def enc_array(buf: io.BytesIO, v: Any) -> None:
            # one positive-count block, then the 0 terminator (the
            # simple writer form the spec allows)
            if len(v) > 0:
                write_long(buf, len(v))
                for item in v:
                    if nullable_items:
                        if item is None:
                            write_long(buf, 0)
                            continue
                        write_long(buf, 1)
                    enc_item(buf, item)
            write_long(buf, 0)

        return enc_array
    if isinstance(dt, MapType):
        if not isinstance(dt.keyType, StringType):
            raise TypeError(f"Avro maps require string keys, got {dt.keyType}")
        enc_val = _encoder_for(dt.valueType)
        nullable_vals = dt.valueContainsNull

        def enc_map(buf: io.BytesIO, v: Any) -> None:
            # same block form as arrays: count, (key, value)*, 0.
            # Keys are sorted so the encoding of a given map value is
            # deterministic (dict order is insertion order in Python;
            # Spark's map ordering is unspecified).
            if len(v) > 0:
                write_long(buf, len(v))
                for k in sorted(v):
                    _enc_bytes(buf, k.encode("utf-8"))
                    item = v[k]
                    if nullable_vals:
                        if item is None:
                            write_long(buf, 0)
                            continue
                        write_long(buf, 1)
                    enc_val(buf, item)
            write_long(buf, 0)

        return enc_map
    if isinstance(dt, StructType):
        subs = [(_encoder_for(f.dataType), f.nullable) for f in dt.fields]

        def enc_record(buf: io.BytesIO, v: Any) -> None:
            # nested record: fields in schema order, [null, T] unions
            # exactly like top-level rows (v is a Row / tuple)
            for i, (enc, nullable) in enumerate(subs):
                item = v[i]
                if nullable:
                    if item is None:
                        write_long(buf, 0)
                        continue
                    write_long(buf, 1)
                enc(buf, item)

        return enc_record
    raise TypeError(f"unsupported Spark type for Avro: {dt}")


def _decoder_for(dt: DataType) -> Callable[[io.BufferedIOBase], Any]:
    if isinstance(dt, (LongType, IntegerType)):
        return read_long
    if isinstance(dt, DoubleType):
        return lambda buf: struct.unpack("<d", buf.read(8))[0]
    if isinstance(dt, FloatType):
        return lambda buf: struct.unpack("<f", buf.read(4))[0]
    if isinstance(dt, StringType):
        return lambda buf: _dec_bytes(buf).decode("utf-8")
    if isinstance(dt, BinaryType):
        return _dec_bytes
    if isinstance(dt, BooleanType):
        return lambda buf: buf.read(1) == b"\x01"
    if isinstance(dt, DateType):
        return lambda buf: _EPOCH_DATE + _dt.timedelta(days=read_long(buf))
    if isinstance(dt, TimestampType):
        return lambda buf: (
            _EPOCH_TS + _dt.timedelta(microseconds=read_long(buf))
        ).replace(tzinfo=None)
    if isinstance(dt, DecimalType):
        scale = dt.scale

        def dec_decimal(buf: io.BufferedIOBase) -> _decimal.Decimal:
            # tuple construction, not scaleb: scaleb is a context
            # OPERATION and the default context (prec=28) silently
            # rounds >28-digit unscaled values (ADVICE r9 — the read
            # half of the same bug as the encoder's)
            unscaled = int.from_bytes(_dec_bytes(buf), "big", signed=True)
            return _decimal.Decimal(
                (
                    1 if unscaled < 0 else 0,
                    tuple(int(c) for c in str(abs(unscaled))),
                    -scale,
                )
            )

        return dec_decimal
    if isinstance(dt, ArrayType):
        dec_item = _decoder_for(dt.elementType)
        nullable_items = dt.containsNull

        def dec_array(buf: io.BufferedIOBase) -> list:
            out: list = []
            while True:
                count = read_long(buf)
                if count == 0:
                    return out
                if count < 0:
                    # block with byte-size prefix (spec fast-skip form)
                    read_long(buf)
                    count = -count
                for _ in range(count):
                    if nullable_items and read_long(buf) == 0:
                        out.append(None)
                        continue
                    out.append(dec_item(buf))

        return dec_array
    if isinstance(dt, MapType):
        dec_val = _decoder_for(dt.valueType)
        nullable_vals = dt.valueContainsNull

        def dec_map(buf: io.BufferedIOBase) -> dict:
            out: dict = {}
            while True:
                count = read_long(buf)
                if count == 0:
                    return out
                if count < 0:
                    read_long(buf)
                    count = -count
                for _ in range(count):
                    k = _dec_bytes(buf).decode("utf-8")
                    if nullable_vals and read_long(buf) == 0:
                        out[k] = None
                        continue
                    out[k] = dec_val(buf)

        return dec_map
    if isinstance(dt, StructType):
        subs = [(_decoder_for(f.dataType), f.nullable) for f in dt.fields]

        def dec_record(buf: io.BufferedIOBase) -> tuple:
            out = []
            for dec, nullable in subs:
                if nullable and read_long(buf) == 0:
                    out.append(None)
                    continue
                out.append(dec(buf))
            return tuple(out)

        return dec_record
    raise TypeError(f"unsupported Spark type for Avro: {dt}")


# ------------------------------------------------------- container file

def write_container(
    path: str,
    schema: StructType,
    rows: Iterator[Any],
    codec: str = "deflate",
    block_rows: int = 4096,
) -> int:
    """Write one Avro Object Container File; returns rows written."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec: {codec}")
    sync = uuid.uuid4().bytes
    encoders = [
        (_encoder_for(f.dataType), f.nullable) for f in schema.fields
    ]
    n_fields = len(encoders)
    total = 0
    with open(path, "wb") as out:
        out.write(MAGIC)
        meta = io.BytesIO()
        write_long(meta, 2)
        _enc_bytes(meta, b"avro.schema")
        _enc_bytes(
            meta,
            json.dumps(avro_schema_of(schema), separators=(",", ":")).encode(),
        )
        _enc_bytes(meta, b"avro.codec")
        _enc_bytes(meta, codec.encode())
        write_long(meta, 0)
        out.write(meta.getvalue())
        out.write(sync)

        block = io.BytesIO()
        n_block = 0

        def flush() -> None:
            nonlocal n_block
            if not n_block:
                return
            payload = block.getvalue()
            if codec == "deflate":
                c = zlib.compressobj(6, zlib.DEFLATED, -15)
                payload = c.compress(payload) + c.flush()
            head = io.BytesIO()
            write_long(head, n_block)
            write_long(head, len(payload))
            out.write(head.getvalue())
            out.write(payload)
            out.write(sync)
            block.seek(0)
            block.truncate()
            n_block = 0

        for row in rows:
            for i in range(n_fields):
                enc, nullable = encoders[i]
                v = row[i]
                if nullable:
                    if v is None:
                        write_long(block, 0)
                        continue
                    write_long(block, 1)
                enc(block, v)
            n_block += 1
            total += 1
            if n_block >= block_rows:
                flush()
        flush()
    return total


def read_container_schema(path: str) -> tuple[StructType, dict]:
    """Driver-side metadata read: (Spark schema, raw file metadata)."""
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro container file: {path}")
        meta = _read_meta_map(f)
    avro = json.loads(meta[b"avro.schema"].decode())
    return spark_schema_of(avro), meta


def _read_meta_map(f: io.BufferedIOBase) -> dict:
    meta: dict = {}
    while True:
        count = read_long(f)
        if count == 0:
            return meta
        if count < 0:
            read_long(f)
            count = -count
        for _ in range(count):
            k = _dec_bytes(f)
            meta[k] = _dec_bytes(f)


def read_container(path: str, schema: StructType) -> Iterator[tuple]:
    """Decode every row of one container file (executor-side)."""
    decoders = [
        (_decoder_for(f.dataType), f.nullable) for f in schema.fields
    ]
    with open(path, "rb") as f:
        if f.read(4) != MAGIC:
            raise ValueError(f"not an Avro container file: {path}")
        meta = _read_meta_map(f)
        codec = meta.get(b"avro.codec", b"null").decode()
        if codec not in ("null", "deflate"):
            raise ValueError(f"unsupported avro codec: {codec}")
        sync = f.read(SYNC_SIZE)
        while True:
            try:
                n_rows = read_long(f)
            except EOFError:
                return
            n_bytes = read_long(f)
            payload = f.read(n_bytes)
            if len(payload) != n_bytes:
                raise EOFError(f"truncated block in {path}")
            if codec == "deflate":
                payload = zlib.decompress(payload, -15)
            block = io.BytesIO(payload)
            for _ in range(n_rows):
                row = []
                for dec, nullable in decoders:
                    if nullable and read_long(block) == 0:
                        row.append(None)
                        continue
                    row.append(dec(block))
                yield tuple(row)
            if f.read(SYNC_SIZE) != sync:
                raise ValueError(f"sync-marker mismatch in {path}")


# ------------------------------------------------------ DataSource SPI

def _part_files(path: str) -> List[str]:
    return sorted(_glob.glob(os.path.join(path, "part-*.avro")))


class AvroDataSource(DataSource):
    """``spark.read.format("pyavro").load(dir)`` /
    ``df.write.format("pyavro").option("codec", ...).save(dir)``.

    Read schema comes from the first part file's ``avro.schema``
    metadata (driver-side header read only) unless the user declares
    one; each part file is one input partition.
    """

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self) -> StructType:
        path = self.options.get("path")
        if not path:
            raise ValueError("pyavro requires a path")
        files = _part_files(path)
        if not files:
            raise FileNotFoundError(f"no part-*.avro files under {path}")
        schema, _ = read_container_schema(files[0])
        return schema

    def reader(self, schema: StructType) -> "AvroReader":
        return AvroReader(self.options["path"], schema)

    def writer(self, schema: StructType, overwrite: bool) -> "AvroWriter":
        return AvroWriter(
            self.options["path"],
            schema,
            overwrite,
            codec=self.options.get("codec", "deflate"),
        )

    def streamWriter(
        self, schema: StructType, overwrite: bool
    ) -> "AvroStreamWriter":
        return AvroStreamWriter(
            self.options["path"],
            schema,
            codec=self.options.get("codec", "deflate"),
        )


class AvroReader(DataSourceReader):
    def __init__(self, path: str, schema: StructType) -> None:
        self.files = _part_files(path)
        if not self.files:
            raise FileNotFoundError(f"no part-*.avro files under {path}")
        self.schema_struct = schema

    def partitions(self) -> List[InputPartition]:
        return [InputPartition(f) for f in self.files]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return read_container(partition.value, self.schema_struct)


@dataclass
class AvroCommit(WriterCommitMessage):
    file: str
    rows: int


class AvroWriter(DataSourceWriter):
    def __init__(
        self, path: str, schema: StructType, overwrite: bool, codec: str
    ) -> None:
        self.path = path
        self.schema_struct = schema
        self.codec = codec
        if overwrite and os.path.isdir(path):
            for f in _part_files(path):
                os.remove(f)
            marker = os.path.join(path, "_SUCCESS")
            if os.path.exists(marker):
                os.remove(marker)
        os.makedirs(path, exist_ok=True)

    def write(self, iterator: Iterator[Any]) -> AvroCommit:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        # stage under a dotted name (invisible to _part_files) and
        # publish via atomic rename in commit — a failed task never
        # leaves a half-written part visible to readers
        base = f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.avro"
        stage = os.path.join(self.path, "." + base)
        n = write_container(stage, self.schema_struct, iterator, self.codec)
        return AvroCommit(file=stage, rows=n)

    def commit(self, messages: List[Optional[AvroCommit]]) -> None:
        for m in messages:
            if m is not None:
                d, b = os.path.split(m.file)
                os.rename(m.file, os.path.join(d, b.lstrip(".")))
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def abort(self, messages: List[Optional[AvroCommit]]) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class AvroStreamWriter(DataSourceStreamWriter):
    """Streaming Avro sink — ``df.writeStream.format("pyavro")``.

    Exactly-once by batch replacement: ``write`` only STAGES dotted
    files (invisible to readers); ``commit(messages, batchId)``
    first deletes any ``part-b{batchId}-*`` files a previous attempt
    of the SAME micro-batch published, then renames the new staged
    set in — so a replayed batch (failure between sink commit and
    offset-log commit) overwrites itself instead of appending
    duplicates, the same idempotence contract as the engine's
    batch_id-partitioned parquet gates."""

    def __init__(self, path: str, schema: StructType, codec: str) -> None:
        self.path = path
        self.schema_struct = schema
        self.codec = codec
        os.makedirs(path, exist_ok=True)

    def write(self, iterator: Iterator[Any]) -> AvroCommit:
        stage = os.path.join(self.path, f".stream-{uuid.uuid4().hex}.avro")
        n = write_container(stage, self.schema_struct, iterator, self.codec)
        return AvroCommit(file=stage, rows=n)

    def commit(
        self, messages: List[Optional[AvroCommit]], batchId: int
    ) -> None:
        for old in _glob.glob(
            os.path.join(self.path, f"part-b{batchId:05d}-*.avro")
        ):
            os.remove(old)
        for i, m in enumerate(messages):
            if m is not None:
                os.rename(
                    m.file,
                    os.path.join(
                        self.path, f"part-b{batchId:05d}-{i:05d}.avro"
                    ),
                )

    def abort(
        self, messages: List[Optional[AvroCommit]], batchId: int
    ) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


def register(spark) -> None:
    """Idempotent registration of the pyavro format: a same-session
    re-register replaces (WARN), but a session sharing another
    session's registry raises ALREADY_EXISTS — swallow exactly that
    case so every caller can register unconditionally."""
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        spark.dataSource.register(AvroDataSource)
    except AnalysisException as e:
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise
