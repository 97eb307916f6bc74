"""Avro Object Container Files without the spark-avro DataSource.

Why this exists: the reference's NiFi processors write records through
an AvroRecordSetWriter (reference: nifi-datasynthesizer processors'
record-writer configuration); Spark's equivalent is the external
``spark-avro`` module, which :func:`io.write` gates on and which an
offline environment cannot fetch (documented in SURVEY §6).  The Avro
1.x container format itself is a small, public specification — magic
``Obj\\x01``, a string→bytes metadata map carrying the schema JSON and
codec, then sync-marked blocks of zigzag-varint-encoded records — so
this module implements it directly: primitives ``long int double
float string boolean bytes``, the ``timestamp-micros`` and ``date``
logical types (top level) plus ``decimal`` (nestable — exact unscaled
big-endian bytes over ``bytes`` OR ``fixed``, exact at any precision
up to the context widening in the codec), nested ``record`` /
``array`` / string-keyed ``map`` columns (the shapes the reference's
map / sequence / join samplers emit), ``enum`` (symbol-index ↔ string)
and ``fixed`` (raw width bytes ↔ binary) for foreign-written files,
named-type REFERENCES with spec namespace resolution (bare names
resolve against the enclosing namespace, dotted names are absolute;
union-guarded recursive records decode via lazy codecs — their Spark
schema mapping raises, since no finite schema exists), and nullable
columns as ``["null", T]`` unions with the null branch at either
index.  Unions wider than the nullable 2-branch form raise
``TypeError`` — they cannot map onto one Spark column type.

Spec compliance is proven against the OFFICIAL Java implementation
bundled with pyspark (``avro-1.12.1.jar``): tests write files here and
read them back with ``org.apache.avro.file.DataFileReader``, and write
files with ``DataFileWriter`` and read them back here — both
directions byte-level interoperable (tests/test_io.py).

Scale shape: :func:`write_avro` runs one encoder per partition inside
``mapInArrow`` (values read straight off the Arrow arrays — exact
int64, true-UTC timestamp micros — one container file per partition,
records never gathered to the driver); :func:`read_avro` distributes
decode over the ``binaryFile`` source.  Measured on a 4-column
400k-row frame at local[8]: write 128k rows/s (~1.8× the native
parquet writer's wall time), read 1.9 s — a serviceable fallback, not
a parquet replacement.  On a real cluster with the
spark-avro package available, prefer :func:`io.write` — this module is
the spec-parity path that keeps the avro surface exercised where the
DataSource cannot be installed, and files are interchangeable between
the two.
"""
from __future__ import annotations

import hashlib
import io as _io
import json
import os
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

_PRIMITIVE = {
    T.LongType: "long",
    T.IntegerType: "int",
    T.DoubleType: "double",
    T.FloatType: "float",
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.BinaryType: "bytes",
}


# ------------------------------------------------------------ encoding

def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def enc_long(n: int) -> bytes:
    return _enc_varint(_zigzag(int(n)))


def enc_bytes(b: bytes) -> bytes:
    return enc_long(len(b)) + b


def enc_str(s: str) -> bytes:
    return enc_bytes(s.encode("utf-8"))


def _dec_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return acc, pos
        shift += 7


def dec_long(buf: memoryview, pos: int) -> tuple[int, int]:
    n, pos = _dec_varint(buf, pos)
    return _unzigzag(n), pos


# ---------------------------------------------------- schema translation

def _spark_type_to_avro(dt: T.DataType, name: str, top: bool) -> object:
    """Recursive Spark → Avro type translation.  Structs become named
    records, arrays become avro arrays, string-keyed maps become avro
    maps; nullability at any level becomes a ``["null", T]`` union.
    Timestamp/date stay top-level-only: their exact encoding rides the
    Arrow column casts in :func:`_arrow_cols_to_avro`, which have no
    equivalent once the value is inside a ``to_pylist`` composite."""
    cls = type(dt)
    if cls in _PRIMITIVE:
        return _PRIMITIVE[cls]
    if cls is T.DecimalType:
        # avro decimal: bytes carrying the big-endian two's-complement
        # unscaled integer (exact at any precision, nestable — the
        # encoder consumes decimal.Decimal values directly)
        return {"type": "bytes", "logicalType": "decimal",
                "precision": dt.precision, "scale": dt.scale}
    if cls is T.TimestampType:
        if not top:
            raise TypeError("avro_io supports timestamp columns at the "
                            "top level only (nested timestamps lose the "
                            "exact-micros arrow cast)")
        return {"type": "long", "logicalType": "timestamp-micros"}
    if cls is T.DateType:
        if not top:
            raise TypeError("avro_io supports date columns at the top "
                            "level only")
        return {"type": "int", "logicalType": "date"}
    if cls is T.StructType:
        fields = []
        for f in dt.fields:
            at = _spark_type_to_avro(f.dataType, f"{name}_{f.name}", False)
            fields.append({"name": f.name,
                           "type": ["null", at] if f.nullable else at})
        return {"type": "record", "name": name, "fields": fields}
    if cls is T.ArrayType:
        it = _spark_type_to_avro(dt.elementType, name + "_item", False)
        return {"type": "array",
                "items": ["null", it] if dt.containsNull else it}
    if cls is T.MapType:
        if type(dt.keyType) is not T.StringType:
            raise TypeError("avro maps require string keys; got "
                            f"{dt.keyType}")
        vt = _spark_type_to_avro(dt.valueType, name + "_value", False)
        return {"type": "map",
                "values": ["null", vt] if dt.valueContainsNull else vt}
    raise TypeError(f"avro_io cannot encode {dt}")


def spark_to_avro_schema(schema: T.StructType, name: str = "record") -> dict:
    """Translate a Spark schema to an Avro record schema dict:
    primitives, timestamp/date logical types (top level), and nested
    struct / array / string-keyed map columns (mirroring the
    reference's nested writers — its map / sequence / join samplers
    emit exactly these shapes).  Nullable columns become
    ``["null", T]`` unions."""
    fields = []
    for f in schema.fields:
        at = _spark_type_to_avro(f.dataType, f"{name}_{f.name}", True)
        fields.append({"name": f.name,
                       "type": ["null", at] if f.nullable else at})
    return {"type": "record", "name": name, "fields": fields}


_BACK = {v: k for k, v in _PRIMITIVE.items()}


def _union_branch(at: list):
    """Validate a union as the nullable form this codec supports and
    return ``(non_null_branch, null_index)`` (``null_index`` is -1 when
    the union has no null branch, i.e. the degenerate ``[T]`` form).

    The Avro spec allows arbitrary N-branch unions; mapping one onto a
    single Spark column type is only well-defined for ``["null", T]`` /
    ``[T, "null"]`` / ``[T]``.  Anything wider used to decode every
    non-null branch as the FIRST non-null type — silently wrong values
    on spec-compliant foreign files — so it now fails loudly instead.
    """
    non_null = [t for t in at if t != "null"]
    if len(at) > 2 or len(non_null) != 1:
        raise TypeError(
            "unsupported avro union (only a nullable 2-branch union "
            f"maps to one Spark type): {at!r}")
    return non_null[0], (at.index("null") if "null" in at else -1)


def _avro_type_to_spark(at, names: dict | None = None, ns: str = "",
                        _stack: frozenset = frozenset()
                        ) -> tuple[T.DataType, bool]:
    if names is None:
        names = {}
    nullable = isinstance(at, list)
    if nullable:
        at, _ = _union_branch(at)
    if isinstance(at, str):
        if at in _BACK:
            return _BACK[at](), nullable
        target, full = _resolve_named(at, names, ns)
        if target is not None:   # named-type reference
            if full in _stack:
                # a RECURSIVE record decodes fine (container codec is
                # lazy) but has no finite Spark schema
                raise TypeError(
                    f"recursive avro type {at!r} cannot map to a "
                    "Spark schema")
            dt, _ = _avro_type_to_spark(target, names, _ns_of(full),
                                        _stack | {full})
            return dt, nullable
        raise TypeError(f"unsupported avro type: {at!r}")
    if isinstance(at, dict) and at.get("type") in ("record", "enum",
                                                   "fixed"):
        ns = _register_named(at, names, ns)
        nm = at.get("name")
        if nm:
            _stack = _stack | {f"{ns}.{nm}" if ns else nm}
    lt = at.get("logicalType")
    if lt == "timestamp-micros":
        return T.TimestampType(), nullable
    if lt == "date":
        return T.DateType(), nullable
    if lt == "decimal":
        return T.DecimalType(at["precision"], at["scale"]), nullable
    t = at["type"]
    if t == "record":
        fields = []
        for f in at["fields"]:
            fdt, fn = _avro_type_to_spark(f["type"], names, ns, _stack)
            fields.append(T.StructField(f["name"], fdt, fn))
        return T.StructType(fields), nullable
    if t == "array":
        et, en = _avro_type_to_spark(at["items"], names, ns, _stack)
        return T.ArrayType(et, en), nullable
    if t == "map":
        vt, vn = _avro_type_to_spark(at["values"], names, ns, _stack)
        return T.MapType(T.StringType(), vt, vn), nullable
    if t == "enum":      # symbol name as a plain string column
        return T.StringType(), nullable
    if t == "fixed":     # fixed-width opaque bytes
        return T.BinaryType(), nullable
    if t in _BACK:  # unknown logical type over a primitive: raw value
        return _BACK[t](), nullable
    raise TypeError(f"unsupported avro field type: {at!r}")


def avro_to_spark_schema(avro: dict) -> T.StructType:
    names: dict = {}
    ns = _register_named(avro, names)
    out = []
    for f in avro["fields"]:
        dt, nullable = _avro_type_to_spark(f["type"], names, ns)
        out.append(T.StructField(f["name"], dt, nullable))
    return T.StructType(out)


# ------------------------------------------------------- container file

def _sync_marker(seed: str) -> bytes:
    # spec wants 16 bytes unique-ish per file; deterministic for replay
    return hashlib.md5(("sync:" + seed).encode()).digest()


_ENC_PRIM = {
    "long": lambda v: enc_long(v),
    "int": lambda v: enc_long(v),
    "double": lambda v: struct.pack("<d", float(v)),
    "float": lambda v: struct.pack("<f", float(v)),
    "string": lambda v: enc_str(v),
    "bytes": lambda v: enc_bytes(bytes(v)),
    "boolean": lambda v: b"\x01" if v else b"\x00",
    # bare "null" primitive: zero bytes on the wire (spec) — legal as
    # a field type, not just inside unions
    "null": lambda v: b"",
}


def _register_named(at: dict, names: dict, ns: str = "") -> str:
    """Record a named type (record/enum/fixed) under its FULL name —
    the declared namespace, else the inherited enclosing one — and
    return the effective namespace for the type's children (spec name
    resolution: nested definitions inherit the enclosing namespace
    unless they declare their own)."""
    nm = at.get("name")
    eff = at.get("namespace", ns)
    if nm:
        names[f"{eff}.{nm}" if eff else nm] = at
    return eff


def _resolve_named(at: str, names: dict, ns: str):
    """Resolve a named-type reference per the spec: a dotted name is
    absolute; a bare name resolves against the enclosing namespace
    first, then the null namespace.  Returns ``(target, fullname)`` —
    the fullname's namespace component is the namespace the TARGET was
    declared under, which (per the spec) is what its own children
    resolve against, regardless of where the reference appears."""
    if "." not in at:
        if ns and f"{ns}.{at}" in names:
            at = f"{ns}.{at}"
    t = names.get(at)
    if t is None:
        return None, None
    return t, at


def _ns_of(full: str) -> str:
    return full.rsplit(".", 1)[0] if "." in full else ""


def _named_ref(target: dict, names: dict, target_ns: str, compile_fn):
    """Lazy codec for a named-type REFERENCE: resolution is deferred
    to first use so self-referential records (linked lists, trees —
    legal in the spec when the recursion is union-guarded) compile
    without infinite regress.  ``target_ns`` is the namespace of the
    target's DECLARED fullname (not the reference site's) so bare refs
    inside a cross-namespace target resolve in the target's namespace,
    as Java does."""
    cell: dict = {}

    def ref(*args):
        if "fn" not in cell:
            cell["fn"] = compile_fn(target, names, target_ns)
        return cell["fn"](*args)
    return ref


def _make_encoder(at, names: dict | None = None, ns: str = ""):
    """Compile an avro type (possibly nested) into ``fn(value) ->
    bytes``.  Compiled once per schema, so the per-value hot loop pays
    no type dispatch; unions write the computed branch index (the spec
    permits ``[T, "null"]`` as well as ``["null", T]``); named types
    register in ``names`` as defined and may be referenced by name
    afterwards."""
    if names is None:
        names = {}
    if isinstance(at, list):
        branch, nb = _union_branch(at)
        inner = _make_encoder(branch, names, ns)
        if nb < 0:  # degenerate [T] union: no null branch to select
            vb_b = enc_long(0)
            return lambda v: vb_b + inner(v)
        nb_b, vb_b = enc_long(nb), enc_long(1 - nb)

        def enc_union(v):
            return nb_b if v is None else vb_b + inner(v)
        return enc_union
    if isinstance(at, dict):
        t = at["type"]
        if t in ("record", "enum", "fixed"):
            ns = _register_named(at, names, ns)
        if t == "record":
            fencs = [(f["name"], _make_encoder(f["type"], names, ns))
                     for f in at["fields"]]

            def enc_record(v):
                return b"".join(fe(v[n]) for n, fe in fencs)
            return enc_record
        if t == "array":
            ie = _make_encoder(at["items"], names, ns)

            def enc_array(v):
                if v:
                    return (enc_long(len(v)) +
                            b"".join(ie(x) for x in v) + b"\x00")
                return b"\x00"
            return enc_array
        if t == "map":
            ve = _make_encoder(at["values"], names, ns)

            def enc_map(v):
                if v:
                    return (enc_long(len(v)) +
                            b"".join(enc_str(k) + ve(x)
                                     for k, x in v.items()) + b"\x00")
                return b"\x00"
            return enc_map
        if t == "enum":
            # spec: an enum is written as the zigzag-long INDEX of the
            # symbol; values arrive as the symbol string
            idx = {sym: i for i, sym in enumerate(at["symbols"])}

            def enc_enum(v):
                return enc_long(idx[v])
            return enc_enum
        if t == "fixed" and at.get("logicalType") != "decimal":
            size = at["size"]

            def enc_fixed(v):
                b = bytes(v)
                if len(b) != size:
                    raise ValueError(
                        f"fixed({size}) value has {len(b)} bytes")
                return b
            return enc_fixed
        if at.get("logicalType") == "decimal":
            s = at["scale"]
            if t == "fixed":
                # decimal-over-fixed: unscaled two's-complement int in
                # EXACTLY size bytes, no length prefix
                size = at["size"]

                def enc_decimal_fixed(v):
                    import decimal
                    with decimal.localcontext() as ctx:
                        ctx.prec = len(v.as_tuple().digits) + abs(s) + 2
                        unscaled = int(v.scaleb(s))
                    return unscaled.to_bytes(size, "big", signed=True)
                return enc_decimal_fixed

            def enc_decimal(v):
                # exact at ANY precision: scaleb under the ambient
                # decimal context (prec=28) silently ROUNDS values with
                # more than 28 significant digits (Spark decimals go to
                # 38), so the shift runs under a context wide enough to
                # hold every digit; int() then truncates-toward-zero any
                # fraction deeper than the schema scale, as before
                import decimal
                with decimal.localcontext() as ctx:
                    ctx.prec = len(v.as_tuple().digits) + abs(s) + 2
                    unscaled = int(v.scaleb(s))
                return enc_bytes(unscaled.to_bytes(
                    unscaled.bit_length() // 8 + 1, "big", signed=True))
            return enc_decimal
        return _ENC_PRIM[t]  # logical-type wrapper over a primitive
    if at in _ENC_PRIM:
        return _ENC_PRIM[at]
    target, full = _resolve_named(at, names, ns)
    if target is not None:  # reference to a defined named type
        return _named_ref(target, names, _ns_of(full), _make_encoder)
    raise TypeError(f"unsupported avro type: {at!r}")


def _dec_str(buf, pos):
    ln, pos = dec_long(buf, pos)
    return bytes(buf[pos:pos + ln]).decode(), pos + ln


def _dec_bytes(buf, pos):
    ln, pos = dec_long(buf, pos)
    return bytes(buf[pos:pos + ln]), pos + ln


_DEC_PRIM = {
    "long": dec_long,
    "int": dec_long,
    "double": lambda buf, pos: (struct.unpack("<d", buf[pos:pos + 8])[0],
                                pos + 8),
    "float": lambda buf, pos: (struct.unpack("<f", buf[pos:pos + 4])[0],
                               pos + 4),
    "boolean": lambda buf, pos: (buf[pos] == 1, pos + 1),
    "string": _dec_str,
    "bytes": _dec_bytes,
    "null": lambda buf, pos: (None, pos),
}


def _make_decoder(at, names: dict | None = None, ns: str = ""):
    """Compile an avro type into ``fn(buf, pos) -> (value, pos)``.
    Array/map blocks honour the spec's negative-count form (abs count
    followed by a byte size); named types register in ``names`` as
    defined and may be referenced by name afterwards."""
    if names is None:
        names = {}
    if isinstance(at, list):
        branch, nb = _union_branch(at)
        inner = _make_decoder(branch, names, ns)

        def dec_union(buf, pos):
            br, pos = dec_long(buf, pos)
            if br == nb:
                return None, pos
            return inner(buf, pos)
        return dec_union
    if isinstance(at, dict):
        t = at["type"]
        if t in ("record", "enum", "fixed"):
            ns = _register_named(at, names, ns)
        if t == "record":
            fdecs = [(f["name"], _make_decoder(f["type"], names, ns))
                     for f in at["fields"]]

            def dec_record(buf, pos):
                row = {}
                for n, fd in fdecs:
                    row[n], pos = fd(buf, pos)
                return row, pos
            return dec_record
        if t == "array":
            idec = _make_decoder(at["items"], names, ns)

            def dec_array(buf, pos):
                out = []
                while True:
                    cnt, pos = dec_long(buf, pos)
                    if cnt == 0:
                        return out, pos
                    if cnt < 0:
                        cnt = -cnt
                        _, pos = dec_long(buf, pos)
                    for _ in range(cnt):
                        v, pos = idec(buf, pos)
                        out.append(v)
            return dec_array
        if t == "map":
            vdec = _make_decoder(at["values"], names, ns)

            def dec_map(buf, pos):
                out = {}
                while True:
                    cnt, pos = dec_long(buf, pos)
                    if cnt == 0:
                        return out, pos
                    if cnt < 0:
                        cnt = -cnt
                        _, pos = dec_long(buf, pos)
                    for _ in range(cnt):
                        k, pos = _dec_str(buf, pos)
                        out[k], pos = vdec(buf, pos)
            return dec_map
        if t == "enum":
            syms = at["symbols"]

            def dec_enum(buf, pos):
                i, pos = dec_long(buf, pos)
                return syms[i], pos
            return dec_enum
        if t == "fixed" and at.get("logicalType") != "decimal":
            size = at["size"]

            def dec_fixed(buf, pos):
                return bytes(buf[pos:pos + size]), pos + size
            return dec_fixed
        if at.get("logicalType") == "decimal":
            s = at["scale"]
            if t == "fixed":
                size = at["size"]

                def dec_decimal_fixed(buf, pos):
                    import decimal
                    unscaled = int.from_bytes(buf[pos:pos + size],
                                              "big", signed=True)
                    with decimal.localcontext() as ctx:
                        ctx.prec = len(str(abs(unscaled))) + abs(s) + 2
                        return (decimal.Decimal(unscaled).scaleb(-s),
                                pos + size)
                return dec_decimal_fixed

            def dec_decimal(buf, pos):
                # the Decimal(int) constructor is context-exempt but
                # .scaleb is an OPERATION — rounded to the ambient
                # prec=28; widen the context so >28-digit unscaled
                # values (Spark precision up to 38) survive exactly
                import decimal
                raw, pos = _dec_bytes(buf, pos)
                unscaled = int.from_bytes(raw, "big", signed=True)
                with decimal.localcontext() as ctx:
                    ctx.prec = len(str(abs(unscaled))) + abs(s) + 2
                    return decimal.Decimal(unscaled).scaleb(-s), pos
            return dec_decimal
        return _DEC_PRIM[t]
    if at in _DEC_PRIM:
        return _DEC_PRIM[at]
    target, full = _resolve_named(at, names, ns)
    if target is not None:  # reference to a defined named type
        return _named_ref(target, names, _ns_of(full), _make_decoder)
    raise TypeError(f"unsupported avro type: {at!r}")


# ------------------------------------------------ schema resolution
#
# The spec's "Schema Resolution" rules (reader schema != writer
# schema): records match fields by name (reader aliases honoured),
# writer-only fields are decoded and discarded, reader-only fields
# take their declared default; enums map writer symbols onto reader
# symbols with the reader's enum ``default`` as the fallback;
# primitives promote int→long/float/double, long→float/double,
# float→double, string↔bytes; arrays/maps resolve element-wise; fixed
# requires matching size and name.  This is what lets a consumer
# evolve its schema (add a column with a default, widen an int,
# rename via aliases) and still read every historical file — the
# contract any long-lived 100 TB archive depends on.

_PROMOTE = {
    ("int", "long"): None, ("int", "float"): float,
    ("int", "double"): float, ("long", "float"): float,
    ("long", "double"): float, ("float", "double"): None,
    ("string", "bytes"): lambda v: v.encode("utf-8"),
    ("bytes", "string"): lambda v: v.decode("utf-8"),
}


def _effective(at, names, ns):
    """(resolved type, effective ns): follows named references and
    unwraps nothing else."""
    if isinstance(at, str) and at != "null" and at not in _DEC_PRIM:
        target, full = _resolve_named(at, names, ns)
        if target is None:
            raise TypeError(f"unsupported avro type: {at!r}")
        return target, _ns_of(full)
    return at, ns


def _names_match(w: dict, r: dict, wns: str, rns: str) -> bool:
    """Spec name matching for named types: unqualified names equal, or
    the reader declares the writer's name (full or unqualified) as an
    alias."""
    wn, rn = w.get("name"), r.get("name")
    if wn == rn:
        return True
    wfull = f"{w.get('namespace', wns)}.{wn}" if w.get("namespace", wns) else wn
    return wn in r.get("aliases", []) or wfull in r.get("aliases", [])


def _json_default(rt, names, ns, dflt, path):
    """A reader field's JSON ``default`` → the decoded-value model."""
    rt, ns = _effective(rt, names, ns)
    if isinstance(rt, list):  # default applies to the FIRST branch
        return _json_default(rt[0], names, ns, dflt, path)
    t = rt["type"] if isinstance(rt, dict) else rt
    if isinstance(rt, dict) and rt.get("logicalType") == "decimal":
        import decimal
        unscaled = int.from_bytes(dflt.encode("latin-1"), "big",
                                  signed=True) if dflt else 0
        with decimal.localcontext() as ctx:
            ctx.prec = len(str(abs(unscaled))) + abs(rt["scale"]) + 2
            return decimal.Decimal(unscaled).scaleb(-rt["scale"])
    if t == "null":
        return None
    if t == "boolean":
        return bool(dflt)
    if t in ("int", "long"):
        return int(dflt)
    if t in ("float", "double"):
        return float(dflt)
    if t == "string" or t == "enum":
        return dflt
    if t in ("bytes", "fixed"):
        return dflt.encode("latin-1")
    if t == "array":
        return [_json_default(rt["items"], names, ns, v, path)
                for v in dflt]
    if t == "map":
        return {k: _json_default(rt["values"], names, ns, v, path)
                for k, v in dflt.items()}
    if t == "record":
        out = {}
        for f in rt["fields"]:
            if f["name"] in dflt:
                out[f["name"]] = _json_default(f["type"], names, ns,
                                               dflt[f["name"]], path)
            elif "default" in f:
                out[f["name"]] = _json_default(f["type"], names, ns,
                                               f["default"], path)
            else:
                raise TypeError(
                    f"record default at {path} missing field "
                    f"{f['name']!r} with no sub-default")
        return out
    raise TypeError(f"unsupported default for {rt!r} at {path}")


def _base_type(at):
    return at["type"] if isinstance(at, dict) else at


def _resolved_fullname(at, names, ns):
    """Fullname of a named type (reference or inline definition), else
    None — the memo key component for the resolved decoder's lazy
    recursion guard."""
    if isinstance(at, str) and at != "null" and at not in _DEC_PRIM:
        _, full = _resolve_named(at, names, ns)
        return full
    if isinstance(at, dict) and at.get("type") in ("record", "enum",
                                                   "fixed"):
        nm = at.get("name")
        eff = at.get("namespace", ns)
        return f"{eff}.{nm}" if eff else nm
    return None


def _make_resolved_decoder(wt, rt, wnames, rnames, wns="", rns="",
                           path="$", _cells=None):
    """Compile (writer type, reader type) → ``fn(buf, pos) →
    (reader-shaped value, pos)`` per the spec's resolution rules.
    Raises TypeError at COMPILE time for unresolvable pairs (the spec
    calls these errors), so a bad evolution fails before any data is
    touched.

    Named writer/reader pairs compile through a lazy memo cell keyed
    on (writer fullname, reader fullname) — the resolved-path
    counterpart of ``_named_ref``'s deferred cell — so a spec-legal
    RECURSIVE record (linked list, tree; recursion union-guarded)
    resolves in one pass instead of re-entering ``_effective``
    eagerly until RecursionError (r11 ADVICE fix)."""
    if _cells is None:
        _cells = {}
    wkey = _resolved_fullname(wt, wnames, wns)
    rkey = _resolved_fullname(rt, rnames, rns)
    if wkey is not None and rkey is not None:
        cell = _cells.get((wkey, rkey))
        if cell is not None:          # in progress or finished: defer

            def ref(buf, pos):
                return cell["fn"](buf, pos)
            return ref
        _cells[(wkey, rkey)] = cell = {}

        def _finish(fn):
            cell["fn"] = fn
            return fn
    else:
        def _finish(fn):
            return fn

    wt, wns = _effective(wt, wnames, wns)
    rt, rns = _effective(rt, rnames, rns)

    if isinstance(wt, list):
        branch, nb = _union_branch(wt)
        r_nullable = isinstance(rt, list)
        rbranch = _union_branch(rt)[0] if r_nullable else rt
        inner = _make_resolved_decoder(branch, rbranch, wnames, rnames,
                                       wns, rns, path, _cells)

        def dec_union(buf, pos):
            br, pos = dec_long(buf, pos)
            if br == nb:
                if not r_nullable:
                    raise TypeError(
                        f"null written at {path} but reader type is "
                        "not nullable")
                return None, pos
            return inner(buf, pos)
        return _finish(dec_union)
    if isinstance(rt, list):  # writer non-union, reader nullable
        if _base_type(wt) == "null":
            # spec: writer null resolves against the reader union's
            # null branch (r11 ADVICE fix — picking only the non-null
            # branch made this spec-legal pair a compile error)
            if "null" not in rt:
                raise TypeError(
                    f"writer null at {path} but reader union has no "
                    "null branch")

            def dec_wnull(buf, pos):
                return None, pos
            return _finish(dec_wnull)
        rbranch, _ = _union_branch(rt)
        return _finish(_make_resolved_decoder(wt, rbranch, wnames,
                                              rnames, wns, rns, path,
                                              _cells))

    wb, rb = _base_type(wt), _base_type(rt)
    wlog = wt.get("logicalType") if isinstance(wt, dict) else None
    rlog = rt.get("logicalType") if isinstance(rt, dict) else None
    if wlog == "decimal" or rlog == "decimal":
        if (wlog != rlog or wt.get("precision") != rt.get("precision")
                or wt.get("scale") != rt.get("scale")):
            raise TypeError(f"decimal mismatch at {path}: "
                            f"{wt!r} vs {rt!r}")
        return _finish(_make_decoder(wt, wnames, wns))

    if wb == rb and wb in ("record", "enum", "fixed"):
        if not _names_match(wt, rt, wns, rns):
            raise TypeError(
                f"named-type mismatch at {path}: writer "
                f"{wt.get('name')!r} vs reader {rt.get('name')!r} "
                "(no alias)")
        _register_named(wt, wnames, wns)
        _register_named(rt, rnames, rns)

    if wb == "record" and rb == "record":
        wns2 = wt.get("namespace", wns)
        rns2 = rt.get("namespace", rns)
        rfields = {f["name"]: f for f in rt["fields"]}
        # reader aliases: alias name → reader field
        for f in rt["fields"]:
            for a in f.get("aliases", []):
                rfields.setdefault(a, f)
        consumed = set()
        steps = []  # (reader_name | None, decoder)
        for f in wt["fields"]:
            rf = rfields.get(f["name"])
            if rf is not None and id(rf) not in consumed:
                consumed.add(id(rf))
                steps.append((rf["name"], _make_resolved_decoder(
                    f["type"], rf["type"], wnames, rnames, wns2, rns2,
                    f"{path}.{f['name']}", _cells)))
            else:  # writer-only: decode and discard
                steps.append((None, _make_decoder(f["type"], wnames,
                                                  wns2)))
        defaults = {}
        for f in rt["fields"]:
            if id(f) not in consumed:
                if "default" not in f:
                    raise TypeError(
                        f"reader field {path}.{f['name']} absent from "
                        "writer schema and has no default")
                defaults[f["name"]] = _json_default(
                    f["type"], rnames, rns2, f["default"],
                    f"{path}.{f['name']}")

        def dec_record(buf, pos):
            row = dict(defaults)
            for name, fd in steps:
                v, pos = fd(buf, pos)
                if name is not None:
                    row[name] = v
            return row, pos
        return _finish(dec_record)
    if wb == "enum" and rb == "enum":
        rsyms = set(rt["symbols"])
        rdef = rt.get("default")
        table = []
        for s in wt["symbols"]:
            if s in rsyms:
                table.append(s)
            elif rdef is not None:
                table.append(rdef)
            else:
                table.append(None)  # error if actually written

        def dec_enum(buf, pos):
            i, pos = dec_long(buf, pos)
            s = table[i]
            if s is None:
                raise TypeError(
                    f"enum symbol {wt['symbols'][i]!r} at {path} not "
                    "in reader enum and reader declares no default")
            return s, pos
        return _finish(dec_enum)
    if wb == "fixed" and rb == "fixed":
        if wt["size"] != rt["size"]:
            raise TypeError(f"fixed size mismatch at {path}: "
                            f"{wt['size']} vs {rt['size']}")
        return _finish(_make_decoder(wt, wnames, wns))
    if wb == "array" and rb == "array":
        idec = _make_resolved_decoder(wt["items"], rt["items"], wnames,
                                      rnames, wns, rns, path + "[]",
                                      _cells)

        def dec_array(buf, pos):
            out = []
            while True:
                cnt, pos = dec_long(buf, pos)
                if cnt == 0:
                    return out, pos
                if cnt < 0:
                    cnt = -cnt
                    _, pos = dec_long(buf, pos)
                for _ in range(cnt):
                    v, pos = idec(buf, pos)
                    out.append(v)
        return _finish(dec_array)
    if wb == "map" and rb == "map":
        vdec = _make_resolved_decoder(wt["values"], rt["values"],
                                      wnames, rnames, wns, rns,
                                      path + "{}", _cells)

        def dec_map(buf, pos):
            out = {}
            while True:
                cnt, pos = dec_long(buf, pos)
                if cnt == 0:
                    return out, pos
                if cnt < 0:
                    cnt = -cnt
                    _, pos = dec_long(buf, pos)
                for _ in range(cnt):
                    k, pos = _dec_str(buf, pos)
                    out[k], pos = vdec(buf, pos)
        return _finish(dec_map)
    if wb == rb and wb in _DEC_PRIM:
        return _finish(_make_decoder(wt, wnames, wns))
    conv = _PROMOTE.get((wb, rb), "missing")
    if conv != "missing":
        base = _make_decoder(wt, wnames, wns)
        if conv is None:
            return _finish(base)

        def dec_promoted(buf, pos):
            v, pos = base(buf, pos)
            return conv(v), pos
        return _finish(dec_promoted)
    raise TypeError(
        f"cannot resolve writer {wb!r} against reader {rb!r} at {path}")


def write_container(fh, avro_schema: dict, row_lists: list[list],
                    sync_seed: str, block_records: int = 4096,
                    codec: str = "null") -> int:
    """Write one Avro container file: ``row_lists`` is a list of
    per-FIELD value lists (column-major, already avro-typed: ints for
    long/int/timestamp-micros/date, None for nulls).  ``codec`` is
    ``"null"`` or ``"deflate"`` (raw RFC-1951 stream per the spec —
    no zlib header/checksum)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = _sync_marker(sync_seed)
    fh.write(MAGIC)
    meta = {"avro.schema": json.dumps(avro_schema).encode(),
            "avro.codec": codec.encode()}
    fh.write(enc_long(len(meta)))
    for k, v in meta.items():
        fh.write(enc_str(k))
        fh.write(enc_bytes(v))
    fh.write(enc_long(0))
    fh.write(sync)

    enc_names: dict = {}
    top_ns = _register_named(avro_schema, enc_names)
    fencs = [(f["name"],
              isinstance(f["type"], list) or f["type"] == "null",
              _make_encoder(f["type"], enc_names, top_ns))
             for f in avro_schema["fields"]]
    n = len(row_lists[0]) if row_lists else 0
    total = 0
    for start in range(0, n, block_records):
        stop = min(start + block_records, n)
        parts = []
        for i in range(start, stop):
            for (name, nullable, fe), col in zip(fencs, row_lists):
                v = col[i]
                if v is None and not nullable:
                    raise ValueError(f"null in non-nullable field {name}")
                parts.append(fe(v))
        payload = b"".join(parts)
        if codec == "deflate":
            import zlib
            c = zlib.compressobj(6, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        fh.write(enc_long(stop - start))
        fh.write(enc_long(len(payload)))
        fh.write(payload)
        fh.write(sync)
        total += stop - start
    return total


def read_container(data: bytes,
                   reader_schema: dict | None = None
                   ) -> tuple[dict, list[dict]]:
    """Decode one container file → (avro schema dict, list of row
    dicts with avro-typed values).

    ``reader_schema``: decode under the spec's Schema Resolution rules
    instead of the file's writer schema — added fields take their
    defaults, removed fields are skipped, renamed fields resolve via
    reader aliases, promotable primitives widen, enum gaps fall to the
    reader's enum default (see :func:`_make_resolved_decoder`).  Rows
    come back reader-shaped; the returned schema dict is still the
    WRITER's (what the file physically carries)."""
    buf = memoryview(data)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an avro container file")
    pos = 4
    meta = {}
    while True:
        cnt, pos = dec_long(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:  # negative-count map block: abs count + byte size
            cnt = -cnt
            _, pos = dec_long(buf, pos)
        for _ in range(cnt):
            klen, pos = dec_long(buf, pos)
            key = bytes(buf[pos:pos + klen]).decode()
            pos += klen
            vlen, pos = dec_long(buf, pos)
            meta[key] = bytes(buf[pos:pos + vlen])
            pos += vlen
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"", b"deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = bytes(buf[pos:pos + 16])
    pos += 16

    dec_names: dict = {}
    top_ns = _register_named(schema, dec_names)
    if reader_schema is not None:
        rnames: dict = {}
        rns = _register_named(reader_schema, rnames)
        rdec = _make_resolved_decoder(schema, reader_schema, dec_names,
                                      rnames, top_ns, rns)
        fdecs = None
    else:
        fdecs = [(f["name"], _make_decoder(f["type"], dec_names,
                                           top_ns))
                 for f in schema["fields"]]
    rows = []
    end = len(buf)
    while pos < end:
        cnt, pos = dec_long(buf, pos)
        blen, pos = dec_long(buf, pos)
        block = buf[pos:pos + blen]
        pos += blen
        if codec == b"deflate":
            import zlib
            # spec: raw RFC-1951 stream, no zlib header/checksum
            block = memoryview(zlib.decompress(bytes(block), -15))
        bpos = 0
        for _ in range(cnt):
            if fdecs is None:
                row, bpos = rdec(block, bpos)
            else:
                row = {}
                for name, fd in fdecs:
                    row[name], bpos = fd(block, bpos)
            rows.append(row)
        if bytes(buf[pos:pos + 16]) != sync:
            raise ValueError("sync marker mismatch")
        pos += 16
    return schema, rows


# --------------------------------------------------------- spark plumbing

def _needs_map_fix(dt: T.DataType) -> bool:
    if isinstance(dt, T.MapType):
        return True
    if isinstance(dt, T.ArrayType):
        return _needs_map_fix(dt.elementType)
    if isinstance(dt, T.StructType):
        return any(_needs_map_fix(f.dataType) for f in dt.fields)
    return False


def _map_fixer(dt: T.DataType):
    """Arrow ``to_pylist`` renders map values as ``[(k, v), ...]`` at
    every nesting level; the avro encoder wants dicts.  Compile a
    recursive fixer for the type shape once per column."""
    if isinstance(dt, T.MapType):
        vf = _map_fixer(dt.valueType)
        return lambda v: None if v is None else {k: vf(x) for k, x in v}
    if isinstance(dt, T.ArrayType):
        ef = _map_fixer(dt.elementType)
        return lambda v: None if v is None else [ef(x) for x in v]
    if isinstance(dt, T.StructType):
        ffs = [(f.name, _map_fixer(f.dataType)) for f in dt.fields]
        return (lambda v: None if v is None
                else {n: ff(v[n]) for n, ff in ffs})
    return lambda v: v


def _arrow_cols_to_avro(batch, names, types, tz: str):
    """Arrow RecordBatch → column-major avro-typed value lists.

    Values are read from the Arrow arrays directly, never through a
    pandas coercion: nullable int64 columns stay exact (a pandas
    round-trip coerces them to float64, silently rounding |v| > 2^53),
    and timestamps come out as true epoch micros via the int64 cast of
    the tz-aware arrow array (Spark stamps the session timezone on the
    arrow field; the underlying representation is UTC micros, so this
    is zone-correct even in a non-UTC session).  ``tz`` covers the
    defensive tz-naive case only.  Struct/array/map columns come out
    of ``to_pylist`` as dicts/lists (maps as tuple lists, fixed up)."""
    import pyarrow as pa
    cols = []
    for name, dt in zip(names, types):
        idx = batch.schema.get_field_index(name)
        col = batch.column(idx)
        if isinstance(dt, T.TimestampType):
            if col.type.tz is None:
                # wall-clock micros: interpret in the session timezone
                col = col.cast(pa.timestamp("us")) \
                         .cast(pa.timestamp("us", tz=tz))
            vals = col.cast(pa.int64()).to_pylist()
        elif isinstance(dt, T.DateType):
            vals = col.cast(pa.int32()).to_pylist()
        else:
            # to_pylist is exact and null-preserving for every arrow
            # primitive and composite
            vals = col.to_pylist()
            if _needs_map_fix(dt):
                fix = _map_fixer(dt)
                vals = [fix(v) for v in vals]
        cols.append(vals)
    return cols


def write_avro(df: DataFrame, path: str, name: str = "record",
               block_records: int = 4096, codec: str = "null") -> int:
    """Write ``df`` as a directory of Avro container files, one per
    partition, encoded inside ``mapInArrow`` (no driver gather).
    Returns the total row count written.  Requires a POSIX path
    reachable from the executors (local mode / shared filesystem); on
    a cluster with spark-avro installed, use :func:`io.write`."""
    avro = spark_to_avro_schema(df.schema, name=name)
    names = [f.name for f in df.schema.fields]
    types = [f.dataType for f in df.schema.fields]
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    os.makedirs(path, exist_ok=True)
    # overwrite semantics, matching the other CLI format branches:
    # stale part files from a previous (possibly wider) run would
    # otherwise be silently mixed into read_avro results
    for old in os.listdir(path):
        if old.endswith(".avro"):
            os.unlink(os.path.join(path, old))

    def part(batches):
        import pyarrow as pa
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.avro")
        cols = [[] for _ in names]
        for batch in batches:
            for acc, vals in zip(cols,
                                 _arrow_cols_to_avro(batch, names,
                                                     types, tz)):
                acc.extend(vals)
        n = 0
        if cols and cols[0]:
            with open(fname, "wb") as fh:
                n = write_container(fh, avro, cols, sync_seed=fname,
                                    block_records=block_records,
                                    codec=codec)
        yield pa.RecordBatch.from_pydict({"file": [fname], "n": [n]})

    stats = df.mapInArrow(part, "file string, n long").collect()
    return int(sum(r.n for r in stats))


def read_avro(spark: SparkSession, path: str,
              reader_schema: dict | None = None) -> DataFrame:
    """Read a directory (or glob) of Avro container files written by
    any spec-compliant implementation (primitive, nullable-union,
    record/array/map, and timestamp-micros/date logical types).
    Decode is distributed over the ``binaryFile`` source; the schema
    comes from the first file's embedded header.

    ``reader_schema`` applies the spec's Schema Resolution rules
    per file (see :func:`read_container`) — the schema-evolution
    read: a directory holding files written under SEVERAL historical
    schema versions comes back as ONE DataFrame in the reader's
    shape, each file resolved against its own embedded writer schema
    on the executor that decodes it."""
    # pathGlobFilter, not a glob-in-path: Spark tries the literal path
    # first and logs a FileNotFoundException before falling back
    bf = (spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.avro").load(path))
    head = bf.select("content").limit(1).collect()
    if not head:
        raise ValueError(f"no avro files under {path}")
    if reader_schema is not None:
        avro = reader_schema
    else:
        avro, _ = read_container(bytes(head[0].content))
    sschema = avro_to_spark_schema(avro)
    tz = spark.conf.get("spark.sql.session.timeZone")

    # avro type → arrow type, declared explicitly so nullable integer
    # columns round-trip exact (a pandas DataFrame would coerce an
    # [int, None] list to float64, rounding |v| > 2^53)
    def _arrow_type(at):
        import pyarrow as pa
        if isinstance(at, list):
            at = [t for t in at if t != "null"][0]
        if isinstance(at, dict):
            lt = at.get("logicalType")
            if lt == "timestamp-micros":
                return pa.timestamp("us", tz=tz)
            if lt == "date":
                return pa.date32()
            if lt == "decimal":
                return pa.decimal128(at["precision"], at["scale"])
            t = at["type"]
            if t == "record":
                return pa.struct([pa.field(f["name"],
                                           _arrow_type(f["type"]))
                                  for f in at["fields"]])
            if t == "array":
                return pa.list_(_arrow_type(at["items"]))
            if t == "map":
                return pa.map_(pa.string(), _arrow_type(at["values"]))
            at = t
        return {"long": pa.int64(), "int": pa.int32(),
                "double": pa.float64(), "float": pa.float32(),
                "string": pa.string(), "boolean": pa.bool_(),
                "bytes": pa.binary()}[at]

    def dec(batches):
        import pyarrow as pa
        for batch in batches:
            for content in batch.column(0).to_pylist():
                _, rows = read_container(bytes(content),
                                         reader_schema=reader_schema)
                arrays, names = [], []
                for f in avro["fields"]:
                    name = f["name"]
                    vals = [r[name] for r in rows]
                    atype = _arrow_type(f["type"])
                    if pa.types.is_timestamp(atype):
                        # avro micros are UTC epoch; an int64→timestamp
                        # cast on a tz-aware type reinterprets exactly
                        arr = pa.array(vals, pa.int64()).cast(atype)
                    elif pa.types.is_date32(atype):
                        arr = pa.array(vals, pa.int32()).cast(atype)
                    else:
                        arr = pa.array(vals, atype)
                    arrays.append(arr)
                    names.append(name)
                yield pa.RecordBatch.from_arrays(arrays, names)

    return bf.select("content").mapInArrow(dec, sschema)
