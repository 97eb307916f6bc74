"""Dual-backend expression values.

A :class:`D` carries the same scalar expression twice: as a PySpark
``Column`` (executed by Catalyst/Tungsten, JVM-side, codegen-friendly)
and as a DuckDB-compatible ANSI SQL string (used to build the
``oracle_sql()`` mirrors the driver replays).  Every sampler in this
engine is written once against this algebra, which is what makes
schema-driven synthetic generation *oracle checkable*: the Spark plan
and the DuckDB query compute bit-identical values because both sides
only use integer arithmetic, IEEE-754 double arithmetic in the same
order, and shared string builtins.

Only operations with identical semantics in both engines are exposed.
Notably:

- integer ``%`` is only used on non-negative operands,
- integer division is expressed as ``floor(a / b)`` and only applied to
  values < 2**52 so the double round-trip is exact,
- ``floor`` is cast back to BIGINT on the SQL side (DuckDB's floor
  returns DOUBLE, Spark's returns LONG),
- timestamps are never formatted through engine-local timezone logic;
  date strings are built arithmetically from epoch-day counts.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _sq(s: str) -> str:
    """Quote a python string as a SQL literal."""
    return "'" + s.replace("'", "''") + "'"


def _fmt_num(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        # repr() is shortest round-trip.  ALWAYS exponent notation on
        # the SQL side: DuckDB parses a bare `1.234` as DECIMAL and
        # converts — which can land 1 ulp away from the correctly
        # rounded double — while `1.234e0` parses directly as DOUBLE.
        r = repr(v)
        if "inf" in r or "nan" in r:
            return r
        if "e" not in r and "E" not in r:
            r += "e0"
        return r
    raise TypeError(f"not a number: {v!r}")


class D:
    """A dual (Spark Column, DuckDB SQL fragment) expression.

    The Spark side is lazy (a zero-arg thunk) so schemas — and the
    DuckDB oracle SQL — compile without an active SparkContext.
    """

    __slots__ = ("cf", "s", "_cc")

    def __init__(self, cf, s: str):
        self.cf = cf if callable(cf) else (lambda: cf)
        self.s = s
        self._cc = None

    @property
    def c(self) -> Column:
        # Memoized: a Column is an immutable JVM expression handle, and
        # samplers share subtrees heavily (cumulative chains, reused
        # draws).  Rebuilding per reference made plan construction
        # O(tree²) py4j round-trips — 12s of driver time for one
        # 16-element sequence schema.
        if self._cc is None:
            self._cc = self.cf()
        return self._cc

    # -- arithmetic ----------------------------------------------------
    def _bin(self, other: "D | int | float", op: str, fn) -> "D":
        o = lit(other) if not isinstance(other, D) else other
        return D(lambda: fn(self.c, o.c), f"({self.s} {op} {o.s})")

    def __add__(self, o):
        return self._bin(o, "+", lambda a, b: a + b)

    def __sub__(self, o):
        return self._bin(o, "-", lambda a, b: a - b)

    def __mul__(self, o):
        return self._bin(o, "*", lambda a, b: a * b)

    def __mod__(self, o):
        return self._bin(o, "%", lambda a, b: a % b)

    def __truediv__(self, o):
        # only used with a double operand → double division in both engines
        return self._bin(o, "/", lambda a, b: a / b)

    # -- comparisons (used by when-chains) -----------------------------
    def __lt__(self, o):
        return self._bin(o, "<", lambda a, b: a < b)

    def __le__(self, o):
        return self._bin(o, "<=", lambda a, b: a <= b)

    def __gt__(self, o):
        return self._bin(o, ">", lambda a, b: a > b)

    def __ge__(self, o):
        return self._bin(o, ">=", lambda a, b: a >= b)

    def eq(self, o):
        return self._bin(o, "=", lambda a, b: a == b)

    def xor(self, o: "D") -> "D":
        return D(lambda: self.c.bitwiseXOR(o.c), f"xor({self.s}, {o.s})")


def lit(v) -> D:
    if isinstance(v, D):
        return v
    if isinstance(v, str):
        return D(lambda: F.lit(v), _sq(v))
    return D(lambda: F.lit(v), _fmt_num(v))


def floor(d: D) -> D:
    """floor → BIGINT in both engines."""
    return D(lambda: F.floor(d.c), f"CAST(FLOOR({d.s}) AS BIGINT)")


def idiv(a: D, b: int) -> D:
    """Exact integer division for 0 <= a < 2**52."""
    if b > 1 and (b & (b - 1)) == 0:
        return shiftr(a, b.bit_length() - 1)
    return floor(a / float(b))


def band(a: D, mask: int) -> D:
    """Bitwise AND with a constant — replaces ``% 2**k`` on non-negative
    ints (identical result, no division)."""
    return D(lambda: a.c.bitwiseAND(F.lit(mask)), f"({a.s} & {mask})")


def shiftr(a: D, bits: int) -> D:
    """Arithmetic right shift — replaces ``// 2**bits`` for a >= 0."""
    return D(lambda: F.shiftright(a.c, bits), f"({a.s} >> {bits})")


def round_(d: D, n: int) -> D:
    return D(lambda: F.round(d.c, n), f"ROUND({d.s}, {n})")


def cast_long(d: D) -> D:
    return D(lambda: d.c.cast("long"), f"CAST({d.s} AS BIGINT)")


def cast_int(d: D) -> D:
    return D(lambda: d.c.cast("int"), f"CAST({d.s} AS INTEGER)")


def cast_double(d: D) -> D:
    return D(lambda: d.c.cast("double"), f"CAST({d.s} AS DOUBLE)")


def cast_string(d: D) -> D:
    return D(lambda: d.c.cast("string"), f"CAST({d.s} AS VARCHAR)")


def concat(*parts) -> D:
    ds = [lit(p) for p in parts]
    return D(lambda: F.concat(*[d.c for d in ds]), "CONCAT(" + ", ".join(d.s for d in ds) + ")")


def lpad(d: D, width: int, pad: str) -> D:
    return D(lambda: F.lpad(d.c.cast("string"), width, pad),
             f"LPAD(CAST({d.s} AS VARCHAR), {width}, {_sq(pad)})")


def least(items: list[D]) -> D:
    if len(items) == 1:
        return items[0]
    return D(lambda: F.least(*[d.c for d in items]),
             "LEAST(" + ", ".join(d.s for d in items) + ")")


def greatest(items: list[D]) -> D:
    if len(items) == 1:
        return items[0]
    return D(lambda: F.greatest(*[d.c for d in items]),
             "GREATEST(" + ", ".join(d.s for d in items) + ")")


def reverse(d: D) -> D:
    return D(lambda: F.reverse(d.c), f"REVERSE({d.s})")


def lower(d: D) -> D:
    return D(lambda: F.lower(d.c), f"LOWER({d.s})")


def upper(d: D) -> D:
    return D(lambda: F.upper(d.c), f"UPPER({d.s})")


def substr(d: D, start: int, length: int) -> D:
    return D(lambda: F.substring(d.c, start, length), f"SUBSTR({d.s}, {start}, {length})")


def length(d: D) -> D:
    return D(lambda: F.length(d.c), f"LENGTH({d.s})")


def md5(d: D) -> D:
    return D(lambda: F.md5(d.c), f"MD5({d.s})")


def _spark_sq(s: str) -> str:
    """Spark-SQL string literal (backslash escaping, unlike ANSI '')."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def element(idx0: D, values: list) -> D:
    """Pick ``values[idx0]`` (0-based index expr) from a python list.

    Spark: literal array + element_at (1-based).  DuckDB: list literal
    subscript (1-based).  The Spark literal is built as ONE parsed SQL
    string (``F.expr``): ``F.lit(big_list)`` costs a py4j round-trip
    per element — a 4096-entry lookup table would take seconds of
    driver time per reference, which dominated plan construction.
    """
    if not values:
        raise ValueError("empty value list")
    sql_items = ", ".join(_sq(v) if isinstance(v, str) else _fmt_num(v) for v in values)
    arr_sql = f"ARRAY[{sql_items}]"
    has_float = any(isinstance(v, float) for v in values)
    if has_float:
        # DuckDB infers DECIMAL[] from fixed-point literals; force DOUBLE[]
        # so downstream arithmetic matches Spark's double semantics
        arr_sql = f"CAST({arr_sql} AS DOUBLE[])"
    def _spark_item(v):
        if isinstance(v, str):
            return _spark_sq(v)
        if isinstance(v, bool):
            return _fmt_num(v)
        if isinstance(v, float):
            return _fmt_num(v) + "D"
        return _fmt_num(v) + "L"
    spark_items = ", ".join(_spark_item(v) for v in values)
    spark_arr = f"array({spark_items})"
    return D(lambda: F.element_at(F.expr(spark_arr), (idx0.c + 1).cast("int")),
             f"({arr_sql})[CAST(({idx0.s} + 1) AS BIGINT)]")


def when_chain(pairs: list[tuple[D, D]], otherwise: D) -> D:
    """CASE WHEN cond1 THEN v1 ... ELSE otherwise END."""
    def build():
        col = None
        for cond, val in pairs:
            col = F.when(cond.c, val.c) if col is None else col.when(cond.c, val.c)
        return otherwise.c if col is None else col.otherwise(otherwise.c)
    sql = "CASE " + " ".join(f"WHEN {c.s} THEN {v.s}" for c, v in pairs) + \
          f" ELSE {otherwise.s} END"
    return D(build, sql)


def date_from_days(days: D) -> D:
    """Epoch-day count → DATE, timezone-free in both engines."""
    return D(lambda: F.date_add(F.to_date(F.lit("1970-01-01")), days.c.cast("int")),
             f"(DATE '1970-01-01' + CAST({days.s} AS INTEGER))")


def array(items: list[D]) -> D:
    return D(lambda: F.array(*[d.c for d in items]),
             "ARRAY[" + ", ".join(d.s for d in items) + "]")


_BIND_N = 0


def bind(val: D, fn) -> D:
    """Let-binding: evaluate ``val`` ONCE, then apply ``fn`` to it.

    Both engines lack a scalar ``let``; a 1-element-array transform is
    the portable equivalent (the lambda argument is materialized before
    the body runs).  Essential when ``fn`` references its argument many
    times and ``val`` is expensive (md5, big case chains): a plain D
    composition would textually duplicate — and re-evaluate — the
    subtree per reference.
    """
    global _BIND_N
    _BIND_N += 1
    var = f"__b{_BIND_N}"  # unique: nested binds must not shadow in SQL

    def cf():
        def lam(x):
            return fn(D(lambda: x, var)).c
        return F.element_at(F.transform(F.array(val.c), lam), 1)

    body_sql = fn(D(lambda: None, var)).s
    return D(cf, f"(list_transform([{val.s}], {var} -> {body_sql}))[1]")


def struct_(fields: dict[str, D]) -> D:
    return D(lambda: F.struct(*[d.c.alias(k) for k, d in fields.items()]),
             "struct_pack(" + ", ".join(f"{k} := {d.s}"
                                        for k, d in fields.items()) + ")")
