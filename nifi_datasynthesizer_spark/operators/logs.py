"""Web-log line formatting and parsing (anomaly-log ingestion).

Port of the parsing role of the reference's ``com/mapr/anomaly/
Event.java:37-80``: a log line ``[<iso-ts>] /<op>?user=<hex-uid>
<o1>.<o2>.<o3>.<o4>`` is parsed into a typed record
``(uid, time_ms, ip, op)`` — uid from hex (``Integer.parseInt(g, 16)``),
the ip packed into a SIGNED 32-bit int by octet shifts (Java ``<<``
overflow wraps), the timestamp into epoch millis.  The reference has no
matching formatter (Event.java ingests externally-produced logs), so
:func:`format_event_lines` renders the same format from the events
table — giving the round-trip ``parse(format(x)) == x`` that every real
log pipeline needs and the correctness oracle replays.

Engine-exactness: both directions are pure integer/string arithmetic.
Civil date <-> epoch-day conversions use Howard Hinnant's
``days_from_civil`` / ``civil_from_days`` integer algorithms (public
domain, widely published) — no engine date functions, no timezone
state, so Spark and DuckDB replay the SAME expressions bit-for-bit.
All intermediate divisions act on non-negative values (post-1970
timestamps), where truncating div == floor div in both engines.

Scale shape: every stage is a narrow per-row projection (regexp +
integer arithmetic inside whole-stage codegen) — no shuffle, no UDF,
no driver state.  At 100 TB this is a pure scan-transform pipeline
that parallelizes perfectly and pushes the line column alone through
the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# the reference's exact pattern (Event.java:38), anchored like
# Java's Matcher.matches()
REF_PATTERN = r"^\[(.*)] /(.+)[?&]user=(.*) (.*)\.(.*)\.(.*)\.(.*)$"
# SimpleDateFormat yyyy-MM-dd'T'HH:mm:ss.SSSXXX, parsed structurally.
# Two patterns (7 + 3 groups): DuckDB's regexp_extract caps the group
# index at 9, so one 10-group pattern is not portable.
TS_PATTERN = r"^(\d+)-(\d+)-(\d+)T(\d+):(\d+):(\d+)\.(\d+)"
TS_OFF_PATTERN = r"([+-])(\d+):(\d+)$"


class _Engine:
    """SQL-dialect bindings for the handful of spots Spark SQL and
    DuckDB genuinely differ; everything else is shared text."""

    def __init__(self, div: str, h60, to_hex, hex_to_int, re_lit):
        self.div = div                # integer-division operator token
        self.h60 = h60                # portable 60-bit hash of an expr
        self.to_hex = to_hex          # int expr -> lowercase hex string
        self.hex_to_int = hex_to_int  # hex string expr -> BIGINT
        self.re_lit = re_lit          # python regex -> SQL string literal


def _spark_engine() -> _Engine:
    return _Engine(
        div="div",
        h60=lambda e: f"CAST(conv(substring(md5({e}), 1, 15), 16, 10) "
                      f"AS BIGINT)",
        to_hex=lambda e: f"lower(hex({e}))",
        hex_to_int=lambda e: f"CAST(conv({e}, 16, 10) AS BIGINT)",
        # Spark SQL string literals process backslash escapes
        re_lit=lambda p: "'" + p.replace("\\", "\\\\") + "'",
    )


def _duck_engine() -> _Engine:
    return _Engine(
        div="//",
        h60=lambda e: f"(('0x' || substr(md5({e}), 1, 15))::BIGINT)",
        to_hex=lambda e: f"lower(to_hex({e}))",
        hex_to_int=lambda e: f"(('0x' || {e})::BIGINT)",
        re_lit=lambda p: "'" + p + "'",
    )


def _format_stages(g: _Engine) -> list[dict[str, str]]:
    """Projection stages rendering (event_id, user_id, event_type, tus)
    into the Event.java line format.  Input ``tus`` = epoch micros.
    Staged (not one expression) so shared intermediates (era, doe, yoe)
    are named once instead of textually exploding."""
    d = g.div
    return [
        {"tms": f"tus {d} 1000"},
        {"sec": f"tms {d} 1000", "ms": "tms % 1000"},
        {"days": f"sec {d} 86400", "sod": "sec % 86400"},
        # civil_from_days (Hinnant): z is days since 0000-03-01
        {"z": "days + 719468", "hh": f"sod {d} 3600",
         "mi": f"(sod % 3600) {d} 60", "ss": "sod % 60"},
        {"era": f"z {d} 146097"},
        {"doe": "z - era * 146097"},
        {"yoe": f"(doe - doe {d} 1460 + doe {d} 36524 - doe {d} 146097)"
                f" {d} 365"},
        {"y0": "yoe + era * 400",
         "doy": f"doe - (365 * yoe + yoe {d} 4 - yoe {d} 100)"},
        {"mp": f"(5 * doy + 2) {d} 153"},
        {"dd": f"doy - (153 * mp + 2) {d} 5 + 1",
         "mm": "CASE WHEN mp < 10 THEN mp + 3 ELSE mp - 9 END"},
        {"yy": "y0 + (CASE WHEN mm <= 2 THEN 1 ELSE 0 END)"},
        # deterministic per-user ip: four octets off the portable hash
        # (octet1 >= 128 occurs, exercising the Java int wrap on parse)
        {"hb": g.h60("CAST(user_id AS STRING) || ':ip'")},
        {"o1": "hb % 256", "o2": f"(hb {d} 256) % 256",
         "o3": f"(hb {d} 65536) % 256", "o4": f"(hb {d} 16777216) % 256"},
        {"ts_str": "lpad(CAST(yy AS STRING), 4, '0') || '-' || "
                   "lpad(CAST(mm AS STRING), 2, '0') || '-' || "
                   "lpad(CAST(dd AS STRING), 2, '0') || 'T' || "
                   "lpad(CAST(hh AS STRING), 2, '0') || ':' || "
                   "lpad(CAST(mi AS STRING), 2, '0') || ':' || "
                   "lpad(CAST(ss AS STRING), 2, '0') || '.' || "
                   "lpad(CAST(ms AS STRING), 3, '0') || '+00:00'",
         "ip_str": "CAST(o1 AS STRING) || '.' || CAST(o2 AS STRING) || "
                   "'.' || CAST(o3 AS STRING) || '.' || "
                   "CAST(o4 AS STRING)",
         "uid_hex": g.to_hex("user_id")},
        {"log_line": "'[' || ts_str || '] /' || event_type || "
                     "'?user=' || uid_hex || ' ' || ip_str"},
    ]


def _parse_stages(g: _Engine) -> list[dict[str, str]]:
    """Projection stages parsing ``log_line`` back into
    (op, uid, time_ms, ip_num) — the Event.read() semantics."""
    d = g.div
    ref, ts = g.re_lit(REF_PATTERN), g.re_lit(TS_PATTERN)
    toff = g.re_lit(TS_OFF_PATTERN)

    def rx(src: str, pat: str, i: int) -> str:
        return f"regexp_extract({src}, {pat}, {i})"

    return [
        {"s_ts": rx("log_line", ref, 1), "op": rx("log_line", ref, 2),
         "s_uid": rx("log_line", ref, 3), "s_o1": rx("log_line", ref, 4),
         "s_o2": rx("log_line", ref, 5), "s_o3": rx("log_line", ref, 6),
         "s_o4": rx("log_line", ref, 7)},
        {"pyy": f"CAST({rx('s_ts', ts, 1)} AS BIGINT)",
         "pmm": f"CAST({rx('s_ts', ts, 2)} AS BIGINT)",
         "pdd": f"CAST({rx('s_ts', ts, 3)} AS BIGINT)",
         "phh": f"CAST({rx('s_ts', ts, 4)} AS BIGINT)",
         "pmi": f"CAST({rx('s_ts', ts, 5)} AS BIGINT)",
         "pss": f"CAST({rx('s_ts', ts, 6)} AS BIGINT)",
         "pms": f"CAST({rx('s_ts', ts, 7)} AS BIGINT)",
         "s_sign": rx("s_ts", toff, 1),
         "poh": f"CAST({rx('s_ts', toff, 2)} AS BIGINT)",
         "pom": f"CAST({rx('s_ts', toff, 3)} AS BIGINT)"},
        # days_from_civil (Hinnant)
        {"ym": "pyy - (CASE WHEN pmm <= 2 THEN 1 ELSE 0 END)"},
        {"era2": f"ym {d} 400"},
        {"yoe2": "ym - era2 * 400",
         "doy2": f"(153 * (pmm + CASE WHEN pmm > 2 THEN -3 ELSE 9 END)"
                 f" + 2) {d} 5 + pdd - 1"},
        {"doe2": f"yoe2 * 365 + yoe2 {d} 4 - yoe2 {d} 100 + doy2"},
        {"days2": "era2 * 146097 + doe2 - 719468"},
        {"uid": g.hex_to_int("s_uid"),
         # SimpleDateFormat XXX: the rendered instant is civil time in
         # the printed offset, so epoch = civil - offset
         "time_ms": "((days2 * 86400 + phh * 3600 + pmi * 60 + pss) "
                    "* 1000 + pms) - "
                    "(CASE WHEN s_sign = '-' THEN -1 ELSE 1 END) "
                    "* (poh * 60 + pom) * 60000",
         "ipv": "CAST(s_o1 AS BIGINT) * 16777216 + "
                "CAST(s_o2 AS BIGINT) * 65536 + "
                "CAST(s_o3 AS BIGINT) * 256 + CAST(s_o4 AS BIGINT)"},
        # Java `Integer.parseInt(o1) << 24` wraps into a signed int
        {"ip_num": "CASE WHEN ipv >= 2147483648 THEN ipv - 4294967296 "
                   "ELSE ipv END"},
    ]


def _apply_stages(df: DataFrame, stages: list[dict[str, str]]) -> DataFrame:
    for st in stages:
        df = df.selectExpr("*", *[f"{e} AS {n}" for n, e in st.items()])
    return df


def format_event_lines(events: DataFrame) -> DataFrame:
    """(event_id, user_id, event_type, ts:timestamp) ->
    (event_id, log_line) in the Event.java format."""
    g = _spark_engine()
    base = events.selectExpr("event_id", "user_id", "event_type",
                             "unix_micros(ts) AS tus")
    out = _apply_stages(base, _format_stages(g))
    return out.select("event_id", "log_line")


def parse_event_lines(lines: DataFrame,
                      line_col: str = "log_line") -> DataFrame:
    """Parse Event.java-format lines into typed records.

    Returns (<passthrough cols>, op, uid, time_ms, ip_num).  Lines that
    don't match the format are DROPPED — the parity of Event.read()
    returning null on a non-matching line (Event.java:62-75).
    """
    g = _spark_engine()
    stages = _parse_stages(g)
    df = lines.withColumnRenamed(line_col, "log_line") \
        if line_col != "log_line" else lines
    df = _apply_stages(df, stages[:1]).filter("s_ts <> ''")
    df = _apply_stages(df, stages[1:])
    keep = [c for c in lines.columns if c != line_col]
    return df.select(*keep, "op", "uid", "time_ms", "ip_num")


def event_lines_roundtrip_sql(table: str = "events") -> str:
    """DuckDB mirror of ``parse_event_lines(format_event_lines(events))``
    — the same staged expressions folded into nested selects."""
    g = _duck_engine()
    sql = (f"SELECT event_id, user_id, event_type, "
           f"epoch_us(ts) AS tus FROM {table}")
    for st in _format_stages(g):
        defs = ", ".join(f"{e} AS {n}" for n, e in st.items())
        sql = f"SELECT *, {defs} FROM ({sql})"
    sql = f"SELECT event_id, log_line FROM ({sql})"
    pstages = _parse_stages(g)
    defs = ", ".join(f"{e} AS {n}" for n, e in pstages[0].items())
    sql = f"SELECT * FROM (SELECT *, {defs} FROM ({sql})) WHERE s_ts <> ''"
    for st in pstages[1:]:
        defs = ", ".join(f"{e} AS {n}" for n, e in st.items())
        sql = f"SELECT *, {defs} FROM ({sql})"
    return (f"SELECT event_id, op, uid, time_ms, ip_num FROM ({sql}) "
            f"ORDER BY event_id")
