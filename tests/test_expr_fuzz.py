"""Expression-surface fuzz vs DuckDB oracle (round 5, extending
test_compiler_fuzz.py beyond the stage grammar).

Covers the surfaces the stage fuzz does not reach: the date-part /
date-arithmetic operators WITH their round-5 ``timezone`` parameter
(DST gaps, half-hour zones, southern-hemisphere DST), the string
library ($substrCP/$indexOfCP/$split/$replaceOne/$replaceAll/trim),
and the array library ($filter/$map/$reduce/$slice/$sortArray/
$indexOfArray/set ops/$range/array-form $firstN).

Twin-construction notes (verified by probe before writing):
- DuckDB ``timezone(tz, ts::TIMESTAMPTZ)`` is from_utc_timestamp and
  ``timezone(tz, naive)::TIMESTAMP`` is to_utc_timestamp when the
  DuckDB session TimeZone is UTC (both engines pin UTC sessions).
  Both resolve a spring-forward gap by shifting forward — probed:
  NY 02:30 on 2024-03-10 maps to 07:30Z on both.
- DuckDB dayofweek is 0=Sunday; Mongo/Spark 1=Sunday → +1.
- DuckDB date_diff counts unit-boundary crossings — exactly Mongo's
  $dateDiff contract (the engine truncates-then-diffs to get it).
- list_position returns 0 when absent (so -1 after the 1→0 base
  shift, which IS Mongo's $indexOfArray absent value) and NULL only
  for a NULL list.
- regexp_replace without 'g' replaces the FIRST match = $replaceOne.

Determinism: derandomize=True, same cases every run; the dyadic
double column makes float arithmetic exact so == comparison holds.
"""

from __future__ import annotations

import datetime as dt
import math

import duckdb
import hypothesis.strategies as st
import pytest
from hypothesis import HealthCheck, given, settings

from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline

N_ROWS = 240
VOCAB = ["red", "green", "blue", None, "RED", "", "héllo wörld", " abAB "]
TOKENS = ["aa", "b", "ccc", "dd"]
EPOCH = dt.datetime(2024, 1, 1, 0, 0, 0)


def _rows():
    rows = []
    for i in range(N_ROWS):
        a = None if i % 7 == 3 else (i * 13) % 21
        d = None if a is None else (a - 7) / 4.0
        s = VOCAB[i % len(VOCAB)]
        s2 = "-".join(TOKENS[(i + j) % 4] for j in range(i % 4))
        # ~1.5-day stride + minute jitter: spans all of 2024, crosses
        # both US DST transitions and the Sydney (southern) ones
        ts = (
            None
            if i % 9 == 4
            else EPOCH + dt.timedelta(seconds=i * 131071, minutes=(i * 17) % 60)
        )
        arr = None if i % 13 == 6 else [(i * j) % 10 for j in range(i % 5)]
        rows.append((i, a, d, s, s2, ts, arr))
    return rows


@pytest.fixture(scope="module")
def eframes(spark):
    import pandas as pd

    rows = _rows()
    sdf = spark.createDataFrame(
        rows,
        "rid int, a int, d double, s string, s2 string, ts timestamp,"
        " arr array<int>",
    ).cache()
    sdf.count()
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    pdf = pd.DataFrame(
        rows, columns=["rid", "a", "d", "s", "s2", "ts", "arr"]
    ).astype({"a": "Int64"})
    con.register("t", pdf)
    return sdf, con


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if v is None:
                vals.append(None)
            elif isinstance(v, bool):
                vals.append(v)
            elif isinstance(v, (int, float)) or str(type(v)).find("Decimal") >= 0:
                f = float(v)
                assert not math.isnan(f)
                vals.append(f)
            elif isinstance(v, list):
                vals.append([None if x is None else
                             (float(x) if isinstance(x, (int, float)) else x)
                             for x in v])
            else:
                vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def _run(eframes, pipeline, sql):
    sdf, con = eframes
    got = _norm([tuple(r) for r in compile_pipeline(sdf, pipeline).collect()])
    want = _norm(con.execute(sql).fetchall())
    assert got == want, f"\npipeline={pipeline}\nsql={sql}"


# ------------------------------------------------------------- dates
# IANA zones exercising: identity, US DST (spring/fall), half-hour
# offset, southern-hemisphere DST (transitions in Apr/Oct)
# Chatham: +12:45 base with DST — a 45-minute offset exercises every
# place the code assumes whole- or half-hour zones
_TZS = ["UTC", "America/New_York", "Asia/Kolkata", "Australia/Sydney",
        "Pacific/Chatham"]

#: (mongo op, duckdb expr template over wall-clock naive {0})
_PARTS = [
    ("$year", "year({0})"),
    ("$month", "month({0})"),
    ("$dayOfMonth", "dayofmonth({0})"),
    ("$hour", "hour({0})"),
    ("$minute", "minute({0})"),
    ("$second", "second({0})"),
    ("$dayOfWeek", "(dayofweek({0}) + 1)"),
    ("$dayOfYear", "dayofyear({0})"),
    ("$isoWeek", "week({0})"),
    ("$isoDayOfWeek", "isodow({0})"),
    ("$isoWeekYear", "isoyear({0})"),
    ("$week", "CAST(strftime({0}, '%U') AS INT)"),
]


@settings(max_examples=48, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(part=st.sampled_from(_PARTS), tz=st.sampled_from(_TZS),
       with_tz=st.booleans())
def test_fuzz_date_parts(eframes, part, tz, with_tz):
    """Every date-part operator, bare and with the {date, timezone}
    object form, vs extraction over the zone's wall clock."""
    op, sql_t = part
    spec = {op: ({"date": "$ts", "timezone": tz} if with_tz else "$ts")}
    wall = f"timezone('{tz}', ts::TIMESTAMPTZ)" if with_tz else "ts"
    pipeline = [{"$project": {"rid": 1, "p": spec}}]
    sql = f"SELECT rid, {sql_t.format(wall)} AS p FROM t"
    _run(eframes, pipeline, sql)


# week excluded here: Mongo week truncation boundary is startOfWeek
# (default Sunday), covered by test_fuzz_date_trunc_week below
_TRUNC_UNITS = ["year", "month", "day", "hour", "minute"]
_ARITH_UNITS = ["year", "month", "week", "day", "hour", "minute", "second"]


@settings(max_examples=36, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(unit=st.sampled_from(_TRUNC_UNITS), tz=st.sampled_from(_TZS),
       with_tz=st.booleans())
def test_fuzz_date_trunc(eframes, unit, tz, with_tz):
    """$dateTrunc: truncate at the zone's local boundary, return the
    UTC instant of that boundary (identity composition when no tz)."""
    spec = {"date": "$ts", "unit": unit}
    if with_tz:
        spec["timezone"] = tz
        sql_e = (f"timezone('{tz}', date_trunc('{unit}', "
                 f"timezone('{tz}', ts::TIMESTAMPTZ)))::TIMESTAMP")
    else:
        sql_e = f"date_trunc('{unit}', ts)::TIMESTAMP"
    pipeline = [{"$project": {"rid": 1, "p": {"$dateTrunc": spec}}}]
    sql = f"SELECT rid, {sql_e} AS p FROM t"
    _run(eframes, pipeline, sql)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(unit=st.sampled_from(_ARITH_UNITS), n=st.integers(-30, 30),
       tz=st.sampled_from(_TZS), with_tz=st.booleans(),
       sub=st.booleans())
def test_fuzz_date_add(eframes, unit, n, tz, with_tz, sub):
    """$dateAdd/$dateSubtract: calendar arithmetic; with a zone it is
    WALL-CLOCK arithmetic in that zone (DST-aware), twin-composed the
    same way in DuckDB."""
    op = "$dateSubtract" if sub else "$dateAdd"
    spec = {"startDate": "$ts", "unit": unit, "amount": n}
    eff = -n if sub else n
    if with_tz:
        spec["timezone"] = tz
        sql_e = (f"timezone('{tz}', (timezone('{tz}', ts::TIMESTAMPTZ) "
                 f"+ ({eff}) * INTERVAL 1 {unit}))::TIMESTAMP")
    else:
        sql_e = f"(ts + ({eff}) * INTERVAL 1 {unit})"
    pipeline = [{"$project": {"rid": 1, "p": {op: spec}}}]
    sql = f"SELECT rid, {sql_e} AS p FROM t"
    _run(eframes, pipeline, sql)


_SOW = ["sunday", "monday", "wednesday", "saturday"]
_SOW_ANCHOR = {"sunday": "1970-01-04", "monday": "1970-01-05",
               "wednesday": "1970-01-07", "saturday": "1970-01-03"}


@settings(max_examples=36, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(unit=st.sampled_from(["year", "month", "day", "hour", "minute"]),
       off=st.integers(-40, 40), tz=st.sampled_from(_TZS),
       with_tz=st.booleans())
def test_fuzz_date_diff(eframes, unit, off, tz, with_tz):
    """$dateDiff counts unit-boundary crossings (23:59→00:01 is one
    day) — DuckDB's date_diff has exactly that contract; with a zone,
    crossings are counted on the zone's local clock."""
    spec = {"startDate": "$ts",
            "endDate": {"$dateAdd": {"startDate": "$ts", "unit": "hour",
                                     "amount": off * 7}},
            "unit": unit}
    a, b = "ts", f"(ts + ({off * 7}) * INTERVAL 1 hour)"
    if with_tz:
        spec["timezone"] = tz
        a = f"timezone('{tz}', {a}::TIMESTAMPTZ)"
        b = f"timezone('{tz}', {b}::TIMESTAMPTZ)"
    pipeline = [{"$project": {"rid": 1, "p": {"$dateDiff": spec}}}]
    sql = f"SELECT rid, date_diff('{unit}', {a}, {b}) AS p FROM t"
    _run(eframes, pipeline, sql)


@settings(max_examples=24, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(off=st.integers(-60, 60), sow=st.sampled_from(_SOW))
def test_fuzz_date_diff_week(eframes, off, sow):
    """week-unit $dateDiff with startOfWeek: whole weeks between
    anchored week starts, the anchor being a 1970 date falling on the
    requested weekday (same construction as the engine, independently
    re-derived in SQL)."""
    anchor = _SOW_ANCHOR[sow]
    pipeline = [{"$project": {"rid": 1, "p": {"$dateDiff": {
        "startDate": "$ts",
        "endDate": {"$dateAdd": {"startDate": "$ts", "unit": "hour",
                                 "amount": off * 13}},
        "unit": "week", "startOfWeek": sow}}}}]
    sql = f"""
    SELECT rid,
           (FLOOR(date_diff('day', DATE '{anchor}',
                            (ts + ({off * 13}) * INTERVAL 1 hour)::DATE) / 7)
            - FLOOR(date_diff('day', DATE '{anchor}', ts::DATE) / 7)) AS p
    FROM t
    """
    _run(eframes, pipeline, sql)


# ----------------------------------------------------------- strings
def _lit_frag():
    return st.sampled_from(["a", "b", "A", "l", "lo", "aa", "-", " ", "é"])


@settings(max_examples=50, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(start=st.integers(0, 6), ln=st.integers(0, 8), frag=_lit_frag())
def test_fuzz_substr_index_len(eframes, start, ln, frag):
    """$substrCP (0-based code points), $indexOfCP (0-based, -1
    absent), $strLenCP — over a vocabulary with multi-byte chars so
    byte-position bugs cannot hide."""
    pipeline = [{"$project": {
        "rid": 1,
        "sub": {"$substrCP": ["$s", start, ln]},
        "idx": {"$indexOfCP": ["$s", frag]},
        "ln": {"$strLenCP": "$s"},
    }}]
    sql = f"""
    SELECT rid, substr(s, {start + 1}, {ln}) AS sub,
           (strpos(s, '{frag}') - 1) AS idx,
           length(s) AS ln
    FROM t
    """
    _run(eframes, pipeline, sql)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(find=st.sampled_from(TOKENS + ["a", "-"]), repl=_lit_frag(),
       one=st.booleans())
def test_fuzz_replace(eframes, find, repl, one):
    """$replaceOne (first occurrence — twin regexp_replace without
    'g') and $replaceAll (twin replace())."""
    op = "$replaceOne" if one else "$replaceAll"
    pipeline = [{"$project": {"rid": 1, "r": {
        op: {"input": "$s2", "find": find, "replacement": repl}}}}]
    if one:
        sql_e = f"regexp_replace(s2, regexp_escape('{find}'), '{repl}')"
    else:
        sql_e = f"replace(s2, '{find}', '{repl}')"
    sql = f"SELECT rid, {sql_e} AS r FROM t"
    _run(eframes, pipeline, sql)


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(idx=st.integers(-4, 4))
def test_fuzz_split_elem(eframes, idx):
    """$split + $arrayElemAt + $size composition vs string_split:
    1-based vs 0-based and negative indices, absent delimiter → the
    whole string as a single element."""
    pipeline = [{"$project": {
        "rid": 1,
        "el": {"$arrayElemAt": [{"$split": ["$s2", "-"]}, idx]},
        "n": {"$size": {"$split": ["$s2", "-"]}},
    }}]
    duck_idx = idx + 1 if idx >= 0 else idx
    sql = f"""
    SELECT rid, string_split(s2, '-')[{duck_idx}] AS el,
           len(string_split(s2, '-')) AS n
    FROM t
    """
    _run(eframes, pipeline, sql)


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(chars=st.sampled_from([" ", "aA", " a", "dRE"]),
       side=st.sampled_from(["$ltrim", "$rtrim"]))
def test_fuzz_trim(eframes, chars, side):
    """$ltrim/$rtrim with an explicit chars set; $trim default
    whitespace rides along in the same projection."""
    pipeline = [{"$project": {
        "rid": 1,
        "t1": {side: {"input": "$s", "chars": chars}},
        "t2": {"$trim": {"input": "$s"}},
    }}]
    fn = "ltrim" if side == "$ltrim" else "rtrim"
    sql = f"""
    SELECT rid, {fn}(s, '{chars}') AS t1, trim(s) AS t2 FROM t
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------------------------ arrays
@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(k=st.integers(0, 9), mul=st.integers(-3, 3), add=st.integers(-5, 5))
def test_fuzz_filter_map_reduce(eframes, k, mul, add):
    """$filter/$map/$reduce (lambda-bound $$this/$$value) vs DuckDB
    list_filter/list_transform/list_sum twins; $reduce with init 0 is
    0 on an empty array while list_sum is NULL — COALESCE spells the
    difference."""
    pipeline = [{"$project": {
        "rid": 1,
        "f": {"$filter": {"input": "$arr", "as": "x",
                          "cond": {"$gt": ["$$x", k]}}},
        "m": {"$map": {"input": "$arr", "as": "x",
                       "in": {"$add": [{"$multiply": ["$$x", mul]}, add]}}},
        "r": {"$reduce": {"input": "$arr", "initialValue": 0,
                          "in": {"$add": ["$$value", "$$this"]}}},
    }}]
    sql = f"""
    SELECT rid,
           list_filter(arr, x -> x > {k}) AS f,
           list_transform(arr, x -> x * {mul} + {add}) AS m,
           CASE WHEN arr IS NULL THEN NULL
                ELSE COALESCE(list_sum(arr), 0) END AS r
    FROM t
    """
    _run(eframes, pipeline, sql)


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(v=st.integers(0, 11), n=st.integers(1, 4),
       direction=st.sampled_from([1, -1]))
def test_fuzz_array_shape(eframes, v, n, direction):
    """$indexOfArray (-1 absent, null on null array), $slice,
    $sortArray asc/desc, $reverseArray, $in, $size, array-form
    $firstN."""
    pipeline = [{"$project": {
        "rid": 1,
        "ix": {"$indexOfArray": ["$arr", v]},
        "sl": {"$slice": ["$arr", n]},
        "so": {"$sortArray": {"input": "$arr", "sortBy": direction}},
        "rv": {"$reverseArray": "$arr"},
        "has": {"$in": [v, "$arr"]},
        "fn": {"$firstN": {"input": "$arr", "n": n}},
    }}]
    d_sort = "ASC" if direction == 1 else "DESC"
    sql = f"""
    SELECT rid,
           CASE WHEN arr IS NULL THEN NULL
                ELSE list_position(arr, {v}) - 1 END AS ix,
           arr[1:{n}] AS sl,
           list_sort(arr, '{d_sort}') AS so,
           list_reverse(arr) AS rv,
           list_contains(arr, {v}) AS has,
           arr[1:{n}] AS fn
    FROM t
    """
    _run(eframes, pipeline, sql)


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(lo=st.integers(-3, 6), hi=st.integers(-3, 12), step=st.integers(1, 4),
       extra=st.lists(st.integers(0, 9), min_size=1, max_size=3))
def test_fuzz_set_ops_range(eframes, lo, hi, step, extra):
    """$setUnion/$setIntersection/$setDifference (order-free — both
    sides sorted before compare) and $range against DuckDB list ops.
    $concatArrays is Mongo-null-propagating (NULL if any operand is)."""
    lit = sorted(set(extra))
    lit_sql = "[" + ", ".join(map(str, lit)) + "]"
    pipeline = [{"$project": {
        "rid": 1,
        "un": {"$sortArray": {"input": {"$setUnion": ["$arr", lit]},
                              "sortBy": 1}},
        "it": {"$sortArray": {"input": {"$setIntersection": ["$arr", lit]},
                              "sortBy": 1}},
        "df": {"$sortArray": {"input": {"$setDifference": ["$arr", lit]},
                              "sortBy": 1}},
        "rg": {"$range": [lo, hi, step]},
        "cc": {"$concatArrays": ["$arr", lit]},
    }}]
    sql = f"""
    SELECT rid,
           CASE WHEN arr IS NULL THEN NULL
                ELSE list_sort(list_distinct(list_concat(arr, {lit_sql})))
           END AS un,
           list_sort(list_distinct(list_filter(arr,
               x -> list_contains({lit_sql}, x)))) AS it,
           list_sort(list_distinct(list_filter(arr,
               x -> NOT list_contains({lit_sql}, x)))) AS df,
           range({lo}, {hi}, {step}) AS rg,
           CASE WHEN arr IS NULL THEN NULL
                ELSE list_concat(arr, {lit_sql}) END AS cc
    FROM t
    """
    sdf, con = eframes
    got = _norm([tuple(r) for r in compile_pipeline(sdf, pipeline).collect()])
    want = _norm(con.execute(sql).fetchall())
    # null array: every set op is NULL on both engines; non-null rows
    # must agree exactly
    assert got == want, f"\npipeline={pipeline}\nsql={sql}"


# ------------------------------------------------ accumulator fuzz
@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(direction=st.sampled_from([1, -1]), n=st.integers(1, 4),
       p=st.sampled_from([0.25, 0.5, 0.75, 0.125]))
def test_fuzz_accumulators(eframes, direction, n, p):
    """$sort-ordered $first/$last/$push next to self-sorted $top/
    $topN/$minN and the numeric family $stdDevPop/Samp (6-dp rounded
    — non-associative float), $median/$percentile (exact interpolated;
    dyadic data and dyadic p make both engines' lerp exact)."""
    d_sql = "ASC NULLS FIRST" if direction == 1 else "DESC NULLS LAST"
    pipeline = [
        {"$sort": {"d": direction, "rid": 1}},
        {"$group": {
            "_id": "$s",
            "fi": {"$first": "$rid"},
            "la": {"$last": "$rid"},
            "pu": {"$push": "$rid"},
            "tp": {"$top": {"output": "$rid",
                            "sortBy": {"d": -direction, "rid": 1}}},
            "tn": {"$topN": {"output": "$rid",
                             "sortBy": {"d": -direction, "rid": 1},
                             "n": n}},
            "mnn": {"$minN": {"input": "$a", "n": n}},
            "sd": {"$stdDevPop": "$d"},
            "ss": {"$stdDevSamp": "$d"},
            "md": {"$median": {"input": "$d", "method": "approximate"}},
            "pc": {"$percentile": {"input": "$d", "p": [p],
                                   "method": "approximate"}},
        }},
        {"$project": {"_id": 1, "fi": 1, "la": 1, "pu": 1, "tp": 1,
                      "tn": 1, "mnn": 1,
                      "sd": {"$round": ["$sd", 6]},
                      "ss": {"$round": ["$ss", 6]},
                      "md": 1, "pc": 1}},
    ]
    rev = "DESC NULLS LAST" if direction == 1 else "ASC NULLS FIRST"
    sql = f"""
    SELECT s AS _id,
           (list(rid ORDER BY d {d_sql}, rid))[1] AS fi,
           (list(rid ORDER BY d {d_sql}, rid))[-1] AS la,
           list(rid ORDER BY d {d_sql}, rid) AS pu,
           (list(rid ORDER BY d {rev}, rid))[1] AS tp,
           (list(rid ORDER BY d {rev}, rid))[1:{n}] AS tn,
           (list(a ORDER BY a ASC) FILTER (a IS NOT NULL))[1:{n}] AS mnn,
           round(stddev_pop(d), 6) AS sd,
           round(stddev_samp(d), 6) AS ss,
           quantile_cont(d, 0.5) AS md,
           [quantile_cont(d, {p})] AS pc
    FROM t GROUP BY 1
    """
    _run(eframes, pipeline, sql)


# ---------------------------------------------------- $lookup fuzz
def _dim_rows(mult):
    rows = []
    for k in range(7):
        for c in range((k * mult + 1) % 4):
            rows.append((k, k * 10 + c))
    return rows


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(mult=st.integers(0, 6), preserve=st.booleans())
def test_fuzz_lookup_unwind_group(spark, eframes, mult, preserve):
    """Equi-$lookup (array-of-matches contract) composed with $unwind
    and a $group over the joined values, against a LEFT/INNER JOIN
    twin — fuzzing the foreign key's match multiplicity 0..3 per key.
    A null local key matches nothing (the dim has no null keys)."""
    sdf, con = eframes
    import pandas as pd

    dim = _dim_rows(mult)
    u = spark.createDataFrame(dim or [(None, None)], "key int, v int")
    if not dim:
        u = u.filter("key IS NOT NULL")
    con.register("u", pd.DataFrame(dim, columns=["key", "v"]).astype(
        {"key": "Int64", "v": "Int64"}))
    pipeline = [
        {"$project": {"rid": 1, "k": {"$mod": ["$a", 7]}}},
        {"$lookup": {"from": "u", "localField": "k",
                     "foreignField": "key", "as": "m"}},
        {"$unwind": {"path": "$m",
                     **({"preserveNullAndEmptyArrays": True}
                        if preserve else {})}},
        {"$group": {"_id": "$rid",
                    "n": {"$sum": 1},
                    "sv": {"$sum": "$m.v"}}},
    ]
    join = "LEFT JOIN" if preserve else "JOIN"
    sql = f"""
    WITH p AS (SELECT rid, a % 7 AS k FROM t),
         j AS (SELECT p.rid, u.v FROM p {join} u ON p.k = u.key)
    SELECT rid AS _id, COUNT(*) AS n,
           CAST(COALESCE(SUM(CAST(v AS DECIMAL(38,6))), 0) AS DOUBLE) AS sv
    FROM j GROUP BY 1
    """
    got = _norm([tuple(r) for r in compile_pipeline(
        sdf, pipeline, collections={"u": u}).collect()])
    want = _norm(con.execute(sql).fetchall())
    assert got == want, f"\npipeline={pipeline}\nsql={sql}"


@settings(max_examples=16, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(mult=st.integers(0, 6), cut=st.integers(0, 65))
def test_fuzz_lookup_pipeline_residual(spark, eframes, mult, cut):
    """Correlated sub-pipeline $lookup: one $$var equality plus an
    uncorrelated residual predicate, vs a LEFT JOIN with the residual
    in the ON clause (Mongo: non-matching docs still get an empty
    array — size 0)."""
    sdf, con = eframes
    import pandas as pd

    dim = _dim_rows(mult)
    u = spark.createDataFrame(dim or [(None, None)], "key int, v int")
    if not dim:
        u = u.filter("key IS NOT NULL")
    con.register("u", pd.DataFrame(dim, columns=["key", "v"]).astype(
        {"key": "Int64", "v": "Int64"}))
    pipeline = [
        {"$project": {"rid": 1, "k": {"$mod": ["$a", 7]}}},
        {"$lookup": {"from": "u", "let": {"kk": "$k"},
                     "pipeline": [{"$match": {"$expr": {"$and": [
                         {"$eq": ["$key", "$$kk"]},
                         {"$lt": ["$v", cut]}]}}}],
                     "as": "m"}},
        {"$project": {"rid": 1, "nm": {"$size": "$m"}}},
    ]
    sql = f"""
    WITH p AS (SELECT rid, a % 7 AS k FROM t)
    SELECT p.rid, COUNT(u.key) AS nm
    FROM p LEFT JOIN u ON p.k = u.key AND u.v < {cut}
    GROUP BY p.rid
    """
    got = _norm([tuple(r) for r in compile_pipeline(
        sdf, pipeline, collections={"u": u}).collect()])
    want = _norm(con.execute(sql).fetchall())
    assert got == want, f"\npipeline={pipeline}\nsql={sql}"


# ---------------------------------------------------- $densify fuzz
@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(step=st.integers(1, 5), part=st.booleans())
def test_fuzz_densify_numeric(eframes, step, part):
    """Numeric-step $densify (bounds full/partition): the spine fills
    [min, max] at step multiples FROM min; original documents are all
    preserved — including ones whose value is OFF the spine grid and
    ones with a null densify field (Mongo passes those through)."""
    sdf, con = eframes
    field_part = (["s"] if part else [])
    spec = {"field": "a", "range": {"step": step,
                                    "bounds": "partition" if part else "full"}}
    if part:
        spec["partitionByFields"] = ["s"]
    pipeline = [
        {"$project": {"rid": 1, "s": 1, "a": 1}},
        {"$densify": spec},
        {"$project": {"rid": 1, "s": 1, "a": 1}},
    ]
    pcols = "s," if part else ""
    pgrp = "GROUP BY s" if part else ""
    pjoin = "AND b.s IS NOT DISTINCT FROM g.s" if part else ""
    sql = f"""
    WITH base AS (SELECT rid, s, a FROM t),
    b AS (SELECT {pcols} min(a) AS d0, max(a) AS d1
          FROM base WHERE a IS NOT NULL {pgrp}),
    spine AS (SELECT {"b.s," if part else ""}
                     unnest(generate_series(d0, d1, {step})) AS a FROM b),
    grid AS (SELECT g.* FROM spine g
             WHERE NOT EXISTS (SELECT 1 FROM base b
                               WHERE b.a = g.a {pjoin}))
    SELECT rid, s, a FROM base
    UNION ALL
    SELECT NULL AS rid, {"s" if part else "NULL AS s"}, a FROM grid
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------------- conversions fuzz
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(on_err=st.integers(-9, -1), on_null=st.integers(-19, -11),
       to=st.sampled_from(["int", "long", "double"]))
def test_fuzz_convert(eframes, on_err, on_null, to):
    """$convert with onError/onNull over unparseable strings, and
    $toInt's TRUNCATION of doubles (DuckDB CAST rounds — the twin
    spells trunc explicitly; the engine's documented policy is
    Mongo's truncate-toward-zero)."""
    pipeline = [{"$project": {
        "rid": 1,
        "cv": {"$convert": {"input": "$s", "to": to,
                            "onError": on_err, "onNull": on_null}},
        "ti": {"$toInt": "$d"},
    }}]
    sql = f"""
    SELECT rid,
           CASE WHEN s IS NULL THEN {on_null}
                ELSE COALESCE(TRY_CAST(s AS {to.upper()}), {on_err})
           END AS cv,
           CAST(TRUNC(d) AS INT) AS ti
    FROM t
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------------------- regex fuzz
_PATTERNS = ["^a", "a+", "l.o", "[0-9]", "e.", "é", "^$", "o?r"]


@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(pat=st.sampled_from(_PATTERNS))
def test_fuzz_regex(eframes, pat):
    """$regexMatch (unanchored find, like Mongo) and $match {$regex}
    vs DuckDB regexp_matches."""
    pipeline = [
        {"$match": {"s": {"$regex": pat}}},
        {"$project": {"rid": 1,
                      "m2": {"$regexMatch": {"input": "$s2",
                                             "regex": pat}}}},
    ]
    sql = f"""
    SELECT rid, regexp_matches(s2, '{pat}') AS m2
    FROM t WHERE regexp_matches(s, '{pat}')
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------- divide/mod policy fuzz
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(k=st.integers(0, 6))
def test_fuzz_divide_mod(eframes, k):
    """$divide/$mod by a possibly-zero denominator: the engine's
    documented policy is null (try_divide/try_mod), vs Mongo's
    runtime error — the twin encodes the engine policy. b runs
    through 0 via (a % (k+1)) - and hits negatives via - 3."""
    pipeline = [{"$project": {
        "rid": 1,
        "dv": {"$divide": ["$d", {"$subtract": [{"$mod": ["$a", k + 2]}, 3]}]},
        "md": {"$mod": ["$a", {"$subtract": [{"$mod": ["$a", k + 2]}, 3]}]},
    }}]
    sql = f"""
    SELECT rid,
           d / NULLIF((a % {k + 2}) - 3, 0) AS dv,
           CASE WHEN (a % {k + 2}) - 3 = 0 THEN NULL
                ELSE a % ((a % {k + 2}) - 3) END AS md
    FROM t
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------- sortByCount/union fuzz
@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(m=st.integers(-4, 18))
def test_fuzz_sortbycount_union(eframes, m):
    """$unionWith (nested pipeline, column alignment) feeding
    $sortByCount — multiset compare (count ties make total order
    undefined)."""
    pipeline = [
        {"$match": {"a": {"$gt": m}}},
        {"$unionWith": {"coll": "t2", "pipeline": [
            {"$match": {"a": {"$lte": m}}},
            {"$project": {"rid": 1, "s": 1, "a": 1}},
        ]}},
        {"$sortByCount": "$s"},
    ]
    sdf, con = eframes
    sql = f"""
    WITH u AS (
      SELECT s FROM t WHERE a > {m}
      UNION ALL
      SELECT s FROM t WHERE a <= {m}
    )
    SELECT s AS _id, COUNT(*) AS count FROM u GROUP BY 1
    """
    got = _norm([tuple(r) for r in compile_pipeline(
        sdf, pipeline, collections={"t2": sdf}).collect()])
    want = _norm(con.execute(sql).fetchall())
    assert got == want, f"\npipeline={pipeline}\nsql={sql}"


# ------------------------------------------------------- facet fuzz
@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(m=st.integers(-4, 18), k=st.integers(1, 20))
def test_fuzz_facet(eframes, m, k):
    """$facet: one document, each facet an array of sub-pipeline
    result docs — each facet compared (as a multiset of structs)
    against its own SQL."""
    sdf, con = eframes
    pipeline = [
        {"$match": {"a": {"$exists": True}}},
        {"$facet": {
            "by_s": [{"$group": {"_id": "$s", "n": {"$sum": 1}}}],
            "top": [{"$match": {"a": {"$gt": m}}},
                    {"$sort": {"a": 1, "rid": 1}},
                    {"$limit": k},
                    {"$project": {"rid": 1}}],
        }},
    ]
    [row] = compile_pipeline(sdf, pipeline).collect()
    got_by_s = sorted(((r["_id"], r["n"]) for r in row["by_s"]), key=repr)
    got_top = [r["rid"] for r in row["top"]]
    want_by_s = sorted(
        ((s, n) for s, n in con.execute(
            "SELECT s, COUNT(*) FROM t WHERE a IS NOT NULL GROUP BY 1"
        ).fetchall()), key=repr,
    )
    want_top = [r[0] for r in con.execute(f"""
        SELECT rid FROM t WHERE a IS NOT NULL AND a > {m}
        ORDER BY a, rid LIMIT {k}
    """).fetchall()]
    assert got_by_s == want_by_s and got_top == want_top, f"m={m} k={k}"


# --------------------------------------- $dateTrunc binSize/startOfWeek
_TRUNC_SOW_ANCHOR = {
    "sunday": "1999-12-26", "monday": "1999-12-27",
    "wednesday": "1999-12-29", "saturday": "2000-01-01",
}


@settings(max_examples=36, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(unit=st.sampled_from(["hour", "minute", "day", "month", "quarter",
                             "year"]),
       bin_size=st.integers(1, 7), tz=st.sampled_from(_TZS),
       with_tz=st.booleans())
def test_fuzz_date_trunc_binsize(eframes, unit, bin_size, tz, with_tz):
    """$dateTrunc binSize: bins anchored at Mongo's 2000-01-01
    reference — DuckDB's time_bucket with an explicit origin is an
    independent implementation of the same contract."""
    spec = {"date": "$ts", "unit": unit, "binSize": bin_size}
    bucket = (f"time_bucket(({bin_size}) * INTERVAL 1 {unit}, {{0}}, "
              f"TIMESTAMP '2000-01-01 00:00:00')")
    if with_tz:
        spec["timezone"] = tz
        inner = bucket.format(f"timezone('{tz}', ts::TIMESTAMPTZ)")
        sql_e = f"timezone('{tz}', {inner})::TIMESTAMP"
    else:
        sql_e = bucket.format("ts")
    pipeline = [{"$project": {"rid": 1, "p": {"$dateTrunc": spec}}}]
    sql = f"SELECT rid, {sql_e} AS p FROM t"
    _run(eframes, pipeline, sql)


@settings(max_examples=24, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(bin_size=st.integers(1, 4),
       sow=st.sampled_from(list(_TRUNC_SOW_ANCHOR)))
def test_fuzz_date_trunc_week(eframes, bin_size, sow):
    """week-unit $dateTrunc: the boundary is startOfWeek — Mongo's
    default SUNDAY, not SQL date_trunc's Monday — with binSize weeks
    anchored at the last startOfWeek on/before 2000-01-01."""
    anchor = _TRUNC_SOW_ANCHOR[sow]
    pipeline = [{"$project": {"rid": 1, "p": {"$dateTrunc": {
        "date": "$ts", "unit": "week", "binSize": bin_size,
        "startOfWeek": sow}}}}]
    sql = f"""
    SELECT rid,
           time_bucket(({bin_size}) * INTERVAL 7 day, ts,
                       TIMESTAMP '{anchor} 00:00:00') AS p
    FROM t
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------------ $dateToString fuzz
# (mongo format, duckdb strftime twin template over wall-naive {0})
# — Mongo %w is 1-Sunday vs C's 0-Sunday, so its twin computes the
# part; %z/%Z (zone offset at the instant) are built from the
# wall/UTC epoch difference on both engines.
_D2S_CASES = [
    ("%Y-%m-%dT%H:%M:%S", "strftime({0}, '%Y-%m-%dT%H:%M:%S')"),
    ("%d/%m/%Y 100%%", "strftime({0}, '%d/%m/%Y 100%%')"),
    ("%j|%U|%V", "strftime({0}, '%j|%U|%V')"),
    ("%G-W%V-%u", "strftime({0}, '%G-W%V-%u')"),
    ("w%w", "('w' || CAST(dayofweek({0}) + 1 AS VARCHAR))"),
    ("%H:%M:%S.%L", "strftime({0}, '%H:%M:%S.%g')"),
]


@settings(max_examples=40, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(case=st.sampled_from(_D2S_CASES), tz=st.sampled_from(_TZS),
       with_tz=st.booleans(), on_null=st.booleans())
def test_fuzz_date_to_string(eframes, case, tz, with_tz, on_null):
    """$dateToString across the full Mongo specifier set — including
    the ISO-week fields (%G/%V/%u) the JVM formatter only offers
    locale-dependently — with timezone and onNull."""
    fmt, sql_t = case
    spec = {"date": "$ts", "format": fmt}
    wall = "ts"
    if with_tz:
        spec["timezone"] = tz
        wall = f"timezone('{tz}', ts::TIMESTAMPTZ)"
    sql_e = sql_t.format(wall)
    if on_null:
        spec["onNull"] = "NO_DATE"
        sql_e = f"COALESCE({sql_e}, 'NO_DATE')"
    pipeline = [{"$project": {"rid": 1, "p": {"$dateToString": spec}}}]
    sql = f"SELECT rid, {sql_e} AS p FROM t"
    _run(eframes, pipeline, sql)


@settings(max_examples=24, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(tz=st.sampled_from(_TZS), with_tz=st.booleans())
def test_fuzz_date_to_string_offset(eframes, tz, with_tz):
    """%z (+hhmm) and %Z (offset minutes): the zone's UTC offset AT
    EACH instant — DST makes it row-dependent; the twin derives it
    from the same wall/UTC epoch difference."""
    spec = {"date": "$ts", "format": "%z/%Z"}
    if with_tz:
        spec["timezone"] = tz
        off = (f"(CAST(epoch(timezone('{tz}', ts::TIMESTAMPTZ)) AS BIGINT) "
               f"- CAST(epoch(ts) AS BIGINT)) // 60")
    else:
        off = "(CASE WHEN ts IS NULL THEN NULL ELSE 0 END)"
    pipeline = [{"$project": {"rid": 1, "p": {"$dateToString": spec}}}]
    sql = f"""
    SELECT rid,
           (CASE WHEN {off} < 0 THEN '-' ELSE '+' END
            || lpad(CAST(abs({off}) // 60 AS VARCHAR), 2, '0')
            || lpad(CAST(abs({off}) % 60 AS VARCHAR), 2, '0')
            || '/' || CAST({off} AS VARCHAR)) AS p
    FROM t
    """
    _run(eframes, pipeline, sql)


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(tz=st.sampled_from(_TZS), with_tz=st.booleans())
def test_fuzz_date_from_string_roundtrip(eframes, tz, with_tz):
    """$dateToString → $dateFromString round-trip (second resolution;
    the fixture's timestamps are whole seconds) recovers the original
    instant — the same timezone on both legs cancels exactly, DST
    transitions included (no fixture instant lands in a gap)."""
    fmt = "%Y-%m-%d %H:%M:%S"
    to_spec = {"date": "$ts", "format": fmt}
    from_spec = {"dateString": "$str", "format": fmt}
    if with_tz:
        to_spec["timezone"] = tz
        from_spec["timezone"] = tz
    pipeline = [
        {"$project": {"rid": 1, "ts": 1,
                      "str": {"$dateToString": to_spec}}},
        {"$project": {"rid": 1,
                      "back": {"$dateFromString": from_spec}}},
    ]
    sql = "SELECT rid, ts AS back FROM t"
    _run(eframes, pipeline, sql)


# ---------------------------------------------- $dateFromParts fuzz
@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(tz=st.sampled_from(_TZS), with_tz=st.booleans(),
       iso=st.booleans())
def test_fuzz_date_from_parts_carry(eframes, tz, with_tz, iso):
    """$dateFromParts carries out-of-range parts (month 13 → next
    January, day 0 → last of previous month, hour 24 → next day) —
    the parts here run far outside their ranges, negatives included.
    Twin: the same carrying arithmetic in DuckDB intervals from the
    Jan-1 (calendar) / week-1-Monday (ISO) anchor."""
    if iso:
        spec = {"isoWeekYear": 2024, "isoWeek": {"$subtract": ["$a", 3]},
                "isoDayOfWeek": {"$subtract": ["$a", 7]},
                "minute": {"$multiply": ["$a", 61]}}
        base = ("(TIMESTAMP '2024-01-04 00:00:00' "
                "- (isodow(DATE '2024-01-04') - 1) * INTERVAL 1 day)")
        off = ("+ (a - 3 - 1) * INTERVAL 7 day "
               "+ (a - 7 - 1) * INTERVAL 1 day + (a * 61) * INTERVAL 1 minute")
    else:
        spec = {"year": 2024, "month": {"$subtract": ["$a", 6]},
                "day": {"$subtract": ["$a", 10]},
                "hour": {"$multiply": ["$a", 25]}}
        base = "TIMESTAMP '2024-01-01 00:00:00'"
        off = ("+ (a - 6 - 1) * INTERVAL 1 month "
               "+ (a - 10 - 1) * INTERVAL 1 day + (a * 25) * INTERVAL 1 hour")
    if with_tz:
        spec["timezone"] = tz
        sql_e = f"timezone('{tz}', ({base} {off}))::TIMESTAMP"
    else:
        sql_e = f"({base} {off})"
    pipeline = [{"$project": {"rid": 1, "p": {"$dateFromParts": spec}}}]
    sql = f"SELECT rid, {sql_e} AS p FROM t"
    _run(eframes, pipeline, sql)


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(tz=st.sampled_from(_TZS), with_tz=st.booleans(), iso=st.booleans())
def test_fuzz_date_to_parts(eframes, tz, with_tz, iso):
    """$dateToParts calendar and iso8601 forms, flattened and compared
    part-by-part."""
    spec = {"date": "$ts"}
    wall = "ts"
    if with_tz:
        spec["timezone"] = tz
        wall = f"timezone('{tz}', ts::TIMESTAMPTZ)"
    if iso:
        spec["iso8601"] = True
        fields = [("isoWeekYear", f"isoyear({wall})"),
                  ("isoWeek", f"week({wall})"),
                  ("isoDayOfWeek", f"isodow({wall})")]
    else:
        fields = [("year", f"year({wall})"), ("month", f"month({wall})"),
                  ("day", f"dayofmonth({wall})")]
    fields += [("hour", f"hour({wall})"), ("minute", f"minute({wall})"),
               ("second", f"second({wall})")]
    pipeline = [
        {"$project": {"rid": 1, "pt": {"$dateToParts": spec}}},
        {"$project": {"rid": 1,
                      **{k: f"$pt.{k}" for k, _ in fields}}},
    ]
    sql = ("SELECT rid, "
           + ", ".join(f"{e} AS {k}" for k, e in fields)
           + " FROM t")
    _run(eframes, pipeline, sql)


# ------------------------------------------------- object-model fuzz
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(j=st.integers(-5, 5), k=st.integers(-9, 9))
def test_fuzz_get_set_field(eframes, j, k):
    """Sub-document construction + $getField/$setField (withField
    overwrite) + dot-path reads through the modified struct."""
    pipeline = [
        {"$addFields": {"o": {"x": {"$add": ["$a", j]}, "y": "$s"}}},
        {"$project": {
            "rid": 1,
            "gx": {"$getField": {"input": "$o", "field": "x"}},
            "o2": {"$setField": {"input": "$o", "field": "x",
                                 "value": {"$literal": k}}},
        }},
        {"$project": {"rid": 1, "gx": 1, "g2": "$o2.x", "gy": "$o2.y"}},
    ]
    sql = f"""
    SELECT rid, (a + {j}) AS gx, {k} AS g2, s AS gy FROM t
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------------ nested-path stages
@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(k=st.integers(-9, 9), deep=st.booleans())
def test_fuzz_nested_path_stages(eframes, k, deep):
    """Dotted-path $addFields (set/create a subfield, intermediates
    created as needed), $unset of a subfield, and exclusion-$project
    of a subfield — all were silent no-ops or raw analysis errors
    before round 5 (probe finds #7/#8/#9). Removed subfields are
    gone from the schema (reading one is a loud analysis error in
    the typed engine, not null)."""
    sdf, con = eframes
    target = "o.w.z" if deep else "o.z"
    pipeline = [
        {"$addFields": {"o": {"x": "$a", "y": "$s"}}},
        {"$addFields": {target: {"$add": ["$a", k]}}},
        {"$unset": "o.y"},
        {"$project": {"o.x": 0}},
    ]
    out = compile_pipeline(sdf, pipeline)
    o_fields = dict(zip(out.schema["o"].dataType.fieldNames(),
                        out.schema["o"].dataType.fields))
    assert "x" not in o_fields and "y" not in o_fields
    got = _norm([(r["rid"], (r["o"]["w"]["z"] if deep else r["o"]["z"]))
                 for r in out.select("rid", "o").collect()])
    want = _norm(con.execute(f"SELECT rid, a + {k} FROM t").fetchall())
    assert got == want


# ------------------------------------------- match-predicate fuzz
@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(v=st.integers(0, 9), vals=st.lists(st.integers(0, 9), min_size=1,
                                          max_size=3, unique=True),
       lo=st.integers(0, 8))
def test_fuzz_match_array_predicates(eframes, v, vals, lo):
    """$elemMatch (any element in a sub-range), $all, $nin and $size
    over the array column — a null array satisfies none of the
    positive predicates and $nin only via the Mongo missing≡null
    rule."""
    vals_sql = "[" + ", ".join(map(str, vals)) + "]"
    pipeline = [
        {"$match": {"arr": {"$elemMatch": {"$gte": lo, "$lt": lo + 3}}}},
        {"$project": {"rid": 1}},
    ]
    sql = f"""
    SELECT rid FROM t
    WHERE arr IS NOT NULL
      AND len(list_filter(arr, x -> x >= {lo} AND x < {lo + 3})) > 0
    """
    _run(eframes, pipeline, sql)
    pipeline2 = [
        {"$match": {"arr": {"$all": vals}}},
        {"$project": {"rid": 1}},
    ]
    sql2 = f"""
    SELECT rid FROM t
    WHERE arr IS NOT NULL
      AND len(list_filter({vals_sql},
              x -> list_contains(arr, x))) = {len(vals)}
    """
    _run(eframes, pipeline2, sql2)
    pipeline3 = [
        {"$match": {"$nor": [{"a": {"$in": vals}}, {"a": {"$gt": 15}}]}},
        {"$project": {"rid": 1}},
    ]
    # Mongo $nor: document matches when it fails EVERY clause; a null
    # `a` fails both positive predicates, so it IS selected
    sql3 = f"""
    SELECT rid FROM t
    WHERE NOT COALESCE(a IN ({", ".join(map(str, vals))}), FALSE)
      AND NOT COALESCE(a > 15, FALSE)
    """
    _run(eframes, pipeline3, sql3)


@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(n=st.integers(0, 4), m=st.integers(-4, 18))
def test_fuzz_match_size_expr(eframes, n, m):
    """$size equality match plus a $match {$expr} referencing two
    columns — the predicate space single-field matches can't reach."""
    pipeline = [
        {"$match": {"arr": {"$size": n}}},
        {"$match": {"$expr": {"$gt": [{"$size": "$arr"},
                                      {"$mod": ["$rid", 3]}]}}},
        {"$project": {"rid": 1}},
    ]
    # BSON total order: null > never true... but $size of a non-null
    # array is never null, and rows reaching the $expr passed $size=n
    sql = f"""
    SELECT rid FROM t
    WHERE len(arr) = {n} AND len(arr) > rid % 3
    """
    _run(eframes, pipeline, sql)


# ---------------------------------------------- $graphLookup stage
@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(mult=st.integers(1, 9), off=st.integers(0, 39),
       cut=st.integers(5, 40))
def test_fuzz_graph_stage_unbounded_restrict(spark, eframes, mult, off, cut):
    """$graphLookup with NO maxDepth (Mongo's exhaustive default —
    visited-set BFS terminates on these cyclic functional graphs) and
    restrictSearchWithMatch (excluded docs neither match nor relay),
    vs an unbounded recursive-CTE twin over the restricted doc set."""
    _, con = eframes
    n = 40
    docs = [(i, (i * mult + off) % n) for i in range(n)]
    u = spark.createDataFrame(docs, "id long, nxt long")
    starts = spark.createDataFrame([(i * 5,) for i in range(6)], "seed long")
    import pandas as pd
    con.register("gu", pd.DataFrame(docs, columns=["id", "nxt"]))
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline
    out = compile_pipeline(
        starts,
        [{"$graphLookup": {
            "from": "gu", "startWith": "$seed",
            "connectFromField": "nxt", "connectToField": "id",
            "as": "m", "restrictSearchWithMatch": {"id": {"$lt": cut}},
        }},
         {"$unwind": {"path": "$m", "preserveNullAndEmptyArrays": True}},
         {"$project": {"seed": 1, "hit": "$m.id"}}],
        collections={"gu": u},
    )
    got = sorted((r["seed"], r["hit"]) for r in out.collect())
    want = sorted(con.execute(f"""
        WITH RECURSIVE reach AS (
          SELECT i * 5 AS seed, i * 5 AS val FROM range(6) r(i)
          UNION
          SELECT r.seed, u.nxt FROM reach r
          JOIN gu u ON u.id = r.val AND u.id < {cut}
        ),
        hits AS (
          SELECT DISTINCT r.seed, u.id AS hit FROM reach r
          JOIN gu u ON u.id = r.val AND u.id < {cut}
        ),
        seeds AS (SELECT i * 5 AS seed FROM range(6) r(i))
        SELECT s.seed, h.hit FROM seeds s LEFT JOIN hits h USING (seed)
    """).fetchall())
    assert got == want, f"mult={mult} off={off} cut={cut}"


@settings(max_examples=10, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(mult=st.integers(1, 9), off=st.integers(0, 39),
       k=st.integers(1, 4))
def test_fuzz_graph_stage_depth_field(spark, eframes, mult, off, k):
    """depthField: each matched doc carries the recursion depth at
    which it was retrieved (0 for the initial startWith match,
    shortest-path depth thereafter)."""
    _, con = eframes
    n = 40
    docs = [(i, (i * mult + off) % n) for i in range(n)]
    u = spark.createDataFrame(docs, "id long, nxt long")
    starts = spark.createDataFrame([(i * 7,) for i in range(5)], "seed long")
    import pandas as pd
    con.register("gu", pd.DataFrame(docs, columns=["id", "nxt"]))
    from mongo_olap_spark.plans.pipeline_compiler import compile_pipeline
    out = compile_pipeline(
        starts,
        [{"$graphLookup": {
            "from": "gu", "startWith": "$seed",
            "connectFromField": "nxt", "connectToField": "id",
            "as": "m", "maxDepth": k, "depthField": "d"}},
         {"$unwind": "$m"},
         {"$project": {"seed": 1, "hit": "$m.id", "d": "$m.d"}}],
        collections={"gu": u},
    )
    got = sorted((r["seed"], r["hit"], r["d"]) for r in out.collect())
    want = sorted(con.execute(f"""
        WITH RECURSIVE walk AS (
          SELECT i * 7 AS seed, i * 7 AS val, 0 AS depth FROM range(5) r(i)
          UNION
          SELECT w.seed, u.nxt, w.depth + 1 FROM walk w
          JOIN gu u ON u.id = w.val WHERE w.depth < {k}
        ),
        vals AS (SELECT seed, val, MIN(depth) AS d FROM walk
                 WHERE val = seed OR depth > 0 GROUP BY 1, 2)
        SELECT v.seed, u.id AS hit, CAST(v.d AS BIGINT)
        FROM vals v JOIN gu u ON u.id = v.val
        WHERE v.val <> v.seed OR v.d = 0
    """).fetchall())
    assert got == want, f"mult={mult} off={off} k={k}"


# ---------------------------------------------------- bitwise fuzz
@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(k=st.integers(0, 255), j=st.integers(0, 255))
def test_fuzz_bitwise(eframes, k, j):
    """Mongo 6.3 $bitAnd/$bitOr/$bitXor (variadic) and $bitNot, null
    in null out, vs DuckDB's bit operators."""
    pipeline = [{"$project": {
        "rid": 1,
        "ba": {"$bitAnd": ["$a", k, j]},
        "bo": {"$bitOr": ["$a", k]},
        "bx": {"$bitXor": ["$a", k, j]},
        "bn": {"$bitNot": "$a"},
    }}]
    sql = f"""
    SELECT rid, a & {k} & {j} AS ba, a | {k} AS bo,
           xor(xor(a, {k}), {j}) AS bx, ~a AS bn
    FROM t
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------- deep-composition fuzz
@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(mult=st.integers(1, 6), direction=st.sampled_from([1, -1]))
def test_fuzz_lookup_unwind_window(spark, eframes, mult, direction):
    """match → $lookup → $unwind → $setWindowFields chain: a rank over
    the joined-and-exploded rows, vs a JOIN + window twin."""
    sdf, con = eframes
    import pandas as pd

    dim = _dim_rows(mult)
    u = spark.createDataFrame(dim or [(None, None)], "key int, v int")
    if not dim:
        u = u.filter("key IS NOT NULL")
    con.register("u", pd.DataFrame(dim, columns=["key", "v"]).astype(
        {"key": "Int64", "v": "Int64"}))
    d_sql = "ASC NULLS FIRST" if direction == 1 else "DESC NULLS LAST"
    pipeline = [
        {"$match": {"a": {"$exists": True}}},
        {"$project": {"rid": 1, "k": {"$mod": ["$a", 7]}}},
        {"$lookup": {"from": "u", "localField": "k",
                     "foreignField": "key", "as": "m"}},
        {"$unwind": "$m"},
        {"$setWindowFields": {
            "partitionBy": "$k",
            "sortBy": {"rid": direction, "m.v": 1},
            "output": {"rk": {"$documentNumber": {}},
                       "sv": {"$sum": "$m.v",
                              "window": {"documents": ["unbounded",
                                                       "current"]}}},
        }},
        {"$project": {"rid": 1, "vv": "$m.v", "rk": 1, "sv": 1}},
    ]
    sql = f"""
    WITH p AS (SELECT rid, a % 7 AS k FROM t WHERE a IS NOT NULL),
         j AS (SELECT p.rid, p.k, u.v FROM p JOIN u ON p.k = u.key)
    SELECT rid, v AS vv,
           ROW_NUMBER() OVER w AS rk,
           CAST(COALESCE(SUM(CAST(v AS DECIMAL(38,6))) OVER
               (PARTITION BY k ORDER BY rid {d_sql}, v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
               AS DOUBLE) AS sv
    FROM j WINDOW w AS (PARTITION BY k ORDER BY rid {d_sql}, v)
    """
    got = _norm([tuple(r) for r in compile_pipeline(
        sdf, pipeline, collections={"u": u}).collect()])
    want = _norm(con.execute(sql).fetchall())
    assert got == want, f"\npipeline={pipeline}\nsql={sql}"


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(step=st.integers(2, 5))
def test_fuzz_densify_fill_window(eframes, step):
    """densify → fill(locf) → window chain over the value grid: the
    engine's gap-fill story end-to-end vs a spine + IGNORE NULLS
    twin."""
    pipeline = [
        {"$match": {"a": {"$exists": True}}},
        {"$group": {"_id": "$a", "n": {"$sum": 1}}},
        {"$project": {"av": "$_id", "n": 1}},
        {"$densify": {"field": "av", "range": {"step": step,
                                               "bounds": "full"}}},
        {"$fill": {"sortBy": {"av": 1}, "output": {"n": {"method": "locf"}}}},
        {"$setWindowFields": {
            "sortBy": {"av": 1},
            "output": {"run": {"$sum": "$n",
                               "window": {"documents": ["unbounded",
                                                        "current"]}}},
        }},
        {"$project": {"av": 1, "n": 1, "run": 1}},
    ]
    sql = f"""
    WITH g AS (SELECT a AS av, COUNT(*) AS n FROM t
               WHERE a IS NOT NULL GROUP BY 1),
    b AS (SELECT min(av) AS d0, max(av) AS d1 FROM g),
    spine AS (SELECT unnest(generate_series(d0, d1, {step})) AS av FROM b),
    extra AS (SELECT av FROM spine WHERE av NOT IN (SELECT av FROM g)),
    u AS (SELECT av, n FROM g UNION ALL SELECT av, NULL FROM extra),
    f AS (SELECT av, last_value(n IGNORE NULLS) OVER
              (ORDER BY av ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW) AS n
          FROM u)
    SELECT av, n,
           CAST(COALESCE(SUM(CAST(n AS DECIMAL(38,6))) OVER
               (ORDER BY av ROWS BETWEEN UNBOUNDED PRECEDING AND
                CURRENT ROW), 0) AS DOUBLE) AS run
    FROM f
    """
    _run(eframes, pipeline, sql)


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(lo=st.integers(-5, 8), width=st.integers(1, 15), step=st.integers(1, 4))
def test_fuzz_densify_explicit_bounds(eframes, lo, width, step):
    """Explicit-bounds $densify: the spine runs [lo, hi) from lo at
    step, REGARDLESS of the data; documents outside the range pass
    through untouched."""
    hi = lo + width
    pipeline = [
        {"$project": {"rid": 1, "a": 1}},
        {"$densify": {"field": "a", "range": {"step": step,
                                              "bounds": [lo, hi]}}},
        {"$project": {"rid": 1, "a": 1}},
    ]
    sql = f"""
    WITH base AS (SELECT rid, a FROM t),
    spine AS (SELECT unnest(generate_series({lo}, {hi} - 1, {step})) AS a),
    extra AS (SELECT av.a FROM spine av
              WHERE av.a NOT IN (SELECT a FROM base WHERE a IS NOT NULL)),
    u AS (SELECT rid, a FROM base
          UNION ALL SELECT NULL, a FROM extra)
    SELECT rid, a FROM u
    """
    _run(eframes, pipeline, sql)


# ------------------------------------- window agg completeness fuzz
@settings(max_examples=25, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(lo=st.sampled_from(["unbounded", -2, -1, 0]),
       hi=st.sampled_from([0, 1, 2]),
       direction=st.sampled_from([1, -1]))
def test_fuzz_window_avg_first_last_push(eframes, lo, hi, direction):
    """$avg/$first/$last/$push as WINDOW functions over documents
    frames — the aggregate forms the stage-grammar window fuzz does
    not cover."""
    d_sql = "ASC NULLS FIRST" if direction == 1 else "DESC NULLS LAST"
    lo_sql = "UNBOUNDED PRECEDING" if lo == "unbounded" else (
        f"{-lo} PRECEDING" if lo < 0 else "CURRENT ROW")
    hi_sql = f"{hi} FOLLOWING" if hi > 0 else "CURRENT ROW"
    win = {"documents": [lo, hi]}
    pipeline = [{"$setWindowFields": {
        "partitionBy": "$s",
        "sortBy": {"d": direction, "rid": 1},
        "output": {
            "av": {"$avg": "$d", "window": win},
            "fi": {"$first": "$rid", "window": win},
            "la": {"$last": "$rid", "window": win},
            "pu": {"$push": "$rid", "window": win},
        },
    }}, {"$project": {"rid": 1, "av": 1, "fi": 1, "la": 1, "pu": 1}}]
    sql = f"""
    SELECT rid,
           CAST(SUM(CAST(d AS DECIMAL(38,6))) OVER w AS DOUBLE)
               / COUNT(d) OVER w AS av,
           first_value(rid) OVER w AS fi,
           last_value(rid) OVER w AS la,
           list(rid) OVER w AS pu
    FROM t
    WINDOW w AS (PARTITION BY s ORDER BY d {d_sql}, rid
                 ROWS BETWEEN {lo_sql} AND {hi_sql})
    """
    _run(eframes, pipeline, sql)


@settings(max_examples=15, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(part=st.booleans())
def test_fuzz_fill_linear(eframes, part):
    """$fill method:linear — interpolation on the sortBy VALUES, the
    twin spelled with the identical operation order so IEEE results
    match bit-for-bit."""
    fill = {"sortBy": {"rid": 1}, "output": {"d": {"method": "linear"}}}
    over = "ORDER BY rid"
    if part:
        fill["partitionBy"] = "$s"
        over = "PARTITION BY s " + over
    pipeline = [
        {"$project": {"rid": 1, "s": 1, "d": 1}},
        {"$fill": fill},
        {"$project": {"rid": 1, "d": 1}},
    ]
    sql = f"""
    WITH w AS (
      SELECT rid, d,
        last_value(d IGNORE NULLS) OVER
          ({over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        last_value(CASE WHEN d IS NOT NULL THEN rid END IGNORE NULLS) OVER
          ({over} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        first_value(d IGNORE NULLS) OVER
          ({over} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        first_value(CASE WHEN d IS NOT NULL THEN rid END IGNORE NULLS) OVER
          ({over} ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
      FROM t)
    SELECT rid,
           CASE WHEN d IS NOT NULL THEN d
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN pv + (nv - pv) * (rid - pt) / (nt - pt)
           END AS d
    FROM w
    """
    _run(eframes, pipeline, sql)


# ----------------------------------------------- odds-and-ends fuzz
@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(k=st.integers(-6, 6), j=st.integers(1, 5))
def test_fuzz_cmp_lenbytes_let(eframes, k, j):
    """$cmp (BSON total order: null smallest, never returns null),
    $strLenBytes (UTF-8 octets), and $let with an inner $map whose
    loop variable SHADOWS the let binding."""
    pipeline = [{"$project": {
        "rid": 1,
        "c1": {"$cmp": ["$a", k]},
        "c2": {"$cmp": [None, "$a"]},
        "lb": {"$strLenBytes": "$s"},
        "sh": {"$let": {"vars": {"x": j},
                        "in": {"$reduce": {
                            "input": {"$map": {"input": "$arr", "as": "x",
                                               "in": {"$multiply": ["$$x", 2]}}},
                            "initialValue": "$$x",
                            "in": {"$add": ["$$value", "$$this"]}}}}},
    }}]
    sql = f"""
    SELECT rid,
           CASE WHEN a IS NULL THEN -1
                WHEN a < {k} THEN -1 WHEN a > {k} THEN 1 ELSE 0 END AS c1,
           CASE WHEN a IS NULL THEN 0 ELSE -1 END AS c2,
           strlen(s) AS lb,
           CASE WHEN arr IS NULL THEN NULL
                ELSE {j} + COALESCE(list_sum(list_transform(arr, x -> x * 2)), 0)
           END AS sh
    FROM t
    """
    _run(eframes, pipeline, sql)


# ------------------------------------------------- nested $unwind
@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(preserve=st.booleans(), with_idx=st.booleans())
def test_fuzz_unwind_nested(eframes, preserve, with_idx):
    """$unwind of a NESTED array field ($o.tag): the element replaces
    the subfield inside the struct (no flat dot-named column), with
    preserveNullAndEmptyArrays and includeArrayIndex honored."""
    spec = {"path": "$o.tag"}
    if preserve:
        spec["preserveNullAndEmptyArrays"] = True
    if with_idx:
        spec["includeArrayIndex"] = "pos"
    pipeline = [
        {"$addFields": {"o": {"tag": "$arr", "y": "$a"}}},
        {"$unwind": spec},
        {"$project": {"rid": 1, "el": "$o.tag", "y": "$o.y",
                      **({"pos": 1} if with_idx else {})}},
    ]
    pos_sel = ", CAST(unnest(range(len(arr))) AS BIGINT) AS pos" \
        if with_idx else ""
    null_pos = ", NULL AS pos" if with_idx else ""
    sql = f"""
    WITH base AS (SELECT rid, arr, a FROM t)
    SELECT rid, unnest(arr) AS el, a AS y{pos_sel} FROM base
    """
    if preserve:
        sql += f"""
        UNION ALL
        SELECT rid, NULL AS el, a AS y{null_pos} FROM base
        WHERE arr IS NULL OR len(arr) = 0
        """
    _run(eframes, pipeline, sql)


# ----------------------------------------- $dateFromString handling
@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(bad=st.sampled_from(["nope", "2024-13-40 99:00:00", ""]),
       use_handlers=st.booleans())
def test_fuzz_date_from_string_errors(eframes, bad, use_handlers):
    """$dateFromString over a MIX of valid strings, null, and
    unparseable garbage: onError catches garbage, onNull catches
    null, and without handlers the engine's documented policy is
    null (try_to_timestamp), never a runtime throw."""
    fmt = "%Y-%m-%d %H:%M:%S"
    spec = {"dateString": "$str", "format": fmt}
    if use_handlers:
        spec["onError"] = {"$literal": "1999-01-01 00:00:00"}
        spec["onNull"] = {"$literal": "1888-01-01 00:00:00"}
    # str column: valid strftime for rid%3==0, garbage for rid%3==1,
    # null for rid%3==2
    pipeline = [
        {"$project": {"rid": 1, "str": {"$switch": {"branches": [
            {"case": {"$eq": [{"$mod": ["$rid", 3]}, 0]},
             "then": {"$dateToString": {"date": "$ts", "format": fmt}}},
            {"case": {"$eq": [{"$mod": ["$rid", 3]}, 1]},
             "then": {"$literal": bad}}],
            "default": None}}}},
        {"$project": {"rid": 1, "p": {"$dateFromString": spec}}},
    ]
    if use_handlers:
        # onNull fires on null INPUT; onError on unparseable non-null.
        # A null ts formatted to null ALSO counts as null input.
        p_sql = """CASE
          WHEN rid % 3 = 2 OR (rid % 3 = 0 AND ts IS NULL)
            THEN '1888-01-01 00:00:00'
          WHEN rid % 3 = 1 THEN '1999-01-01 00:00:00'
          ELSE CAST(date_trunc('second', ts) AS VARCHAR) END"""
    else:
        p_sql = """CASE WHEN rid % 3 = 0
                        THEN CAST(date_trunc('second', ts) AS VARCHAR)
                   END"""
    sql = f"SELECT rid, {p_sql} AS p FROM t"
    sdf, con = eframes
    got = [(r["rid"], None if r["p"] is None else str(r["p"]))
           for r in compile_pipeline(sdf, pipeline).collect()]
    want = [(r[0], r[1]) for r in con.execute(sql).fetchall()]
    assert sorted(got) == sorted(want), f"bad={bad!r} handlers={use_handlers}"


# --------------------------------------------- group→lookup chain
@settings(max_examples=12, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(mult=st.integers(0, 6))
def test_fuzz_group_then_lookup(spark, eframes, mult):
    """$group whose _id then feeds a $lookup — aggregation output as
    the local side of a join, with the array contract intact."""
    sdf, con = eframes
    import pandas as pd

    dim = _dim_rows(mult)
    u = spark.createDataFrame(dim or [(None, None)], "key int, v int")
    if not dim:
        u = u.filter("key IS NOT NULL")
    con.register("u", pd.DataFrame(dim, columns=["key", "v"]).astype(
        {"key": "Int64", "v": "Int64"}))
    pipeline = [
        {"$match": {"a": {"$exists": True}}},
        {"$group": {"_id": {"$mod": ["$a", 7]}, "cnt": {"$sum": 1}}},
        {"$lookup": {"from": "u", "localField": "_id",
                     "foreignField": "key", "as": "m"}},
        {"$project": {"k": "$_id", "cnt": 1, "nm": {"$size": "$m"}}},
    ]
    sql = """
    WITH g AS (SELECT a % 7 AS k, COUNT(*) AS cnt FROM t
               WHERE a IS NOT NULL GROUP BY 1)
    SELECT g.k, g.cnt, COUNT(u.key) AS nm
    FROM g LEFT JOIN u ON g.k = u.key
    GROUP BY g.k, g.cnt
    """
    got = _norm([tuple(r) for r in compile_pipeline(
        sdf, pipeline, collections={"u": u}).collect()])
    want = _norm(con.execute(sql).fetchall())
    assert got == want


# ------------------------------- expression aggregate family (r6)
# $max/$min/$sum/$avg/$stdDev*/$median/$percentile/$first/$last as
# EXPRESSION operators over arrays, against DuckDB list aggregates (an
# independent model: list_aggregate skips nulls natively). Element
# nulls injected via $map+$cond; fractional outputs rounded to 6dp on
# both sides to absorb summation-order ulps.
_EXPR_AGG = [
    ("$max", "list_aggregate({0}, 'max')", False),
    ("$min", "list_aggregate({0}, 'min')", False),
    ("$sum", "COALESCE(list_aggregate({0}, 'sum'), 0)", False),
    ("$avg", "list_aggregate({0}, 'avg')", True),
    ("$stdDevPop", "list_aggregate({0}, 'stddev_pop')", True),
    ("$stdDevSamp", "list_aggregate({0}, 'stddev_samp')", True),
    ("$median", "list_aggregate({0}, 'median')", True),
    ("$first", "{0}[1]", False),
    ("$last", "{0}[-1]", False),
]


@settings(max_examples=30, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(agg=st.sampled_from(_EXPR_AGG), m=st.integers(2, 4),
       p=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
       use_pct=st.booleans())
def test_fuzz_expr_aggregates(eframes, agg, m, p, use_pct):
    op, twin, frac = agg
    null_map = {"$map": {"input": "$arr", "in": {"$cond": [
        {"$eq": [{"$mod": ["$$this", m]}, {"$literal": 0}]},
        None, "$$this"]}}}
    arr_sql = (f"list_transform(arr, x -> "
               f"CASE WHEN x % {m} = 0 THEN NULL ELSE x END)")
    if use_pct:
        spec = {"$arrayElemAt": [
            {"$percentile": {"input": null_map, "p": [p],
                             "method": "approximate"}},
            {"$literal": 0}]}
        val_sql = f"list_aggregate({arr_sql}, 'quantile_cont', {p})"
        frac = True
    elif op == "$median":
        spec = {"$median": {"input": null_map, "method": "approximate"}}
        val_sql = twin.format(arr_sql)
    else:
        spec = {op: null_map}
        val_sql = twin.format(arr_sql)
    if frac:
        spec = {"$round": [spec, 6]}
        val_sql = f"ROUND(CAST({val_sql} AS DOUBLE), 6)"
    pipeline = [{"$project": {"rid": 1, "v": spec}}]
    sql = f"SELECT rid, {val_sql} AS v FROM t"
    _run(eframes, pipeline, sql)


# -------------------------- null-safe + multikey $lookup fuzz (r6)
# The simple localField/foreignField path became null-safe in r6 and
# gained Mongo's multikey form (array localField matches any element;
# null/empty arrays match foreign nulls). Dim tables here CONTAIN null
# keys; twins join with IS NOT DISTINCT FROM and model the
# distinct-element explode exactly.

@settings(max_examples=20, deadline=None, derandomize=True,
          suppress_health_check=list(HealthCheck))
@given(mult=st.integers(0, 4), nullkeys=st.integers(0, 2),
       side=st.sampled_from(["scalar", "local_arr", "foreign_arr"]))
def test_fuzz_lookup_nullsafe_multikey(spark, eframes, mult, nullkeys, side):
    sdf, con = eframes
    import pandas as pd

    if side == "foreign_arr":
        # array-keyed dim: each doc matchable via any distinct element;
        # null-key rows become null arrays, plus one empty-array row
        dim = [([k, (k * 2) % 7], v) for k, v in _dim_rows(mult)]
        dim += [(None, 100 + i) for i in range(nullkeys)]
        if nullkeys > 1:
            dim.append(([], 200))
        u = spark.createDataFrame(dim or [(None, None)],
                                  "key array<int>, v int")
        if not dim:
            u = u.filter("v IS NOT NULL")
        con.register("u", pd.DataFrame(dim, columns=["key", "v"]).astype(
            {"v": "Int64"}))
        f_el = ("SELECT unnest(CASE WHEN key IS NULL OR len(key) = 0 "
                "THEN [CAST(NULL AS INTEGER)] ELSE list_distinct(key) END)"
                " AS fk, v FROM u")
    else:
        dim = _dim_rows(mult) + [(None, 100 + i) for i in range(nullkeys)]
        u = spark.createDataFrame(dim or [(None, None)], "key int, v int")
        if not dim:
            u = u.filter("v IS NOT NULL")
        con.register("u", pd.DataFrame(dim, columns=["key", "v"]).astype(
            {"key": "Int64", "v": "Int64"}))
        f_el = "SELECT key AS fk, v FROM u"
    shape = (
        {"ka": {"$map": {"input": "$arr", "in": {"$mod": ["$$this", 7]}}}}
        if side == "local_arr" else {"ka": {"$mod": ["$a", 7]}}
    )
    pipeline = [
        {"$project": {"rid": 1, **shape}},
        {"$lookup": {"from": "u", "localField": "ka",
                     "foreignField": "key", "as": "m"}},
        {"$project": {"rid": 1, "n": {"$size": "$m"},
                      "sv": {"$sum": {"$map": {"input": "$m",
                                               "in": "$$this.v"}}}}},
    ]
    if side == "local_arr":
        p = ("SELECT rid, unnest(CASE WHEN ka IS NULL OR len(ka) = 0 "
             "THEN [CAST(NULL AS INTEGER)] ELSE list_distinct(ka) END) AS el "
             "FROM (SELECT rid, list_transform(arr, x -> x % 7) AS ka FROM t)")
    else:
        p = "SELECT rid, a % 7 AS el FROM t"
    sql = f"""
    WITH e AS ({p}), f AS ({f_el}),
         j AS (SELECT e.rid, f.v
               FROM e LEFT JOIN f ON e.el IS NOT DISTINCT FROM f.fk)
    SELECT rid, CAST(COUNT(v) AS INT) AS n,
           CAST(COALESCE(SUM(v), 0) AS BIGINT) AS sv
    FROM j GROUP BY 1
    """
    got = _norm([tuple(r) for r in compile_pipeline(
        sdf, pipeline, collections={"u": u}).collect()])
    want = _norm(con.execute(sql).fetchall())
    assert got == want, f"\nside={side} nullkeys={nullkeys}\nsql={sql}"
