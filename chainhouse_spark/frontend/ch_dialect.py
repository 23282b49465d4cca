"""ClickHouse SQL dialect → Spark SQL translation.

The reference's analytical surface is "whatever SQL its ClickHouse holds"
(`SURVEY.md` §2.6) — so its users write the ClickHouse dialect:
`toStartOfHour`, `countIf`, `quantile(0.5)(x)`, `arrayJoin`, `PREWHERE`,
trailing `FORMAT`/`SETTINGS`. This module lets those queries run on the
Spark engine unchanged: `ch_sql(spark, text)` translates the documented
subset below to Spark SQL and executes it.

Deliberately a token-level rewriter, not a full parser: every supported
construct is a function-call rename / argument reshape or a statement-level
keyword substitution, which a quote- and paren-aware scanner handles
exactly. Anything outside the supported set passes through untouched (the
dialects share most of ANSI), except constructs whose silent pass-through
would CHANGE semantics — those raise `CHTranslationError` (e.g.
`WITH TOTALS`, whose extra summary row has no Spark equivalent).

Supported rewrites (ClickHouse → Spark):

  type casts      toInt8/16/32/64, toUInt8/16/32, toFloat32/64, toString,
                  toDate, toDateTime, toDecimal32/64/128(x, s)
                  (toUInt64 → DECIMAL(20, 0): the full unsigned range does
                  not fit BIGINT)
  time buckets    toStartOfMinute/Hour/Day/Week/Month/Quarter/Year,
                  toYYYYMM, toHour/toMinute/toSecond, toDayOfMonth,
                  toMonth, toYear, toDayOfWeek (ISO-corrected), now, today,
                  toUnixTimestamp/fromUnixTimestamp,
                  dateDiff → timestampdiff, addDays/addHours/… and
                  subtractDays/… → timestampadd (timestamp-preserving —
                  date_add would degrade timestamps to dates)
  conditionals    if, multiIf, ifNull, nullIf (renames / CASE expansion)
  agg combinators countIf, sumIf, avgIf, minIf, maxIf
  parametric aggs quantile(p)(x) → percentile_approx,
                  quantileExact(p)(x) → percentile,
                  quantileTDigest/quantileTiming (+ plurals) →
                  percentile_approx (approximate → approximate),
                  uniqUpTo(N)(x...) → LEAST(count distinct, N + 1)
  set aggs        uniq → approx_count_distinct, uniqExact →
                  count(distinct ...), groupArray → collect_list,
                  groupUniqArray → collect_set, any/anyLast → any_value,
                  argMax/argMin → max_by/min_by, count() → count(*),
                  groupBitmap → count(distinct ...) (bitmap cardinality
                  of an int column IS the exact distinct count)
  arrays          arrayJoin → explode, has → array_contains,
                  indexOf → array_position, arrayMap/arrayFilter →
                  transform/filter (lambda moves to second position),
                  arraySum, arrayDistinct/arrayUniq/arrayConcat/
                  arrayReverse/arrayFlatten/arraySort,
                  splitByChar(c, s) → split(s, c)
  strings         position → instr (same argument order), lengthUTF8 →
                  char_length, startsWith/endsWith, trimBoth/Left/Right,
                  leftPad/rightPad, lowerUTF8/upperUTF8,
                  replaceAll → replace, replaceRegexpAll → regexp_replace
  regex           match → RLIKE, extract/extractAll → regexp_extract(_all)
                  (capture-group presence detected from the literal pattern)
  JSON            JSONExtractString/Int/Float/Bool(j, keys...) →
                  get_json_object + cast, JSONHas → IS NOT NULL,
                  JSONLength → json_array_length
  datetime        formatDateTime → date_format (%-codes converted to Java
                  pattern letters; literal letter runs quoted),
                  toStartOfInterval(ts, INTERVAL n unit) → epoch-floor
                  arithmetic for second/minute/hour/day units
  arithmetic      plus/minus/multiply/divide/modulo → operators,
                  intDiv → DIV, negate → unary minus,
                  bitAnd/Or/Xor/Not, bitShiftLeft/Right → operators
  bit aggs        groupBitAnd/Or/Xor → bit_and/bit_or/bit_xor
  arrays (more)   arrayExists/arrayAll → exists/forall, arrayCount →
                  size(filter(...)), countEqual, arrayEnumerate →
                  sequence(1, size), arraySlice → slice, arrayElement →
                  element_at, arrayPushBack/Front, range → sequence,
                  materialize(x) → x
  parametric aggs quantiles(p, ...)(x) → percentile_approx(x, array(...)),
                  quantilesExact → percentile
  URL             protocol/domain/domainWithoutWWW/topLevelDomain/path/
                  pathFull/queryString/fragment/extractURLParameter →
                  parse_url parts; cutQueryString/cutFragment → regex cuts
  IP              IPv4StringToNum/IPv4NumToString (octet folds),
                  isIPv4String → anchored octet regex
  strings (more)  countSubstrings → length-difference fold, splitByString
                  (literal separator, regex-quoted) → split
  arrays (yet more) arrayFirst/arrayFirstIndex → try_element_at(filter),
                  toStartOfFiveMinutes/TenMinutes/FifteenMinutes →
                  epoch-floor
  statement       PREWHERE → WHERE; trailing FORMAT <name> and
                  SETTINGS ... stripped; [LEFT] ARRAY JOIN expr AS alias →
                  LATERAL VIEW [OUTER] EXPLODE (bare/multi-array forms
                  raise: identifier rebinding / lockstep zip semantics);
                  ORDER BY o LIMIT n BY g [LIMIT m] → ranked subquery
                  (row_number over (PARTITION BY g ORDER BY o) <= n;
                  no-ORDER-BY / offset / subquery forms raise);
                  QUALIFY pred → subquery hop + WHERE (predicate must
                  reference SELECT-list aliases; inline OVER(...) in the
                  predicate / subquery forms raise)

  statement (r10)  GROUP BY k... WITH TOTALS → GROUP BY GROUPING SETS
                  ((k...), ()) — the grand-total row arrives in-band with
                  NULL keys (Spark's rollup convention; ClickHouse ships
                  it out-of-band with default-value keys). HAVING +
                  WITH TOTALS raises: ClickHouse's totals_mode setting
                  makes the totals row's relationship to HAVING
                  configuration-dependent, so no single rewrite is
                  faithful. ROLLUP/CUBE + TOTALS raises (the () set is
                  already in ROLLUP/CUBE).
                  FROM t SAMPLE f (fraction or a/b) → deterministic md5
                  hash-gate subquery on the table's declared sampling key
                  (SAMPLE_KEYS registry — the analog of the sampling key
                  ClickHouse declares in DDL): pmod(32-bit md5 prefix of
                  the key, den) < num. Deterministic and repeatable across
                  engines (ClickHouse's SAMPLE is intHash32-based and
                  storage-defined, so exact row parity with ClickHouse is
                  impossible by construction; the CONTRACT — a consistent,
                  key-coherent ~f subset — is preserved). Row-count form
                  (SAMPLE 10000) and SAMPLE ... OFFSET raise.
  parametric (r10) topK(k)(x) → exact deterministic top-k by frequency
                  (count desc, value asc tie-break) built from
                  collect_list + higher-order functions. NULLs are
                  skipped (collect_list drops them; same as ClickHouse).
                  Exact where ClickHouse's topK is approximate — a
                  deterministic upgrade, per the module's "never silently
                  change values" rule it REPLACES the sketch rather than
                  imitating its error. Memory is O(group values) on the
                  agg buffer: fine for grouped use with bounded groups;
                  for whole-table heavy hitters at scale use the
                  topk_heavy_hitters operator (queries/sketches.py).

Unsupported-with-error: cityHash64/sipHash64/halfMD5/
farmHash64 (different algorithms — a silent rename would change results;
use xxhash64/md5 explicitly), rand/rand64 (ClickHouse
returns uniform UInt32/64, Spark rand() returns [0,1) — a silent rename
would change every value), WITH TOTALS combined with HAVING (totals_mode-
dependent), SAMPLE with OFFSET or a row-count argument,
dictGet (no external dictionaries — join the dimension table).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession


class CHTranslationError(ValueError):
    """A ClickHouse construct whose silent pass-through would change
    semantics (or that cannot be expressed) was found."""


# -- scanner helpers --------------------------------------------------------


def _skip_string(s: str, i: int) -> int:
    """i points at a quote char; return index just past the closing quote
    (doubling and backslash escapes honored)."""
    q = s[i]
    j = i + 1
    while j < len(s):
        if s[j] == "\\" and q != "`":
            j += 2
            continue
        if s[j] == q:
            if j + 1 < len(s) and s[j + 1] == q:  # doubled quote
                j += 2
                continue
            return j + 1
        j += 1
    raise CHTranslationError(f"unterminated {q} string at offset {i}")


def _matching_paren(s: str, i: int) -> int:
    """i points at '('; return index of its matching ')'."""
    depth = 0
    j = i
    while j < len(s):
        c = s[j]
        if c in "'\"`":
            j = _skip_string(s, j)
            continue
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return j
        j += 1
    raise CHTranslationError(f"unbalanced parentheses at offset {i}")


def _split_args(s: str) -> list[str]:
    """Split on top-level commas, respecting quotes and parens."""
    args: list[str] = []
    depth = 0
    start = 0
    j = 0
    while j < len(s):
        c = s[j]
        if c in "'\"`":
            j = _skip_string(s, j)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            args.append(s[start:j].strip())
            start = j + 1
        j += 1
    tail = s[start:].strip()
    if tail or args:
        args.append(tail)
    return args


# -- call rewrites ----------------------------------------------------------

_CAST = {
    "toint8": "TINYINT",
    "toint16": "SMALLINT",
    "toint32": "INT",
    "toint64": "BIGINT",
    "touint8": "SMALLINT",
    "touint16": "INT",
    "touint32": "BIGINT",
    "touint64": "DECIMAL(20, 0)",
    "tofloat32": "FLOAT",
    "tofloat64": "DOUBLE",
    "tostring": "STRING",
    "todate": "DATE",
    "todatetime": "TIMESTAMP",
}

_TRUNC = {
    "tostartofminute": "MINUTE",
    "tostartofhour": "HOUR",
    "tostartofday": "DAY",
    "tomonday": "WEEK",  # both mean the preceding Monday
    "tostartofmonth": "MONTH",
    "tostartofquarter": "QUARTER",
    "tostartofyear": "YEAR",
}

_PART = {
    "tohour": "HOUR",
    "tominute": "MINUTE",
    "tosecond": "SECOND",
    "todayofmonth": "DAY",
    "tomonth": "MONTH",
    "toyear": "YEAR",
    "toquarter": "QUARTER",
    "todayofyear": "DAYOFYEAR",
}

_RENAME = {
    "lowerutf8": "LOWER",
    "upperutf8": "UPPER",
    "replaceregexpall": "REGEXP_REPLACE",
    "replaceall": "REPLACE",
    "groupbitand": "BIT_AND",
    "groupbitor": "BIT_OR",
    "groupbitxor": "BIT_XOR",
    "arrayslice": "SLICE",
    "arrayelement": "ELEMENT_AT",
    "ifnull": "IFNULL",
    "nullif": "NULLIF",
    "if": "IF",
    "uniq": "APPROX_COUNT_DISTINCT",
    "grouparray": "COLLECT_LIST",
    "groupuniqarray": "COLLECT_SET",
    "any": "ANY_VALUE",
    "anylast": "ANY_VALUE",
    "argmax": "MAX_BY",
    "argmin": "MIN_BY",
    "arrayjoin": "EXPLODE",
    "has": "ARRAY_CONTAINS",
    "indexof": "ARRAY_POSITION",
    "arraydistinct": "ARRAY_DISTINCT",
    "arrayconcat": "CONCAT",
    "arrayreverse": "REVERSE",
    "arrayflatten": "FLATTEN",
    "position": "INSTR",
    "lengthutf8": "CHAR_LENGTH",
    "startswith": "STARTSWITH",
    "endswith": "ENDSWITH",
    "trimboth": "TRIM",
    "trimleft": "LTRIM",
    "trimright": "RTRIM",
    "leftpad": "LPAD",
    "rightpad": "RPAD",
    "now": "CURRENT_TIMESTAMP",
    "today": "CURRENT_DATE",
    "tounixtimestamp": "UNIX_TIMESTAMP",
    "fromunixtimestamp": "TIMESTAMP_SECONDS",  # NOT from_unixtime (string)
    "arraystringconcat": "ARRAY_JOIN",
    "substringutf8": "SUBSTRING",
    "arraymin": "ARRAY_MIN",
    "arraymax": "ARRAY_MAX",
    "hasany": "ARRAYS_OVERLAP",
    "mapkeys": "MAP_KEYS",
    "mapvalues": "MAP_VALUES",
    "mapcontains": "MAP_CONTAINS_KEY",
    "reverseutf8": "REVERSE",
    "base64encode": "BASE64",
    "bitcount": "BIT_COUNT",
    "roundbankers": "BROUND",
    "concatwithseparator": "CONCAT_WS",
    "tuple": "STRUCT",
}

# Arithmetic as functions (ClickHouse allows plus(a, b) etc.): rewrite to
# the operator form, parenthesized.
_ARITH = {"plus": "+", "minus": "-", "multiply": "*", "divide": "/",
          "modulo": "%"}

_IF_AGG = {"countif": "COUNT", "sumif": "SUM", "avgif": "AVG",
           "minif": "MIN", "maxif": "MAX"}

# Aggregates whose -If combinator reduces to NULL-gating the argument
# (every Spark agg here skips NULLs). Single-argument aggs only — argMaxIf
# etc. would need the condition applied across BOTH args; uniqExactIf has
# its own COUNT(DISTINCT ...) shape below.
_GENERIC_IF_AGG = {
    "uniq": "APPROX_COUNT_DISTINCT",
    "grouparray": "COLLECT_LIST",
    "groupuniqarray": "COLLECT_SET",
    "stddevpop": "STDDEV_POP",
    "stddevsamp": "STDDEV_SAMP",
    "varpop": "VAR_POP",
    "varsamp": "VAR_SAMP",
    "median": "MEDIAN",
}

# toIntervalX(n) -> MAKE_DT_INTERVAL/MAKE_YM_INTERVAL with n in the right
# slot: (slot index, constructor, constructor arity).
_INTERVAL_CTOR = {
    "tointervalday": (0, "MAKE_DT_INTERVAL", 1),
    "tointervalhour": (1, "MAKE_DT_INTERVAL", 2),
    "tointervalminute": (2, "MAKE_DT_INTERVAL", 3),
    "tointervalsecond": (3, "MAKE_DT_INTERVAL", 4),
    "tointervalyear": (0, "MAKE_YM_INTERVAL", 1),
    "tointervalmonth": (1, "MAKE_YM_INTERVAL", 2),
}

_UNSUPPORTED = {
    "cityhash64": "different hash algorithm — use xxhash64()/md5() explicitly",
    "siphash64": "different hash algorithm — use xxhash64()/md5() explicitly",
    "halfmd5": "different hash algorithm — use xxhash64()/md5() explicitly",
    "farmhash64": "different hash algorithm — use xxhash64()/md5() explicitly",
    "uniqcombined": "sketch-specific — use uniq() (approx_count_distinct)",
    "uniqcombined64": "sketch-specific — use uniq() (approx_count_distinct)",
    "uniqtheta": "sketch-specific — use uniq(), or the exactly-replayable "
                 "register HLL / theta set-op queries (queries/sketches.py)",
    "topkweighted": "approximate weighted heavy hitters — aggregate the "
                    "weights exactly (SUM(w) GROUP BY key ORDER BY 1 DESC "
                    "LIMIT k) or see topk_heavy_hitters (queries/sketches.py)",
    "arraycumsum": "running-sum type depends on the element type; state it "
                   "explicitly: TRANSFORM(a, (_x, _i) -> AGGREGATE("
                   "SLICE(a, 1, _i + 1), CAST(0 AS BIGINT), (s, v) -> s + v))",
    "rand": "ClickHouse rand() is a uniform UInt32; Spark rand() is [0,1) — "
            "a silent rename would change every value. Use rand() on a "
            "Spark session directly and scale explicitly",
    "rand64": "ClickHouse rand64() is a uniform UInt64 — see rand()",
    "topk": "write the parametric form topK(k)(x) — it translates to an "
            "exact deterministic top-k by frequency; for whole-table "
            "heavy hitters at scale use the topk_heavy_hitters operator "
            "(queries/sketches.py)",
    "dictget": "no external dictionaries — join the dimension table "
               "(broadcast joins make this free for dictionary-sized sides)",
    # Behavioral-analytics parametric aggregates: each has a tested Spark
    # analogue in queries/funnel.py — a token-level rewrite cannot express
    # their per-user ordered-state semantics in one expression.
    "windowfunnel": "use the step-funnel analogue (queries/funnel.py::"
                    "funnel_steps — window anchored at first step, oracled)",
    "sequencematch": "use the regex event-pattern analogue (queries/"
                     "funnel.py::sequence_match_regex, oracled)",
    "sequencecount": "use the ordered A-then-B pair counter (queries/"
                     "funnel.py::sequence_pairs_click_purchase, oracled)",
    "retention": "use the exact retention(cond1..condN) analogue "
                 "(queries/funnel.py::funnel_retention_conditions — "
                 "r[i] = cond1 AND cond_i per user, oracled) or the weekly "
                 "cohort matrix (retention_weekly)",
    "grouparraymovingavg": "use a window frame: AVG(x) OVER (ORDER BY ts "
                           "ROWS BETWEEN n PRECEDING AND CURRENT ROW)",
    "summap": "key-wise map merging is the explode/sum/rebuild shape — see "
              "queries/aggregates.py::agg_sum_map_merge (oracled)",
    "minmap": "see sumMap — same explode/aggregate/rebuild recipe with MIN",
    "maxmap": "see sumMap — same explode/aggregate/rebuild recipe with MAX",
    "grouparraymovingsum": "use a window frame: SUM(x) OVER (ORDER BY ts "
                           "ROWS BETWEEN n PRECEDING AND CURRENT ROW)",
}

_PARAMETRIC = {"quantile": "PERCENTILE_APPROX", "quantileexact": "PERCENTILE",
               "quantiles": "PERCENTILE_APPROX", "quantilesexact": "PERCENTILE",
               # approximate -> approximate: same contract as quantile();
               # ClickHouse's t-digest/timing sketches and Spark's
               # percentile_approx all answer "p-quantile, approximately"
               "quantiletdigest": "PERCENTILE_APPROX",
               "quantilestdigest": "PERCENTILE_APPROX",
               "quantiletiming": "PERCENTILE_APPROX",
               "quantilestiming": "PERCENTILE_APPROX"}
_PARAMETRIC_PLURAL = {"quantiles", "quantilesexact", "quantilestdigest",
                      "quantilestiming"}

# ClickHouse formatDateTime %-codes -> Java/Spark datetime pattern letters.
# (ClickHouse's set, NOT MySQL's: %M is minute, not month name.)
_FMT_CODES = {
    "Y": "yyyy", "y": "yy", "m": "MM", "d": "dd", "H": "HH", "I": "hh",
    "M": "mm", "S": "ss", "F": "yyyy-MM-dd", "T": "HH:mm:ss", "j": "DDD",
    "a": "EEE", "b": "MMM", "p": "a", "Q": "Q",
}

# %-codes with no output-identical Java pattern: a rename would silently
# change the rendered text (module contract: raise instead).
_FMT_UNSUPPORTED = {
    "e": "%e is a SPACE-padded day-of-month (' 5'); Java has no "
         "space-padded field — use %d (zero-padded) explicitly",
}


def _convert_fmt(fmt: str) -> str:
    """ClickHouse %-format string -> Java pattern. Literal runs containing
    letters are single-quoted (Java interprets bare letters as pattern
    fields — the classic silent-corruption path)."""
    out: list[str] = []
    lit: list[str] = []

    def flush() -> None:
        if lit:
            s = "".join(lit)
            if any(c.isalpha() for c in s):
                out.append("'" + s.replace("'", "''") + "'")
            else:
                out.append(s)
            lit.clear()

    i = 0
    while i < len(fmt):
        if fmt[i] == "%":
            if i + 1 >= len(fmt):
                raise CHTranslationError("formatDateTime: trailing % in format")
            code = fmt[i + 1]
            if code == "%":
                lit.append("%")
            else:
                if code in _FMT_UNSUPPORTED:
                    raise CHTranslationError(
                        f"formatDateTime: {_FMT_UNSUPPORTED[code]}"
                    )
                if code not in _FMT_CODES:
                    raise CHTranslationError(
                        f"formatDateTime: unsupported %-code %{code}"
                    )
                flush()
                out.append(_FMT_CODES[code])
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


def _string_literal(arg: str) -> str | None:
    """If arg is a single-quoted SQL string literal, return its contents
    (quote-doubling undone); else None."""
    a = arg.strip()
    if len(a) >= 2 and a[0] == "'" and a[-1] == "'":
        inner = a[1:-1]
        # reject if the quote at the end actually closes an earlier string
        if "'" in inner.replace("''", ""):
            return None
        return inner.replace("''", "'")
    return None


# ClickHouse URL-part accessors -> Spark PARSE_URL part names. ClickHouse's
# scheme-less tolerance ('example.com/x') is NOT reproduced — PARSE_URL
# needs a scheme, and a silent empty-result divergence is acceptable only
# because both engines return NULL-ish for unparseable inputs.
_URL_PART = {
    "protocol": "PROTOCOL",
    "domain": "HOST",
    "path": "PATH",
    "pathfull": "FILE",
    "querystring": "QUERY",
    "fragment": "REF",
}

_REGEX_GROUP = re.compile(r"(?<!\\)\((?!\?)")

_INTERVAL = re.compile(
    r"^\s*INTERVAL\s+(\d+)\s+(SECOND|MINUTE|HOUR|DAY)S?\s*$", re.IGNORECASE
)
_INTERVAL_SECONDS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _rewrite_call(name: str, args: list[str]) -> str:
    low = name.lower()
    if low in _UNSUPPORTED:
        raise CHTranslationError(f"{name}(): {_UNSUPPORTED[low]}")
    if low == "count" and not args:
        return "COUNT(*)"  # parameterless count() is idiomatic ClickHouse
    if low in _ARITH:
        if len(args) != 2:
            raise CHTranslationError(f"{name}(a, b) takes two arguments")
        return f"({args[0]} {_ARITH[low]} {args[1]})"
    if low == "intdiv":
        if len(args) != 2:
            raise CHTranslationError("intDiv(a, b) takes two arguments")
        return f"({args[0]} DIV {args[1]})"
    if low == "arrayuniq":
        if len(args) != 1:
            raise CHTranslationError("arrayUniq(arr) takes one argument")
        return f"SIZE(ARRAY_DISTINCT({args[0]}))"
    if low == "arraysort" and len(args) == 2:
        # lambda-first variant: arraySort(f, a) -> sort by key via struct
        raise CHTranslationError(
            "arraySort(lambda, arr) has no direct Spark twin — use "
            "array_sort(arr, (l, r) -> comparator) with an explicit "
            "two-argument comparator"
        )
    if low == "arraysort":
        return f"ARRAY_SORT({args[0]})"
    if low in _CAST:
        if len(args) != 1:
            raise CHTranslationError(f"{name}() takes one argument")
        return f"CAST({args[0]} AS {_CAST[low]})"
    if low == "todatetime64":
        if len(args) not in (1, 2):
            raise CHTranslationError("toDateTime64(x[, precision])")
        return f"CAST({args[0]} AS TIMESTAMP)"
    if low == "todate32":
        if len(args) != 1:
            raise CHTranslationError("toDate32(x) takes one argument")
        return f"CAST({args[0]} AS DATE)"
    if low == "arrayzip":
        return f"ARRAYS_ZIP({', '.join(args)})"
    if low in ("todecimal32", "todecimal64", "todecimal128"):
        if len(args) != 2:
            raise CHTranslationError(f"{name}(x, scale) takes two arguments")
        digits = {"todecimal32": 9, "todecimal64": 18, "todecimal128": 38}[low]
        return f"CAST({args[0]} AS DECIMAL({digits}, {args[1]}))"
    if low in _TRUNC:
        return f"DATE_TRUNC('{_TRUNC[low]}', {args[0]})"
    if low in _PART:
        return f"{_PART[low]}({args[0]})"
    if low == "toyyyymm":
        return f"CAST(DATE_FORMAT({args[0]}, 'yyyyMM') AS INT)"
    if low == "datediff":
        # ClickHouse dateDiff('day', start, end); Spark TIMESTAMPDIFF takes
        # the unit as a bare identifier.
        if len(args) != 3:
            raise CHTranslationError("dateDiff(unit, start, end) takes three arguments")
        unit = args[0].strip("'\"").upper()
        return f"TIMESTAMPDIFF({unit}, {args[1]}, {args[2]})"
    if low in ("adddays", "addhours", "addminutes", "addseconds",
               "addmonths", "addyears", "addweeks"):
        if len(args) != 2:
            raise CHTranslationError(f"{name}(ts, n) takes two arguments")
        unit = low[len("add"):-1].upper()  # addDays -> DAY
        return f"TIMESTAMPADD({unit}, {args[1]}, {args[0]})"
    if low in ("subtractdays", "subtracthours", "subtractminutes",
               "subtractseconds", "subtractmonths", "subtractyears",
               "subtractweeks"):
        if len(args) != 2:
            raise CHTranslationError(f"{name}(ts, n) takes two arguments")
        unit = low[len("subtract"):-1].upper()
        return f"TIMESTAMPADD({unit}, -({args[1]}), {args[0]})"
    if low == "todayofweek":
        # ClickHouse: ISO, Monday = 1. Spark's DAYOFWEEK has Sunday = 1 —
        # a bare rename would shift every weekday; WEEKDAY (Monday = 0) + 1
        # preserves the ClickHouse numbering.
        return f"(WEEKDAY({args[0]}) + 1)"
    if low in _IF_AGG:
        agg = _IF_AGG[low]
        if low == "countif":
            if len(args) != 1:
                raise CHTranslationError("countIf(cond) takes one argument")
            return f"COUNT(IF({args[0]}, 1, NULL))"
        if len(args) != 2:
            raise CHTranslationError(f"{name}(x, cond) takes two arguments")
        return f"{agg}(IF({args[1]}, {args[0]}, NULL))"
    if (low.endswith("state") or low.endswith("merge")) and low[:-5] in (
        "count", "sum", "avg", "min", "max", "uniq", "uniqexact",
        "uniqcombined", "quantile", "quantiles", "grouparray", "any",
    ):
        raise CHTranslationError(
            f"{name}: -State/-Merge combinators exchange ClickHouse's "
            "internal sketch/state serialization, which has no Spark "
            "equivalent — keep partial aggregates as plain columns and "
            "merge them associatively (the operators/incremental.py "
            "partial_state/merge_states pattern)"
        )
    if low == "uniqexactif":
        if len(args) != 2:
            raise CHTranslationError("uniqExactIf(x, cond) takes two arguments")
        return f"COUNT(DISTINCT IF({args[1]}, {args[0]}, NULL))"
    if low.endswith("if") and low[:-2] in _GENERIC_IF_AGG:
        # the -If combinator composes with any aggregate; NULL-gating the
        # argument reproduces it for every agg that skips NULLs
        if len(args) != 2:
            raise CHTranslationError(f"{name}(x, cond) takes two arguments")
        return f"{_GENERIC_IF_AGG[low[:-2]]}(IF({args[1]}, {args[0]}, NULL))"
    if low == "uniqexact":
        return f"COUNT(DISTINCT {', '.join(args)})"
    if low == "groupbitmap":
        # bitmap cardinality of an integer column == exact distinct count
        if len(args) != 1:
            raise CHTranslationError("groupBitmap(x) takes one argument")
        return f"COUNT(DISTINCT {args[0]})"
    if low == "multiif":
        if len(args) < 3 or len(args) % 2 == 0:
            raise CHTranslationError(
                "multiIf(c1, v1, ..., else) needs an odd argument count >= 3"
            )
        parts = ["CASE"]
        for i in range(0, len(args) - 1, 2):
            parts.append(f"WHEN {args[i]} THEN {args[i + 1]}")
        parts.append(f"ELSE {args[-1]} END")
        return " ".join(parts)
    if low in ("arraymap", "arrayfilter"):
        if len(args) != 2:
            raise CHTranslationError(f"{name}(lambda, array) takes two arguments")
        fn = "TRANSFORM" if low == "arraymap" else "FILTER"
        return f"{fn}({args[1]}, {args[0]})"
    if low == "arraysum":
        return (
            f"AGGREGATE({args[0]}, CAST(0 AS DOUBLE), "
            f"(acc, x) -> acc + CAST(x AS DOUBLE))"
        )
    if low == "splitbychar":
        if len(args) != 2:
            raise CHTranslationError("splitByChar(sep, s) takes two arguments")
        return f"SPLIT({args[1]}, {args[0]})"
    if low == "match":
        if len(args) != 2:
            raise CHTranslationError("match(s, pattern) takes two arguments")
        return f"({args[0]} RLIKE {args[1]})"
    if low in ("extract", "extractall"):
        # ANSI EXTRACT(unit FROM ts) passes through untouched.
        if low == "extract" and len(args) == 1 and re.search(
            r"\bFROM\b", args[0], re.IGNORECASE
        ):
            return f"EXTRACT({args[0]})"
        if len(args) != 2:
            raise CHTranslationError(f"{name}(s, pattern) takes two arguments")
        pat = _string_literal(args[1])
        if pat is None:
            raise CHTranslationError(
                f"{name}(): pattern must be a string literal — group-vs-whole-"
                "match extraction depends on whether it contains a capture group"
            )
        group = 1 if _REGEX_GROUP.search(pat) else 0
        fn = "REGEXP_EXTRACT" if low == "extract" else "REGEXP_EXTRACT_ALL"
        return f"{fn}({args[0]}, {args[1]}, {group})"
    if low in ("jsonextractstring", "jsonextractint", "jsonextractfloat",
               "jsonextractbool", "jsonhas", "jsonlength"):
        if len(args) < 1:
            raise CHTranslationError(f"{name}(json, keys...) needs arguments")
        keys = []
        for k in args[1:]:
            lit = _string_literal(k)
            if lit is None:
                raise CHTranslationError(
                    f"{name}(): path keys must be string literals"
                )
            keys.append(lit)
        path = "'$" + "".join(f".{k}" for k in keys) + "'"
        get = f"GET_JSON_OBJECT({args[0]}, {path})"
        if low == "jsonextractstring":
            return get
        if low == "jsonextractint":
            return f"CAST({get} AS BIGINT)"
        if low == "jsonextractfloat":
            return f"CAST({get} AS DOUBLE)"
        if low == "jsonextractbool":
            return f"CAST({get} AS BOOLEAN)"
        if low == "jsonhas":
            return f"({get} IS NOT NULL)"
        return f"JSON_ARRAY_LENGTH({get})"
    if low == "formatdatetime":
        if len(args) != 2:
            raise CHTranslationError(
                "formatDateTime(ts, format) takes two arguments"
            )
        fmt = _string_literal(args[1])
        if fmt is None:
            raise CHTranslationError(
                "formatDateTime(): format must be a string literal"
            )
        java = _convert_fmt(fmt).replace("'", "''")
        return f"DATE_FORMAT({args[0]}, '{java}')"
    if low == "tostartofinterval":
        if len(args) != 2:
            raise CHTranslationError(
                "toStartOfInterval(ts, INTERVAL n unit) takes two arguments"
            )
        mm = _INTERVAL.match(args[1])
        if not mm:
            raise CHTranslationError(
                "toStartOfInterval: second argument must be INTERVAL n "
                "SECOND/MINUTE/HOUR/DAY (month-granularity intervals are "
                "irregular — use date_trunc)"
            )
        unit = mm.group(2).upper()
        if unit == "DAY":
            # UTC epoch-floor aligns day buckets to UTC midnight, but
            # ClickHouse aligns them to SERVER-timezone midnight — a silent
            # divergence in non-UTC sessions. Raise, per module contract.
            raise CHTranslationError(
                "toStartOfInterval: DAY intervals align to server-timezone "
                "midnight in ClickHouse but would epoch-floor to UTC here — "
                "use date_trunc('DAY', ts) (session-timezone aligned) or a "
                "sub-day interval"
            )
        sec = int(mm.group(1)) * _INTERVAL_SECONDS[unit]
        if sec <= 0:
            raise CHTranslationError("toStartOfInterval: zero-length interval")
        return (
            f"TIMESTAMP_SECONDS((FLOOR(UNIX_TIMESTAMP({args[0]}) / {sec})"
            f" * {sec}))"
        )
    if low in ("tostartoffiveminutes", "tostartoftenminutes",
               "tostartoffifteenminutes"):
        if len(args) != 1:
            raise CHTranslationError(f"{name}(ts) takes one argument")
        sec = {"tostartoffiveminutes": 300, "tostartoftenminutes": 600,
               "tostartoffifteenminutes": 900}[low]
        return (
            f"TIMESTAMP_SECONDS((FLOOR(UNIX_TIMESTAMP({args[0]}) / {sec})"
            f" * {sec}))"
        )
    if low in _URL_PART:
        if len(args) != 1:
            raise CHTranslationError(f"{name}(url) takes one argument")
        return f"PARSE_URL({args[0]}, '{_URL_PART[low]}')"
    if low == "domainwithoutwww":
        if len(args) != 1:
            raise CHTranslationError("domainWithoutWWW(url) takes one argument")
        return (
            f"REGEXP_REPLACE(PARSE_URL({args[0]}, 'HOST'), '^www\\\\.', '')"
        )
    if low == "topleveldomain":
        if len(args) != 1:
            raise CHTranslationError("topLevelDomain(url) takes one argument")
        return f"REGEXP_EXTRACT(PARSE_URL({args[0]}, 'HOST'), '([^.]+)$', 1)"
    if low == "extracturlparameter":
        if len(args) != 2:
            raise CHTranslationError(
                "extractURLParameter(url, name) takes two arguments"
            )
        return f"PARSE_URL({args[0]}, 'QUERY', {args[1]})"
    if low == "cutquerystring":
        # removes '?...' up to (not including) any '#fragment' — the
        # ClickHouse contract keeps the fragment.
        if len(args) != 1:
            raise CHTranslationError("cutQueryString(url) takes one argument")
        return f"REGEXP_REPLACE({args[0]}, '\\\\?[^#]*', '')"
    if low == "cutfragment":
        if len(args) != 1:
            raise CHTranslationError("cutFragment(url) takes one argument")
        return f"REGEXP_REPLACE({args[0]}, '#.*$', '')"
    if low == "ipv4stringtonum":
        if len(args) != 1:
            raise CHTranslationError("IPv4StringToNum(s) takes one argument")
        return (
            f"AGGREGATE(TRANSFORM(SPLIT({args[0]}, '\\\\.'), "
            f"_o -> CAST(_o AS BIGINT)), CAST(0 AS BIGINT), "
            f"(_acc, _o) -> _acc * 256 + _o)"
        )
    if low == "ipv4numtostring":
        if len(args) != 1:
            raise CHTranslationError("IPv4NumToString(n) takes one argument")
        a = args[0]
        return (
            f"CONCAT_WS('.', CAST(({a} DIV 16777216) % 256 AS STRING), "
            f"CAST(({a} DIV 65536) % 256 AS STRING), "
            f"CAST(({a} DIV 256) % 256 AS STRING), "
            f"CAST({a} % 256 AS STRING))"
        )
    if low == "isipv4string":
        if len(args) != 1:
            raise CHTranslationError("isIPv4String(s) takes one argument")
        octet = "(25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)"
        return f"({args[0]} RLIKE '^({octet}\\\\.){{3}}{octet}$')"
    if low == "countsubstrings":
        if len(args) != 2:
            raise CHTranslationError(
                "countSubstrings(s, needle) takes two arguments"
            )
        s, n = args
        return (
            f"((LENGTH({s}) - LENGTH(REPLACE({s}, {n}, ''))) "
            f"DIV LENGTH({n}))"
        )
    if low == "splitbystring":
        # Spark SPLIT takes a REGEX; only literal separators can be
        # regex-quoted safely at translation time.
        if len(args) != 2:
            raise CHTranslationError("splitByString(sep, s) takes two arguments")
        sep = _string_literal(args[0])
        if sep is None:
            raise CHTranslationError(
                "splitByString: separator must be a string literal (a "
                "column-valued separator would need regex-quoting at run "
                "time — use splitByChar or an explicit split())"
            )
        quoted = re.sub(r"([.\\+*?\[\]^$(){}=!<>|:#&~-])", r"\\\1", sep)
        lit = quoted.replace("'", "''").replace("\\", "\\\\")
        return f"SPLIT({args[1]}, '{lit}')"
    if low == "arrayfirst":
        # no-match yields NULL here (ClickHouse yields the element type's
        # default value); values agree whenever a match exists.
        if len(args) != 2:
            raise CHTranslationError("arrayFirst(lambda, array) takes two arguments")
        return f"TRY_ELEMENT_AT(FILTER({args[1]}, {args[0]}), 1)"
    if low == "arrayfirstindex":
        if len(args) != 2:
            raise CHTranslationError(
                "arrayFirstIndex(lambda, array) takes two arguments"
            )
        # 1-based index of the first match, 0 when none — the ClickHouse
        # contract; COALESCE covers the empty-filter NULL.
        arr, lam = args[1], args[0]
        return (
            f"COALESCE(ARRAY_POSITION({arr}, "
            f"TRY_ELEMENT_AT(FILTER({arr}, {lam}), 1)), 0)"
        )
    if low in ("arrayexists", "arrayall"):
        if len(args) != 2:
            raise CHTranslationError(f"{name}(lambda, array) takes two arguments")
        fn = "EXISTS" if low == "arrayexists" else "FORALL"
        return f"{fn}({args[1]}, {args[0]})"
    if low == "arraycount":
        if len(args) == 1:  # no-lambda form counts non-zero elements
            return f"SIZE(FILTER({args[0]}, _x -> _x <> 0))"
        if len(args) != 2:
            raise CHTranslationError("arrayCount([lambda,] array)")
        return f"SIZE(FILTER({args[1]}, {args[0]}))"
    if low == "countequal":
        if len(args) != 2:
            raise CHTranslationError("countEqual(array, x) takes two arguments")
        return f"SIZE(FILTER({args[0]}, _x -> _x = {args[1]}))"
    if low == "arrayenumerate":
        if len(args) != 1:
            raise CHTranslationError("arrayEnumerate(array) takes one argument")
        # TRANSFORM with the index lambda, not SEQUENCE(1, SIZE(a)):
        # Spark's sequence() reverses direction when start > stop, so the
        # SEQUENCE form turns an empty array into [1, 0] instead of [].
        return f"TRANSFORM({args[0]}, (_x, _i) -> _i + 1)"
    if low == "arraypushback":
        if len(args) != 2:
            raise CHTranslationError("arrayPushBack(array, x) takes two arguments")
        return f"CONCAT({args[0]}, ARRAY({args[1]}))"
    if low == "arraypushfront":
        if len(args) != 2:
            raise CHTranslationError("arrayPushFront(array, x) takes two arguments")
        return f"CONCAT(ARRAY({args[1]}), {args[0]})"
    if low == "range":
        # ClickHouse range() is exclusive-end and empty when stop <= start;
        # Spark's sequence() is inclusive and REVERSES when start > stop, so
        # a bare SEQUENCE(start, stop - 1) silently turns CH-empty ranges
        # into descending arrays (range(0) -> [0, -1]). Guard with CASE.
        if len(args) == 1:
            return (
                f"CASE WHEN ({args[0]}) > 0 "
                f"THEN SEQUENCE(0, ({args[0]}) - 1) ELSE ARRAY() END"
            )
        if len(args) == 2:
            return (
                f"CASE WHEN ({args[1]}) > ({args[0]}) "
                f"THEN SEQUENCE(({args[0]}), ({args[1]}) - 1) "
                f"ELSE ARRAY() END"
            )
        raise CHTranslationError(
            "range(start, end, step) with a step has exclusive-end semantics "
            "Spark's inclusive SEQUENCE cannot mirror verbatim — state the "
            "last element explicitly with sequence(start, last, step)"
        )
    if low == "materialize":
        if len(args) != 1:
            raise CHTranslationError("materialize(x) takes one argument")
        return f"({args[0]})"
    if low == "negate":
        if len(args) != 1:
            raise CHTranslationError("negate(x) takes one argument")
        return f"(-({args[0]}))"
    if low in ("bitand", "bitor", "bitxor", "bitshiftleft", "bitshiftright"):
        op = {"bitand": "&", "bitor": "|", "bitxor": "^",
              "bitshiftleft": "<<", "bitshiftright": ">>"}[low]
        if len(args) != 2:
            raise CHTranslationError(f"{name}(a, b) takes two arguments")
        return f"({args[0]} {op} {args[1]})"
    if low == "bitnot":
        if len(args) != 1:
            raise CHTranslationError("bitNot(x) takes one argument")
        return f"(~({args[0]}))"
    if low == "countdistinct":
        return f"COUNT(DISTINCT {', '.join(args)})"
    if low in ("empty", "notempty"):
        if len(args) != 1:
            raise CHTranslationError(f"{name}(arr) takes one argument")
        op = "=" if low == "empty" else "<>"
        # Array/map form; a string argument fails loudly at analysis (SIZE
        # is collection-only) rather than silently — use s = '' for strings.
        return f"(SIZE({args[0]}) {op} 0)"
    if low == "tostartofweek":
        # ClickHouse default (mode 0) starts weeks on SUNDAY; Spark's WEEK
        # truncation starts Monday. Only the explicit Monday mode is safe.
        if len(args) == 2 and args[1].strip() == "1":
            return f"DATE_TRUNC('WEEK', {args[0]})"
        raise CHTranslationError(
            "toStartOfWeek defaults to Sunday-start weeks; Spark's WEEK "
            "truncation is Monday-start — write toStartOfWeek(d, 1) or "
            "toMonday(d) for Monday weeks, or DATE_SUB(DATE_TRUNC('WEEK', "
            "DATE_ADD(d, 1)), 1) for Sunday weeks"
        )
    if low == "arrayavg":
        if len(args) != 1:
            raise CHTranslationError("arrayAvg(arr) takes one argument")
        a = args[0]
        return (
            f"(AGGREGATE({a}, CAST(0 AS DOUBLE), (_s, _x) -> _s + _x)"
            f" / SIZE({a}))"
        )
    if low == "assumenotnull":
        if len(args) != 1:
            raise CHTranslationError("assumeNotNull(x) takes one argument")
        return f"({args[0]})"  # type-level in ClickHouse; value passthrough
    if low == "ifnotfinite":
        if len(args) != 2:
            raise CHTranslationError("ifNotFinite(x, y) takes two arguments")
        x, y = args
        return (
            f"(CASE WHEN ISNAN({x}) OR {x} = DOUBLE('Infinity') "
            f"OR {x} = DOUBLE('-Infinity') THEN {y} ELSE {x} END)"
        )
    if low == "positioncaseinsensitive":
        if len(args) != 2:
            raise CHTranslationError(
                "positionCaseInsensitive(haystack, needle) takes two arguments"
            )
        return f"INSTR(LOWER({args[0]}), LOWER({args[1]}))"
    if low == "arraycompact":
        if len(args) != 1:
            raise CHTranslationError("arrayCompact(arr) takes one argument")
        a = args[0]
        # removes CONSECUTIVE duplicates (not array_distinct); null-safe
        return f"FILTER({a}, (_x, _i) -> _i = 0 OR NOT (_x <=> {a}[_i - 1]))"
    if low == "arraydifference":
        if len(args) != 1:
            raise CHTranslationError("arrayDifference(arr) takes one argument")
        a = args[0]
        return f"TRANSFORM({a}, (_x, _i) -> IF(_i = 0, 0, _x - {a}[_i - 1]))"
    if low == "base64decode":
        if len(args) != 1:
            raise CHTranslationError("base64Decode(s) takes one argument")
        return f"CAST(UNBASE64({args[0]}) AS STRING)"
    if low == "hasall":
        if len(args) != 2:
            raise CHTranslationError("hasAll(arr, subset) takes two arguments")
        return f"(SIZE(ARRAY_EXCEPT({args[1]}, {args[0]})) = 0)"
    if low == "arrayintersect":
        if len(args) < 2:
            raise CHTranslationError("arrayIntersect takes >= 2 arrays")
        out = f"ARRAY_INTERSECT({args[0]}, {args[1]})"
        for extra in args[2:]:  # Spark's is binary; fold the n-ary form
            out = f"ARRAY_INTERSECT({out}, {extra})"
        return out
    if low in ("intdivorzero", "moduloorzero"):
        if len(args) != 2:
            raise CHTranslationError(f"{name}(a, b) takes two arguments")
        a, b = args
        op = f"{a} DIV {b}" if low == "intdivorzero" else f"{a} % {b}"
        return f"(IF({b} = 0, 0, {op}))"
    if low == "tupleelement":
        if len(args) != 2:
            raise CHTranslationError("tupleElement(t, name|index) takes two arguments")
        field = _string_literal(args[1])
        if field is None:
            raise CHTranslationError(
                "tupleElement by POSITION has no Spark equivalent (struct "
                "fields are name-addressed); use tupleElement(t, 'name')"
            )
        return f"({args[0]}).{field}"
    if low in _INTERVAL_CTOR:
        if len(args) != 1:
            raise CHTranslationError(f"{name}(n) takes one argument")
        pos, ctor, arity = _INTERVAL_CTOR[low]
        zeros = ["0"] * arity
        zeros[pos] = args[0]
        return f"{ctor}({', '.join(zeros)})"
    if low in _RENAME:
        return f"{_RENAME[low]}({', '.join(args)})"
    return f"{name}({', '.join(args)})"


# Reserved words that may legitimately precede a parenthesized expression
# (SELECT (a), IN (...), FROM (subquery), AND (cond) ...). Treating them as
# function calls would re-emit them glued to the paren and re-join their
# "arguments" — pass them through verbatim instead; the paren contents are
# still translated when the scanner reaches them. Function-like names the
# dialect rewrites (if, extract, count, ...) must NOT be listed.
# NOTE: range/rows/values are deliberately absent — as keywords they never
# directly precede '(' (ROWS BETWEEN ..., FROM VALUES (..)-with-space is
# cosmetic), while range(...) IS a ClickHouse function this module rewrites.
_SQL_KEYWORDS = frozenset(
    """select from where and or not on when then else end case group order
    having join inner left right full cross outer union all distinct limit
    offset by as between in exists is null like rlike ilike over partition
    with using interval asc desc""".split()
)


def _translate_calls(sql: str) -> str:
    out: list[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c in "'\"`":
            j = _skip_string(sql, i)
            out.append(sql[i:j])
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            name = sql[i:j]
            if name.lower() in _SQL_KEYWORDS:
                out.append(name)
                i = j
                continue
            k = j
            while k < n and sql[k].isspace():
                k += 1
            if k < n and sql[k] == "(":
                close = _matching_paren(sql, k)
                args = _split_args(_translate_calls(sql[k + 1 : close]))
                # parametric form: quantile(p)(x)
                k2 = close + 1
                while k2 < n and sql[k2].isspace():
                    k2 += 1
                if (
                    name.lower() == "uniqupto"
                    and k2 < n
                    and sql[k2] == "("
                ):
                    # uniqUpTo(N)(x...): exact distinct count saturating at
                    # N + 1 ("more than N" marker) — exactly expressible.
                    close2 = _matching_paren(sql, k2)
                    inner = _split_args(_translate_calls(sql[k2 + 1 : close2]))
                    if len(args) != 1 or not inner:
                        raise CHTranslationError(
                            "uniqUpTo(N)(x...) takes one parameter and at "
                            "least one argument"
                        )
                    out.append(
                        f"LEAST(COUNT(DISTINCT {', '.join(inner)}), "
                        f"({args[0]}) + 1)"
                    )
                    i = close2 + 1
                    continue
                if (
                    name.lower() == "topk"
                    and k2 < n
                    and sql[k2] == "("
                ):
                    # topK(k)(x): ClickHouse's approximate heavy hitters →
                    # exact deterministic top-k by frequency, ties broken
                    # by value ascending. Built entirely from higher-order
                    # functions over one collect_list, so it stays a valid
                    # aggregate expression in any position. NULLs skipped
                    # (collect_list drops them — matches ClickHouse).
                    #
                    # Shape: sort the collected values, find run starts
                    # (one linear pass), turn consecutive start positions
                    # into run lengths, sort the (−count, value) structs,
                    # slice k. O(n log n) per group — the first draft's
                    # FILTER-per-distinct-value was O(n·d) and the 10×
                    # scale smoke caught it at 74× (SCALE.md r10).
                    # TRANSFORM(ARRAY(e), v -> body) is the let-binding
                    # idiom: e is computed once and bound to v.
                    # O(group values) agg buffer: grouped use; whole-table
                    # scale path is topk_heavy_hitters (queries/sketches.py).
                    close2 = _matching_paren(sql, k2)
                    inner = _split_args(_translate_calls(sql[k2 + 1 : close2]))
                    if len(args) != 1 or len(inner) != 1:
                        raise CHTranslationError(
                            "topK(k)(x) takes one parameter and one argument"
                        )
                    if not re.fullmatch(r"[1-9]\d*", args[0].strip()):
                        # [1-9]\d* (not \d+): topK(0)(x) would otherwise
                        # slip through as SLICE(..., 1, 0) — an always-empty
                        # array instead of the error the message promises.
                        raise CHTranslationError(
                            "topK(k)(x): k must be a positive integer literal"
                        )
                    k_lit, x = args[0].strip(), inner[0]
                    starts = (
                        "FILTER(SEQUENCE(1, SIZE(_s)), _i -> _i = 1 OR NOT "
                        "(ELEMENT_AT(_s, _i) <=> "
                        "ELEMENT_AT(_s, GREATEST(_i - 1, 1))))"
                    )
                    runs = (
                        "ARRAY_SORT(TRANSFORM(SEQUENCE(1, SIZE(_st)), _j -> "
                        "STRUCT(ELEMENT_AT(_st, _j) - "
                        "COALESCE(TRY_ELEMENT_AT(_st, _j + 1), SIZE(_s) + 1) "
                        "AS _negcnt, "
                        "ELEMENT_AT(_s, ELEMENT_AT(_st, _j)) AS _val)))"
                    )
                    out.append(
                        f"ELEMENT_AT(TRANSFORM(ARRAY("
                        f"ARRAY_SORT(COLLECT_LIST({x}))), _s -> "
                        f"IF(SIZE(_s) = 0, SLICE(_s, 1, 1), "
                        f"ELEMENT_AT(TRANSFORM(ARRAY({starts}), _st -> "
                        f"SLICE(TRANSFORM({runs}, _r -> _r._val), 1, {k_lit})"
                        f"), 1))), 1)"
                    )
                    i = close2 + 1
                    continue
                if (
                    name.lower() in _PARAMETRIC
                    and k2 < n
                    and sql[k2] == "("
                ):
                    close2 = _matching_paren(sql, k2)
                    inner = _split_args(_translate_calls(sql[k2 + 1 : close2]))
                    plural = name.lower() in _PARAMETRIC_PLURAL
                    if len(inner) != 1 or (not plural and len(args) != 1):
                        raise CHTranslationError(
                            f"{name}(p...)(x) takes one argument"
                        )
                    if not args:
                        raise CHTranslationError(
                            f"{name}(p...)(x) needs at least one parameter"
                        )
                    p = f"ARRAY({', '.join(args)})" if plural else args[0]
                    out.append(
                        f"{_PARAMETRIC[name.lower()]}({inner[0]}, {p})"
                    )
                    i = close2 + 1
                    continue
                out.append(_rewrite_call(name, args))
                i = close + 1
            else:
                out.append(name)
                i = j
            continue
        out.append(c)
        i += 1
    return "".join(out)


_PREWHERE = re.compile(r"\bPREWHERE\b", re.IGNORECASE)
# FROM t FINAL — ReplacingMergeTree's read-time exact dedup. This engine
# dedups exactly at WRITE time (K8, dropDuplicates on the merge keys), so
# FINAL is semantically a no-op here and is stripped. Only the table-ref
# position is matched; FINAL as a column/alias name is untouched.
_FINAL = re.compile(
    r"(\bFROM\s+[\w.`\"]+)\s+FINAL\b", re.IGNORECASE
)
_WITH_FILL = re.compile(r"\bWITH\s+FILL\b", re.IGNORECASE)
# GLOBAL is a ClickHouse distribution hint (broadcast the right side to all
# shards) — semantics are identical without it; Spark's optimizer owns the
# distribution decision. ANY/ASOF joins CHANGE row multiplicity, so they
# must not be silently rewritten.
_GLOBAL = re.compile(r"\bGLOBAL\s+(?=JOIN|IN\b|LEFT|RIGHT|INNER|FULL|CROSS)",
                     re.IGNORECASE)
_ANY_JOIN = re.compile(r"\b(?:LEFT|RIGHT|INNER)?\s*ANY\s+(?:LEFT\s+|RIGHT\s+|INNER\s+)?JOIN\b",
                       re.IGNORECASE)
_ASOF_JOIN = re.compile(r"\bASOF\s+(?:LEFT\s+)?JOIN\b", re.IGNORECASE)
_LIMIT_BY = re.compile(r"\bLIMIT\s+\d+\s+BY\b", re.IGNORECASE)
_LIMIT_BY_FULL = re.compile(r"\bLIMIT\s+(\d+)\s+BY\s+", re.IGNORECASE)
_LIMIT_BY_OFFSET = re.compile(r"\bLIMIT\s+\d+\s*,\s*\d+\s+BY\b", re.IGNORECASE)
_ORDER_BY_TOK = re.compile(r"\bORDER\s+BY\s+", re.IGNORECASE)
_TAIL_LIMIT = re.compile(r"\bLIMIT\s+(\d+)\s*$", re.IGNORECASE)


def _outside_string_matches(sql: str, pattern: re.Pattern) -> list[re.Match]:
    """All `pattern` matches that start outside string literals, at ANY
    paren depth (contrast `_depth0_matches`, which also requires depth 0).
    Used by rewrites that legitimately fire inside subqueries (SAMPLE) but
    must never fire inside a quoted literal — `WHERE s = 'FROM t SAMPLE
    1/4'` is data, not syntax."""
    out: list[re.Match] = []
    j = 0
    while j < len(sql):
        if sql[j] in "'\"`":
            j = _skip_string(sql, j)
            continue
        m = pattern.match(sql, j)
        if m and (j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_")):
            out.append(m)
            j = m.end()
            continue
        j += 1
    return out


def _depth0_matches(sql: str, pattern: re.Pattern) -> list[re.Match]:
    """All `pattern` matches that start at paren-depth 0 outside strings."""
    out: list[re.Match] = []
    depth = 0
    j = 0
    while j < len(sql):
        c = sql[j]
        if c in "'\"`":
            j = _skip_string(sql, j)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif depth == 0:
            m = pattern.match(sql, j)
            if m and (j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_")):
                out.append(m)
                j = m.end()
                continue
        j += 1
    return out


def _rewrite_limit_by(sql: str) -> str:
    """ClickHouse `... ORDER BY o LIMIT n BY g [LIMIT m]` → ranked
    subquery: row_number over (PARTITION BY g ORDER BY o), keep rn <= n.

    Top-level clause only, and ORDER BY is REQUIRED (ClickHouse applies
    LIMIT BY after ORDER BY; without one 'first n per group' is
    nondeterministic — raise rather than pick an order). The ORDER BY /
    group expressions must reference selected columns (the rewrite wraps
    the query as a subquery, so source-only columns are out of scope —
    Spark's analyzer reports those). LIMIT n, offset BY and LIMIT BY
    inside subqueries raise with the manual recipe."""
    if _LIMIT_BY_OFFSET.search(sql):
        raise CHTranslationError(
            "LIMIT n, offset BY has no single-window equivalent; use a "
            "ranked subquery with rn > offset AND rn <= offset + n"
        )
    hits = _depth0_matches(sql, _LIMIT_BY_FULL)
    if not hits:
        if _LIMIT_BY.search(sql):
            raise CHTranslationError(
                "LIMIT n BY inside a subquery is not rewritten; state it "
                "explicitly with a ranked subquery: SELECT * FROM (... "
                "ROW_NUMBER() OVER (PARTITION BY cols ORDER BY ...) AS rn) "
                "WHERE rn <= n"
            )
        return sql
    m = hits[0]
    obs = [o for o in _depth0_matches(sql, _ORDER_BY_TOK) if o.end() <= m.start()]
    if not obs:
        raise CHTranslationError(
            "LIMIT n BY without a top-level ORDER BY is nondeterministic "
            "('first n per group' of an unordered set); add ORDER BY"
        )
    ob = obs[-1]
    head = sql[: ob.start()].strip()
    order_expr = sql[ob.end() : m.start()].strip().rstrip(",")
    n = int(m.group(1))
    rest = sql[m.end() :].strip()
    tail = _TAIL_LIMIT.search(rest)
    if tail:
        group = rest[: tail.start()].strip().rstrip(",")
        tail_sql = f" LIMIT {tail.group(1)}"
    else:
        group, tail_sql = rest.rstrip(","), ""
    if not group:
        raise CHTranslationError("LIMIT n BY: empty group expression list")
    return (
        f"SELECT * EXCEPT(__rn) FROM (SELECT *, ROW_NUMBER() OVER "
        f"(PARTITION BY {group} ORDER BY {order_expr}) AS __rn FROM "
        f"({head}) __lb) WHERE __rn <= {n} ORDER BY {order_expr}{tail_sql}"
    )
_QUALIFY_ANY = re.compile(r"\bQUALIFY\b", re.IGNORECASE)
_QUALIFY_TOK = re.compile(r"QUALIFY\s", re.IGNORECASE)
_QUALIFY_TAIL = re.compile(r"(?:ORDER\s+BY|LIMIT)\b", re.IGNORECASE)


def _rewrite_qualify(sql: str) -> str:
    """ClickHouse `QUALIFY <pred>` (post-window filter) → wrap everything
    before QUALIFY as a subquery and filter it with WHERE, keeping any
    trailing ORDER BY / LIMIT outside. QUALIFY evaluates AFTER window
    functions, which a plain WHERE cannot do in Spark — the subquery hop
    makes the window results ordinary columns first.

    The predicate must reference SELECT-list aliases (ClickHouse also
    allows inline window calls in QUALIFY; those would need the window
    duplicated into the subquery, a silent double-evaluation — raise with
    the aliasing recipe instead). Top-level clause only: QUALIFY inside a
    subquery raises with the manual rewrite."""
    hits = _depth0_matches(sql, _QUALIFY_TOK)
    if not hits:
        if _QUALIFY_ANY.search(sql):
            raise CHTranslationError(
                "QUALIFY inside a subquery is not rewritten; apply the "
                "rewrite manually: SELECT * FROM (<query>) WHERE <pred>"
            )
        return sql
    m = hits[0]
    head = sql[: m.start()].strip()
    rest = sql[m.end() :].strip()
    tails = _depth0_matches(rest, _QUALIFY_TAIL)
    if tails:
        pred = rest[: tails[0].start()].strip().rstrip(",")
        tail_sql = " " + rest[tails[0].start() :].strip()
    else:
        pred, tail_sql = rest.rstrip(","), ""
    if not pred:
        raise CHTranslationError("QUALIFY: empty predicate")
    if re.search(r"\bOVER\s*\(", pred, re.IGNORECASE):
        raise CHTranslationError(
            "QUALIFY over an inline window call would re-evaluate the "
            "window; alias the window expression in the SELECT list and "
            "reference the alias in QUALIFY"
        )
    return f"SELECT * FROM ({head}) __qf WHERE {pred}{tail_sql}"


_FORMAT_TAIL = re.compile(r"\bFORMAT\s+\w+\s*;?\s*$", re.IGNORECASE)
_SETTINGS_TAIL = re.compile(r"\bSETTINGS\s+[\w\s=,'.]+$", re.IGNORECASE)
_WITH_TOTALS = re.compile(r"\bWITH\s+TOTALS\b", re.IGNORECASE)
_SAMPLE = re.compile(r"\bSAMPLE\s+[\d./]+", re.IGNORECASE)
_ARRAY_JOIN_START = re.compile(r"\b(LEFT\s+)?ARRAY\s+JOIN\s+", re.IGNORECASE)
_AS_ALIAS = re.compile(r"^(.*\S)\s+AS\s+([A-Za-z_]\w*)$", re.IGNORECASE | re.DOTALL)
_CLAUSE_KEYWORD = re.compile(
    # ARRAY terminates only as 'ARRAY JOIN' — a bare ARRAY would truncate
    # array(...) literal calls in the expression body (ADVICE r04).
    r"\b(?:WHERE|PREWHERE|GROUP|HAVING|ORDER|LIMIT|SETTINGS|FORMAT|UNION|"
    r"INTERSECT|EXCEPT|LEFT|RIGHT|INNER|FULL|CROSS|JOIN|LATERAL|"
    r"ARRAY(?=\s+JOIN\b))\b",
    re.IGNORECASE,
)


def _array_join_body_end(sql: str, start: int) -> int:
    """End offset of the ARRAY JOIN expression list: the next clause
    keyword at paren-depth 0, a depth-closing ')' (subquery end), or EOS.
    Paren/quote-aware — clause words inside nested calls or strings don't
    terminate the scan."""
    depth = 0
    j = start
    while j < len(sql):
        c = sql[j]
        if c in "'\"`":
            j = _skip_string(sql, j)
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            if depth == 0:
                return j
            depth -= 1
        elif depth == 0 and c.isalpha():
            m = _CLAUSE_KEYWORD.match(sql, j)
            if m and (j == 0 or not (sql[j - 1].isalnum() or sql[j - 1] == "_")):
                return j
            while j < len(sql) and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            continue
        j += 1
    return j


def _rewrite_array_join(sql: str) -> str:
    """ClickHouse `[LEFT] ARRAY JOIN expr AS alias` → Spark
    `LATERAL VIEW [OUTER] EXPLODE(expr) _aj_<alias> AS <alias>`.

    Only the aliased single-array form translates: a bare `ARRAY JOIN arr`
    rebinds the identifier `arr` to the element in ClickHouse, which in
    Spark becomes an ambiguous reference (the lateral-view output cannot
    shadow the table column), and the multi-array form iterates arrays in
    LOCKSTEP (positional zip), not as a cross product — both raise with
    the explicit recipe rather than silently changing semantics."""
    out: list[str] = []
    pos = 0
    while True:
        m = _ARRAY_JOIN_START.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        end = _array_join_body_end(sql, m.end())
        body = sql[m.end() : end].strip().rstrip(",")
        if len(_split_args(body)) > 1:
            raise CHTranslationError(
                "ARRAY JOIN over multiple arrays iterates them in lockstep "
                "(positional zip), which a cross-product rewrite would "
                "corrupt; use LATERAL VIEW POSEXPLODE(a) p AS pos, va with "
                "element_at(b, pos + 1) for the other arrays"
            )
        am = _AS_ALIAS.match(body)
        if not am:
            raise CHTranslationError(
                "bare ARRAY JOIN rebinds the array identifier to its "
                "element — not expressible without shadowing in Spark; "
                "write ARRAY JOIN <expr> AS <alias> and select the alias"
            )
        expr, alias = am.group(1), am.group(2)
        outer = "OUTER " if m.group(1) else ""
        out.append(sql[pos : m.start()])
        out.append(
            f"LATERAL VIEW {outer}EXPLODE({expr}) _aj_{alias} AS {alias} "
        )
        pos = end


# Sampling-key registry: the analog of the SAMPLE BY expression ClickHouse
# declares in table DDL. SAMPLE f rewrites to a deterministic md5 hash-gate
# on this key, so repeated queries (and different engines) see the SAME
# subset, and rows sharing a key (e.g. lineitems of one order) stay
# together — the property ClickHouse's sampling key exists to provide.
# Callers can register additional tables: SAMPLE_KEYS["mytable"] = "id".
SAMPLE_KEYS: dict[str, str] = {
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "customer": "c_custkey",
    "part": "p_partkey",
    "supplier": "s_suppkey",
    "nation": "n_nationkey",
    "region": "r_regionkey",
}


def sample_gate_sql(key: str, num: int, den: int) -> str:
    """The deterministic hash-gate predicate SAMPLE rewrites to: first 8
    md5 hex digits of the key (a uniform 32-bit value) mod den < num.
    DuckDB mirror: the strpos-fold `_duck_hex8` (queries/llm_dedup.py)."""
    return (
        f"PMOD(CAST(CONV(SUBSTR(MD5(CAST({key} AS STRING)), 1, 8), 16, 10) "
        f"AS BIGINT), {den}) < {num}"
    )


def _parse_sample_fraction(spec: str) -> tuple[int, int]:
    """'1/4' or '0.25' → reduced (num, den); row-count form raises."""
    from math import gcd

    spec = spec.strip()
    if "/" in spec:
        a, b = spec.split("/", 1)
        num, den = int(a), int(b)
    elif "." in spec:
        intpart, frac = spec.split(".", 1)
        den = 10 ** len(frac)
        num = (int(intpart) if intpart else 0) * den + (int(frac) if frac else 0)
    else:
        raise CHTranslationError(
            "SAMPLE <rowcount> picks a fraction from the table's size, "
            "which only the storage engine knows; state the fraction "
            "explicitly (SAMPLE 0.1 or SAMPLE 1/10)"
        )
    g = gcd(num, den) or 1
    num, den = num // g, den // g
    if not 0 < num < den:
        raise CHTranslationError("SAMPLE fraction must be strictly in (0, 1)")
    return num, den


_SAMPLE_OFFSET = re.compile(r"\bSAMPLE\s+[\d./]+\s+OFFSET\b", re.IGNORECASE)
_SAMPLE_TABLE = re.compile(
    r"\bFROM\s+([A-Za-z_][\w.]*)((?:\s+(?:AS\s+)?[A-Za-z_]\w*)?)\s+"
    r"SAMPLE\s+(\d*(?:\.\d+)?(?:\s*/\s*\d+)?)",
    re.IGNORECASE,
)


def _rewrite_sample(sql: str) -> str:
    """`FROM t [alias] SAMPLE f` → deterministic hash-gate subquery on the
    table's registered sampling key. See the module docstring for why this
    preserves SAMPLE's contract (consistent key-coherent subset) rather
    than its storage-defined row choice."""
    if _outside_string_matches(sql, _SAMPLE_OFFSET):
        raise CHTranslationError(
            "SAMPLE ... OFFSET addresses a storage-defined sample ordering "
            "that has no deterministic analog; take disjoint subsets with "
            "explicit hash-gate ranges instead (pmod(h, den) BETWEEN a AND b)"
        )
    while True:
        hits = _outside_string_matches(sql, _SAMPLE_TABLE)
        if not hits:
            break
        m = hits[0]
        table, alias_tok, spec = m.group(1), (m.group(2) or "").strip(), m.group(3)
        num, den = _parse_sample_fraction(spec)
        short = table.split(".")[-1].lower()
        key = SAMPLE_KEYS.get(short)
        if key is None:
            raise CHTranslationError(
                f"SAMPLE on {table}: no sampling key registered (ClickHouse "
                "reads it from the table DDL); add one with "
                f"SAMPLE_KEYS[{short!r}] = '<key column>'"
            )
        alias = re.sub(r"(?i)^AS\s+", "", alias_tok) or table.split(".")[-1]
        gate = sample_gate_sql(key, num, den)
        sql = (
            sql[: m.start()]
            + f"FROM (SELECT * FROM {table} WHERE {gate}) {alias}"
            + sql[m.end() :]
        )
    if _outside_string_matches(sql, _SAMPLE):
        raise CHTranslationError(
            "SAMPLE is only rewritten on a plain table reference "
            "(FROM t [alias] SAMPLE f); apply the hash-gate manually for "
            "subqueries: WHERE pmod(<32-bit md5 prefix of key>, den) < num"
        )
    return sql


_GROUP_BY_TOK = re.compile(r"\bGROUP\s+BY\s+", re.IGNORECASE)


def _rewrite_with_totals(sql: str) -> str:
    """`GROUP BY k... WITH TOTALS` → `GROUP BY GROUPING SETS ((k...), ())`.
    The grand-total row arrives in-band with NULL group keys (Spark's
    rollup convention) instead of ClickHouse's out-of-band default-value
    block — values are identical, representation is documented.

    CAVEAT (nullable keys): if a grouping key column itself contains
    NULLs, the in-band totals row is indistinguishable from the genuine
    NULL-key group by looking at the key columns alone — ClickHouse never
    has this collision because its totals block is out-of-band. When any
    key is nullable, SELECT `GROUPING(key)` alongside it (1 marks the
    totals row, 0 a real group, including the NULL-valued one); the
    rewrite deliberately does not inject that column because it would
    change the query's output schema."""
    if not _WITH_TOTALS.search(sql):
        return sql
    d0 = _depth0_matches(sql, _WITH_TOTALS)
    if len(d0) != 1 or len(list(_WITH_TOTALS.finditer(sql))) != 1:
        raise CHTranslationError(
            "WITH TOTALS inside a subquery (or repeated) is not rewritten; "
            "apply GROUPING SETS ((keys), ()) manually in that subquery"
        )
    m = d0[0]
    gbs = [g for g in _depth0_matches(sql, _GROUP_BY_TOK) if g.end() <= m.start()]
    if not gbs:
        raise CHTranslationError(
            "WITH TOTALS without a GROUP BY at statement level is not "
            "rewritten"
        )
    gb = gbs[-1]
    keys = sql[gb.end() : m.start()].strip().rstrip(",")
    if re.search(r"\b(ROLLUP|CUBE|GROUPING\s+SETS)\b", keys, re.IGNORECASE):
        raise CHTranslationError(
            "WITH TOTALS on ROLLUP/CUBE/GROUPING SETS is redundant — the "
            "() grouping set already emits the grand total; drop WITH TOTALS"
        )
    if not keys:
        raise CHTranslationError("WITH TOTALS: empty GROUP BY key list")
    rest = sql[m.end() :]
    if _depth0_matches(rest, re.compile(r"\bHAVING\b", re.IGNORECASE)):
        raise CHTranslationError(
            "WITH TOTALS + HAVING: the totals row's relationship to HAVING "
            "depends on ClickHouse's totals_mode setting, so no single "
            "rewrite is faithful; filter in an outer query around the "
            "GROUPING SETS form instead"
        )
    return (
        sql[: gb.start()]
        + f"GROUP BY GROUPING SETS (({keys}), ())"
        + rest
    )


def translate_ch_sql(sql: str) -> str:
    """ClickHouse-dialect SQL text → Spark SQL text (documented subset)."""
    if _ASOF_JOIN.search(sql):
        raise CHTranslationError(
            "ASOF JOIN is not single-statement-expressible in Spark SQL; "
            "use chainhouse_spark.operators.asof (same semantics, tested "
            "against DuckDB's native ASOF)"
        )
    if _ANY_JOIN.search(sql):
        raise CHTranslationError(
            "ANY JOIN keeps at most one (arbitrary) match per row — a "
            "silent rewrite to a plain join would change row counts; "
            "deduplicate the right side explicitly (dropDuplicates / "
            "row_number() = 1) to state which match you want"
        )
    # Strip FORMAT/SETTINGS tails BEFORE the LIMIT BY rewrite: _TAIL_LIMIT
    # anchors at end-of-string, so 'LIMIT 3 BY a SETTINGS ...' would
    # otherwise swallow the tail into the PARTITION BY list.
    sql = _FORMAT_TAIL.sub("", sql.rstrip())
    sql = _SETTINGS_TAIL.sub("", sql.rstrip())
    # WITH TOTALS before QUALIFY/LIMIT BY: those rewrites wrap the
    # statement in subqueries, which would push a top-level WITH TOTALS
    # below depth 0 and turn it into an error.
    sql = _rewrite_with_totals(sql)
    # QUALIFY before LIMIT BY: the LIMIT BY rewrite wraps the statement in
    # subqueries, which would push a top-level QUALIFY below depth 0.
    sql = _rewrite_qualify(sql)
    sql = _rewrite_limit_by(sql)
    if _WITH_FILL.search(sql):
        raise CHTranslationError(
            "ORDER BY ... WITH FILL generates spine rows the sort cannot "
            "emit in Spark; join against an explicit sequence() spine "
            "instead (the ts_minute_spine_gapfill query is the recipe)"
        )
    sql = _FINAL.sub(r"\1", sql)
    # SAMPLE after FINAL strip: ClickHouse orders them `FROM t FINAL
    # SAMPLE f`, and the table-ref regex must see the table name adjacent.
    sql = _rewrite_sample(sql)
    sql = _rewrite_array_join(sql)
    sql = _GLOBAL.sub("", sql)
    sql = _PREWHERE.sub("WHERE", sql)
    return _translate_calls(sql).strip()


def ch_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Translate and execute a ClickHouse-dialect query on Spark."""
    return spark.sql(translate_ch_sql(sql))
