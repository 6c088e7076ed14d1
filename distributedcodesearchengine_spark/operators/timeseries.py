"""Time-series operators over the ``events`` table — the operator
family a large-scale pipeline needs that Spark lacks as primitives,
re-expressed as compositions of built-in DataFrame ops (no UDFs):

- hypertable rollup: time_bucket aggregation (continuous-aggregate
  analog) — ``date_trunc`` + groupBy, fully map-side partial-agg'd;
- AS-OF join: latest right-row at-or-before each left row, expressed as
  a tagged union + ``last(ignorenulls)`` running window — ONE shuffle
  on (user) instead of a range join; the DuckDB oracle uses its native
  ``ASOF LEFT JOIN``, pinning the semantics;
- sessionization: gap-based session counting via lag + running sum;
- JSON property extraction: ``get_json_object`` aggregation.

Timestamps are emitted as epoch seconds/micros (BIGINT) so the
cross-engine hash never depends on timezone rendering. Scale notes:
every operator is one hash shuffle (user_id or bucket key) with
windows reusing that clustering; nothing is quadratic, nothing
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.rounding import round6, round6_sql

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


def events_rollup(events: DataFrame) -> DataFrame:
    """(bucket, event_type, n_events, total_value, n_users) — hourly
    hypertable rollup."""
    return (
        events.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            round6(F.sum("value")).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("bucket", "event_type")
    )


def events_rollup_sql() -> str:
    return (
        "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "event_type, count(*) AS n_events, "
        f"{round6_sql('sum(value)')} AS total_value, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"
    )


def events_asof_join(
    events: DataFrame, left_type: str = "purchase", right_type: str = "signup"
) -> DataFrame:
    """(event_id, user_id, value, asof_us) — for each ``left_type``
    event, the epoch-micros timestamp of the user's latest
    ``right_type`` event at-or-before it (NULL if none).

    Spark has no ASOF JOIN; a range join would be O(L x R) per user.
    Composition: tag both sides, ONE window over (user_id, ts) with
    ``last(right_ts, ignorenulls=True)`` carrying the most recent right
    timestamp forward; right rows sort before left rows on ties so
    equal timestamps match (the <= semantics of DuckDB's ASOF)."""
    tagged = events.where(F.col("event_type").isin([left_type, right_type])).select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.when(
            F.col("event_type") == right_type,
            F.unix_micros(F.col("ts").cast("timestamp")),
        ).alias("right_us"),
        F.when(F.col("event_type") == right_type, F.lit(0)).otherwise(1).alias("_k"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "_k")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.withColumn("asof_us", F.last("right_us", ignorenulls=True).over(w))
    return (
        out.where(F.col("event_type") == left_type)
        .select("event_id", "user_id", round6("value").alias("value"), "asof_us")
        .orderBy("event_id")
    )


def events_asof_join_sql(
    left_type: str = "purchase", right_type: str = "signup"
) -> str:
    return (
        "SELECT p.event_id, p.user_id, "
        f"{round6_sql('p.value')} AS value, "
        "CAST(epoch_us(s.ts) AS BIGINT) AS asof_us "
        f"FROM (SELECT * FROM events WHERE event_type = '{left_type}') p "
        "ASOF LEFT JOIN "
        f"(SELECT * FROM events WHERE event_type = '{right_type}') s "
        "ON p.user_id = s.user_id AND p.ts >= s.ts "
        "ORDER BY p.event_id"
    )


def events_sessions(events: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """(user_id, n_sessions, n_events) — gap-based sessionization: a new
    session starts when the inter-event gap exceeds ``gap_us``."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    d = events.select("user_id", "ts", "event_id").withColumn(
        "prev_us", F.lag(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
    )
    d = d.withColumn(
        "new_sess",
        F.when(
            F.col("prev_us").isNull()
            | (F.unix_micros(F.col("ts").cast("timestamp")) - F.col("prev_us") > gap_us),
            1,
        ).otherwise(0),
    )
    return (
        d.groupBy("user_id")
        .agg(
            F.sum("new_sess").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


def events_sessions_sql(gap_us: int = SESSION_GAP_US) -> str:
    return (
        "WITH d AS (SELECT user_id, epoch_us(ts) AS us, "
        "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us "
        "FROM events) "
        "SELECT user_id, "
        f"CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > {gap_us} "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions, "
        "count(*) AS n_events FROM d GROUP BY user_id ORDER BY user_id"
    )


def events_json_extract(events: DataFrame) -> DataFrame:
    """(event_type, total_k) — JSON property extraction + rollup
    (``get_json_object`` stays JVM-side; no Python)."""
    return (
        events.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("total_k"))
        .orderBy("event_type")
    )


def events_json_extract_sql() -> str:
    # TRY_CAST, not CAST: regexp_extract yields '' when props carries no
    # "k" and CAST('' AS BIGINT) throws — Spark's get_json_object returns
    # NULL in that regime, which sum() skips on both engines. The
    # whitespace class is JSON-spec whitespace (space/tab/LF/CR), the
    # set the real JSON parser on the Spark side accepts there
    return (
        "SELECT event_type, "
        r"CAST(sum(TRY_CAST(regexp_extract(props, '\"k\":[ \t\n\r]*(\d+)', 1) AS BIGINT)) AS BIGINT) AS total_k "
        "FROM events GROUP BY event_type ORDER BY event_type"
    )


def events_latest(events: DataFrame) -> DataFrame:
    """(user_id, ts_us, event_id, event_type, value) — newest event per
    key: the crawl-snapshot dedup pattern (keep the latest version per
    URL across recrawls) on this corpus's key space.

    Scale shape: ONE groupBy with a map-side-combinable struct-max —
    each partition reduces its versions to one candidate before the
    shuffle, so the exchange carries one row per (partition, key), not
    one per version. The naive ``row_number() OVER (PARTITION BY key
    ORDER BY ts DESC)`` form shuffles and sorts EVERY version of every
    key — at recrawl-heavy web scale that's the whole history moving.
    Tiebreak: struct comparison is lexicographic (ts, then event_id),
    deterministic for same-instant versions.
    """
    latest = events.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type", "value")).alias("m")
    )
    return latest.select(
        "user_id",
        F.unix_micros(F.col("m.ts").cast("timestamp")).alias("ts_us"),
        F.col("m.event_id").alias("event_id"),
        F.col("m.event_type").alias("event_type"),
        F.col("m.value").alias("value"),
    ).orderBy("user_id")


def events_latest_sql() -> str:
    return (
        "WITH r AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, "
        "event_id, event_type, value, "
        "row_number() OVER (PARTITION BY user_id "
        "ORDER BY ts DESC, event_id DESC) AS rn FROM events) "
        "SELECT user_id, ts_us, event_id, event_type, value "
        "FROM r WHERE rn = 1 ORDER BY user_id"
    )


def events_pipeline_aggs(events: DataFrame, event_type: str = "click") -> DataFrame:
    """(bucket, n_events, cum_n, delta_n, mavg3) — the ES pipeline
    aggregations (cumulative_sum / derivative / moving average, window
    3) over one event type's hourly date-histogram:

    - ``cum_n``: running total of n_events in bucket order (exact);
    - ``delta_n``: n_events - lag(n_events) (exact; first bucket 0 —
      coalesced on both engines rather than ES's emit-nothing, which a
      relational row can't express without a NULL-dtype hazard);
    - ``mavg3``: sum over the last 3 observed buckets * 1.0 / their
      count — exact integer frame sums, ONE float division.

    Buckets are the observed ones (min_doc_count=1 semantics): the
    derivative is per observed bucket, identical on both engines.

    Scale note: the window runs over ONE series ordered by bucket —
    its row count is bounded by the calendar (hours in the retention
    window), not the corpus; at scale the same plan partitions by
    series key (event_type here) and each partition stays
    calendar-bounded. No corpus-sized single-partition sort exists."""
    from pyspark.sql.window import Window

    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy("bucket")
    frame3 = w.rowsBetween(-2, 0)
    cum = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        base.select(
            "bucket",
            "n_events",
            F.sum("n_events").over(cum).cast("long").alias("cum_n"),
            F.coalesce(
                F.col("n_events") - F.lag("n_events", 1).over(w), F.lit(0)
            ).cast("long").alias("delta_n"),
            round6(
                F.sum("n_events").over(frame3).cast("double")
                * F.lit(1.0)
                / F.count("n_events").over(frame3)
            ).alias("mavg3"),
        )
        .orderBy("bucket")
    )


def events_pipeline_aggs_sql(event_type: str = "click") -> str:
    """DuckDB mirror of events_pipeline_aggs: identical frames
    (ROWS BETWEEN), identical coalesce for the first derivative,
    identical sum * 1.0 / count operand sequence."""
    et = event_type.replace("'", "''")
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1) "
        "SELECT bucket, n_events, "
        "CAST(sum(n_events) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n, "
        "CAST(coalesce(n_events - lag(n_events, 1) OVER (ORDER BY bucket), 0) AS BIGINT) AS delta_n, "
        f"{round6_sql('CAST(sum(n_events) OVER (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) * 1.0 / count(n_events) OVER (ORDER BY bucket ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)')} AS mavg3 "
        "FROM base ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# auto_date_histogram
# --------------------------------------------------------------------------

# the ES auto_date_histogram interval ladder, in seconds (fixed-width
# calendar approximations — week = 7d, month = 30d; fixed widths keep
# the bucketing pure integer arithmetic on both engines)
AUTO_INTERVALS_S = (60, 300, 600, 1800, 3600, 10800, 43200, 86400,
                    604800, 2592000)


def auto_date_histogram(
    events: DataFrame, event_type: str = "click", target_buckets: int = 12
) -> DataFrame:
    """(bucket, n_events, interval_s) — the ES ``auto_date_histogram``:
    pick the SMALLEST ladder interval whose bucket span fits
    ``target_buckets``, then the observed-bucket histogram at that
    interval. The span count is pure integer arithmetic over epoch
    seconds (max_e DIV i - min_e DIV i + 1), so the interval choice is
    bit-identical on both engines; if even the coarsest interval
    overflows the target, the coarsest is used (ES's terminal-rounding
    behavior).

    Scale: the min/max is one map-side-combinable agg (2 longs to the
    driver); the histogram is the standard bucket groupBy. Nothing
    depends on bucket count beyond the output itself."""
    if int(target_buckets) < 1:
        raise ValueError(f"target_buckets must be >= 1: {target_buckets!r}")
    base = events.where(F.col("event_type") == event_type).select(
        F.unix_timestamp("ts").alias("e")
    )
    row = base.agg(F.min("e").alias("lo"), F.max("e").alias("hi")).first()
    spark = events.sparkSession
    out = "bucket long, n_events long, interval_s long"
    if row["lo"] is None:
        return spark.createDataFrame([], out)
    lo, hi = int(row["lo"]), int(row["hi"])
    interval = AUTO_INTERVALS_S[-1]
    for i in AUTO_INTERVALS_S:
        if (hi // i) - (lo // i) + 1 <= int(target_buckets):
            interval = i
            break
    return (
        base.groupBy(
            ((F.col("e") - (F.col("e") % F.lit(interval)))).alias("bucket")
        )
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            F.col("bucket").cast("long"),
            "n_events",
            F.lit(interval).cast("long").alias("interval_s"),
        )
        .orderBy("bucket")
    )


def auto_date_histogram_sql(
    event_type: str = "click", target_buckets: int = 12
) -> str:
    """DuckDB mirror: the ladder as VALUES, the identical integer span
    rule picking min(interval), the identical e - e % i bucketing.
    (Python's // and SQL's integer ops agree here because epoch seconds
    are non-negative.)"""
    et = event_type.replace("'", "''")
    ladder = ", ".join(f"({i})" for i in AUTO_INTERVALS_S)
    t = int(target_buckets)
    coarsest = AUTO_INTERVALS_S[-1]
    return (
        f"WITH base AS (SELECT CAST(epoch(ts) AS BIGINT) AS e FROM events "
        f"WHERE event_type = '{et}'), "
        "mm AS (SELECT min(e) AS lo, max(e) AS hi FROM base), "
        f"ladder(i) AS (VALUES {ladder}), "
        "pick AS (SELECT min(i) AS interval_s FROM ladder, mm "
        f"WHERE (hi // i) - (lo // i) + 1 <= {t}), "
        f"iv AS (SELECT CAST(coalesce((SELECT interval_s FROM pick), {coarsest}) AS BIGINT) AS i) "
        "SELECT CAST(e - (e % (SELECT i FROM iv)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "(SELECT i FROM iv) AS interval_s "
        "FROM base GROUP BY 1 ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# sibling pipeline aggregations (max/min/avg/sum/stats_bucket)
# --------------------------------------------------------------------------


def events_bucket_stats(
    events: DataFrame, event_type: str = "click"
) -> DataFrame:
    """1 row (n_buckets, min_n, max_n, sum_n, avg_n, max_bucket,
    min_bucket) — the ES SIBLING pipeline aggs (stats_bucket +
    max_bucket/min_bucket over a date_histogram): the rollup OF the
    hourly buckets, not of the events. ES's max_bucket returns the
    keys achieving the max; the scalar-gate form reports the FIRST
    (smallest epoch) such bucket on each side. Counts are exact
    integers; avg_n is the house sum * 1.0 / count float tail.

    Scale: one bucket groupBy (calendar-bounded output) + one
    single-row rollup of those buckets."""
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    one = base.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
        F.sum("n").cast("long").alias("sum_n"),
        round6(
            F.sum("n").cast("double") * F.lit(1.0) / F.count("*")
        ).alias("avg_n"),
    )
    # extremal bucket keys via the 1-row scalar-fold broadcast (the
    # house BNLJ Cross BuildRight shape), never a window over the set
    ext = (
        base.crossJoin(
            F.broadcast(one.select(
                F.col("max_n").alias("_mx"), F.col("min_n").alias("_mn")
            ))
        )
        .agg(
            F.min(
                F.when(F.col("n") == F.col("_mx"), F.col("bucket"))
            ).alias("max_bucket"),
            F.min(
                F.when(F.col("n") == F.col("_mn"), F.col("bucket"))
            ).alias("min_bucket"),
        )
    )
    return one.crossJoin(F.broadcast(ext))


def events_bucket_stats_sql(event_type: str = "click") -> str:
    et = event_type.replace("'", "''")
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1) "
        "SELECT CAST(count(*) AS BIGINT) AS n_buckets, "
        "min(n) AS min_n, max(n) AS max_n, CAST(sum(n) AS BIGINT) AS sum_n, "
        f"{round6_sql('CAST(sum(n) AS DOUBLE) * 1.0 / count(*)')} AS avg_n, "
        "min(CASE WHEN n = (SELECT max(n) FROM base) THEN bucket END) AS max_bucket, "
        "min(CASE WHEN n = (SELECT min(n) FROM base) THEN bucket END) AS min_bucket "
        "FROM base"
    )


# --------------------------------------------------------------------------
# serial_diff pipeline aggregation
# --------------------------------------------------------------------------


def events_serial_diff(
    events: DataFrame, event_type: str = "click", lag: int = 2
) -> DataFrame:
    """(bucket, n_events, diff_n) — the ES ``serial_diff`` pipeline agg
    at lag ``lag`` over the hourly date-histogram: n - lag_n(n) in
    observed-bucket order, the seasonal-differencing primitive. The
    first ``lag`` buckets coalesce to 0 (the delta_n precedent —
    ES's emit-nothing has no NULL-dtype-safe relational analog).

    Scale: one calendar-bounded window per series, same shape as
    events_pipeline_aggs."""
    if int(lag) < 1:
        raise ValueError(f"lag must be >= 1: {lag!r}")
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy("bucket")
    return (
        base.select(
            "bucket",
            "n_events",
            F.coalesce(
                F.col("n_events") - F.lag("n_events", int(lag)).over(w),
                F.lit(0),
            ).cast("long").alias("diff_n"),
        )
        .orderBy("bucket")
    )


def events_serial_diff_sql(event_type: str = "click", lag: int = 2) -> str:
    et = event_type.replace("'", "''")
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1) "
        "SELECT bucket, n_events, "
        f"CAST(coalesce(n_events - lag(n_events, {int(lag)}) OVER (ORDER BY bucket), 0) AS BIGINT) AS diff_n "
        "FROM base ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# bucket_script + bucket_selector pipeline aggregations
# --------------------------------------------------------------------------


def events_bucket_script(
    events: DataFrame, event_type: str = "click", min_events: int = 2
) -> DataFrame:
    """(bucket, n_events, total_value, value_per_event) — the ES
    ``bucket_script`` + ``bucket_selector`` pipeline aggs over the
    hourly date-histogram: per bucket, the derived metric
    total_value * 1.0 / n_events (the script), keeping only buckets
    with n_events >= ``min_events`` (the selector — ES's HAVING).

    Parity: total_value is a float sum, so it folds in canonical
    event_id order on both engines (the house double-sum rule); the
    script is ONE division on the folded total. Scale: one bucket
    shuffle; the fold is per-bucket (bounded by bucket occupancy) and
    map-side-combinable via the struct collect."""
    if int(min_events) < 1:
        raise ValueError(f"min_events must be >= 1: {min_events!r}")
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("event_id", "value"))),
                F.lit(0.0),
                lambda acc, x: acc + x["value"],
            ).alias("tv"),
        )
        .where(F.col("n_events") >= int(min_events))
    )
    return base.select(
        "bucket",
        "n_events",
        round6("tv").alias("total_value"),
        round6(F.col("tv") * F.lit(1.0) / F.col("n_events")).alias(
            "value_per_event"
        ),
    ).orderBy("bucket")


def events_bucket_script_sql(
    event_type: str = "click", min_events: int = 2
) -> str:
    et = event_type.replace("'", "''")
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "sum(value ORDER BY event_id) AS tv FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1 "
        f"HAVING count(*) >= {int(min_events)}) "
        "SELECT bucket, n_events, "
        f"{round6_sql('tv')} AS total_value, "
        f"{round6_sql('tv * 1.0 / n_events')} AS value_per_event "
        "FROM base ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# date_range aggregation
# --------------------------------------------------------------------------


_RANGE_KEY_RE = __import__("re").compile(r"^[A-Za-z0-9_]{1,40}$")


def _check_range_keys(ranges) -> None:
    """Range keys become column names and SQL literals on both engines
    — restrict to identifier-safe shapes (F8 validation, never an
    injection or an unparseable plan)."""
    if not ranges:
        raise ValueError("ranges must be non-empty")
    keys = [str(k) for k, _f, _t in ranges]
    bad = [k for k in keys if not _RANGE_KEY_RE.match(k)]
    if bad:
        raise ValueError(
            f"range keys must match [A-Za-z0-9_]{{1,40}}: {bad}"
        )
    if len(set(keys)) != len(keys):
        raise ValueError(f"duplicate range keys: {keys}")


def events_date_range(
    events: DataFrame,
    event_type: str,
    ranges,  # [(key, from_epoch_s | None, to_epoch_s | None)]
) -> DataFrame:
    """(range_key, n_events) — the ES ``date_range`` agg: named
    half-open [from, to) epoch-second buckets over one event type's
    timestamps. Every requested range is ALWAYS present (count 0 when
    empty — ES date_range, unlike the histogram's min_doc_count=1),
    open ends unbounded. Rows in range_key order (deterministic
    cross-engine order; ES returns definition order, a presentation
    detail).

    Scale shape: ranges may overlap (ES allows it), so the reduction
    is ONE conditional-agg pass over the event_type-pruned scan — one
    count(when(...)) column per range, the filters-agg shape — with
    the per-range fan-out a driver-side stack over the single agg row.
    Nothing corpus-sized moves.
    """
    _check_range_keys(ranges)
    keys = [str(k) for k, _f, _t in ranges]
    ep = F.unix_timestamp("ts")
    aggs = []
    for key, lo, hi in ranges:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ep >= int(lo))
        if hi is not None:
            cond = cond & (ep < int(hi))
        aggs.append(
            F.count(F.when(cond, 1)).cast("long").alias(f"_r_{key}")
        )
    one = events.where(F.col("event_type") == event_type).agg(*aggs)
    spark = events.sparkSession
    stack = ", ".join(f"'{k}', _r_{k}" for k in keys)
    return (
        one.selectExpr(
            f"stack({len(keys)}, {stack}) AS (range_key, n_events)"
        )
        .orderBy("range_key")
    )


def events_date_range_sql(event_type: str, ranges) -> str:
    """DuckDB mirror of events_date_range: identical conditional-agg
    pass + UNION ALL fan-out, range_key order."""
    _check_range_keys(ranges)
    et = event_type.replace("'", "''")
    cols = []
    parts = []
    for key, lo, hi in ranges:
        conds = []
        if lo is not None:
            conds.append(f"CAST(epoch(ts) AS BIGINT) >= {int(lo)}")
        if hi is not None:
            conds.append(f"CAST(epoch(ts) AS BIGINT) < {int(hi)}")
        w = " AND ".join(conds) if conds else "true"
        cols.append(
            f"CAST(count(*) FILTER (WHERE {w}) AS BIGINT) AS \"_r_{key}\""
        )
        parts.append(f"SELECT '{key}' AS range_key, \"_r_{key}\" AS n_events FROM one")
    return (
        f"WITH one AS (SELECT {', '.join(cols)} FROM events "
        f"WHERE event_type = '{et}') "
        f"SELECT * FROM ({' UNION ALL '.join(parts)}) ORDER BY range_key"
    )


# --------------------------------------------------------------------------
# rate aggregation
# --------------------------------------------------------------------------

_RATE_UNITS_S = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}


def events_rate(
    events: DataFrame, event_type: str, unit: str = "minute"
) -> DataFrame:
    """(bucket, n_events, rate) — the ES ``rate`` agg inside an hourly
    date-histogram: each bucket's event count rescaled to events per
    ``unit`` (rate = count * unit_seconds / 3600). Observed buckets
    only (the histogram family's min_doc_count=1 contract). The rate
    is ONE float multiply-divide over an exact integer count, spelled
    ``CAST(n AS DOUBLE) * unit_s / 3600.0`` on both engines."""
    if unit not in _RATE_UNITS_S:
        raise ValueError(f"unit must be one of {sorted(_RATE_UNITS_S)}: {unit!r}")
    us = float(_RATE_UNITS_S[unit])
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    return base.select(
        "bucket",
        "n_events",
        round6(
            F.col("n_events").cast("double") * F.lit(us) / F.lit(3600.0)
        ).alias("rate"),
    ).orderBy("bucket")


def events_rate_sql(event_type: str, unit: str = "minute") -> str:
    if unit not in _RATE_UNITS_S:
        raise ValueError(f"unit must be one of {sorted(_RATE_UNITS_S)}: {unit!r}")
    us = float(_RATE_UNITS_S[unit])
    et = event_type.replace("'", "''")
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1) "
        "SELECT bucket, n_events, "
        f"{round6_sql(f'CAST(n_events AS DOUBLE) * {us} / 3600.0')} AS rate "
        "FROM base ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# top_metrics aggregation
# --------------------------------------------------------------------------


def events_top_metrics(events: DataFrame, event_type: str) -> DataFrame:
    """(bucket, event_id, value, user_id) — the ES ``top_metrics`` agg
    inside an hourly date-histogram: per bucket, the metrics row of the
    (value desc, event_id asc) top event — 'the metrics of the row that
    sorts first', which a plain max(value) cannot express (the OTHER
    columns ride along).

    Scale shape: ONE groupBy with a map-side-combinable struct-max
    (value, -event_id) — the events_latest anti-skew shape: each
    partition reduces to one candidate per bucket before the shuffle,
    so recrawl-heavy buckets never move their history. The naive
    row_number() window would shuffle and sort every event."""
    top = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(
            F.max(
                F.struct(
                    "value", (-F.col("event_id")).alias("_neg_id"),
                    "event_id", "user_id",
                )
            ).alias("m")
        )
    )
    return top.select(
        "bucket",
        F.col("m.event_id").alias("event_id"),
        round6(F.col("m.value")).alias("value"),
        F.col("m.user_id").alias("user_id"),
    ).orderBy("bucket")


def events_top_metrics_sql(event_type: str) -> str:
    et = event_type.replace("'", "''")
    return (
        "WITH r AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "event_id, value, user_id, "
        "row_number() OVER (PARTITION BY date_trunc('hour', ts) "
        "ORDER BY value DESC, event_id ASC) AS rn FROM events "
        f"WHERE event_type = '{et}') "
        "SELECT bucket, event_id, "
        f"{round6_sql('value')} AS value, user_id "
        "FROM r WHERE rn = 1 ORDER BY bucket"
    )


def events_normalize(
    events: DataFrame, event_type: str = "click", method: str = "percent_of_sum"
) -> DataFrame:
    """(bucket, n_events, norm) — the ES ``normalize`` pipeline
    aggregation over one event type's hourly date-histogram:
    ``percent_of_sum`` (n * 1.0 / total) or ``rescale_0_1``
    ((n - min) * 1.0 / (max - min); a constant series normalizes to
    0.0, the ES degenerate rule). Bucket counts / totals / extremes
    are exact integers (map-side combinable + a 1-row broadcast), so
    the single per-row float division is the only inexact op and both
    engines spell it identically."""
    if method not in ("percent_of_sum", "rescale_0_1"):
        raise ValueError(
            f"unknown method {method!r}; valid: percent_of_sum, rescale_0_1"
        )
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    tot = base.agg(
        F.sum("n_events").cast("long").alias("_t"),
        F.min("n_events").cast("long").alias("_mn"),
        F.max("n_events").cast("long").alias("_mx"),
    )
    j = base.crossJoin(F.broadcast(tot))
    if method == "percent_of_sum":
        norm = F.col("n_events") * F.lit(1.0) / F.col("_t")
    else:
        norm = F.when(
            F.col("_mx") > F.col("_mn"),
            (F.col("n_events") - F.col("_mn")) * F.lit(1.0)
            / (F.col("_mx") - F.col("_mn")),
        ).otherwise(0.0)
    return j.select(
        "bucket", "n_events", round6(norm).alias("norm")
    ).orderBy("bucket")


def events_normalize_sql(
    event_type: str = "click", method: str = "percent_of_sum"
) -> str:
    et = event_type.replace("'", "''")
    if method == "percent_of_sum":
        norm = "n_events * 1.0 / (SELECT t FROM tot)"
    else:
        norm = (
            "CASE WHEN (SELECT mx FROM tot) > (SELECT mn FROM tot) "
            "THEN (n_events - (SELECT mn FROM tot)) * 1.0 / "
            "((SELECT mx FROM tot) - (SELECT mn FROM tot)) ELSE 0.0 END"
        )
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1), "
        "tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS t, "
        "CAST(min(n_events) AS BIGINT) AS mn, CAST(max(n_events) AS BIGINT) AS mx "
        "FROM base) "
        f"SELECT bucket, n_events, {round6_sql(norm)} AS norm "
        "FROM base ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# cumulative_cardinality
# --------------------------------------------------------------------------


def events_cumulative_cardinality(events: DataFrame) -> DataFrame:
    """(bucket, n_events, new_users, cum_users) — the ES
    ``cumulative_cardinality`` pipeline aggregation ("total unique
    visitors to date") over the hourly date-histogram, plus its
    derivative (``new_users``, which ES documents as the incremental
    view of the same agg), computed EXACTLY instead of ES's HLL
    approximation.

    The trick that makes the exact answer scale: a user is "new" in
    exactly the bucket of their FIRST event, so

    - per-user ``min(bucket)`` is one map-side-combinable agg (each
      partition reduces its events to one candidate long per user
      before the shuffle — the events_latest struct-max shape);
    - ``new_users`` per bucket is a second combinable count over that
      user-cardinality-bounded relation;
    - ``cum_users`` is a running sum over the CALENDAR-bounded bucket
      series (hours in the retention window, never the corpus), the
      events_pipeline_aggs window discipline — at scale the same plan
      partitions the window by series key.

    Every first-seen bucket contains at least one event, so the
    left join from the observed-bucket histogram is complete and the
    coalesce(0) only fills buckets where no user was new. All four
    columns are exact BIGINTs — cross-engine parity by construction.
    """
    bucket = F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket")
    hist = events.groupBy(bucket).agg(F.count("*").cast("long").alias("n_events"))
    first_seen = events.select(bucket, "user_id").groupBy("user_id").agg(
        F.min("bucket").alias("fb")
    )
    new_per = first_seen.groupBy(F.col("fb").alias("bucket")).agg(
        F.count("*").cast("long").alias("new_users")
    )
    w = Window.partitionBy(F.lit(1)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        hist.join(new_per, "bucket", "left")
        .select(
            "bucket",
            "n_events",
            F.coalesce("new_users", F.lit(0)).cast("long").alias("new_users"),
        )
        .withColumn("cum_users", F.sum("new_users").over(w).cast("long"))
        .orderBy("bucket")
    )


def events_cumulative_cardinality_sql() -> str:
    """DuckDB mirror of events_cumulative_cardinality: identical
    first-seen derivation, identical frame, all-integer output."""
    return (
        "WITH hist AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY 1), "
        "fs AS (SELECT user_id, min(CAST(epoch(date_trunc('hour', ts)) AS BIGINT)) AS fb "
        "FROM events GROUP BY user_id), "
        "np AS (SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS new_users "
        "FROM fs GROUP BY fb) "
        "SELECT h.bucket, h.n_events, "
        "CAST(coalesce(np.new_users, 0) AS BIGINT) AS new_users, "
        "CAST(sum(coalesce(np.new_users, 0)) OVER (ORDER BY h.bucket "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users "
        "FROM hist h LEFT JOIN np ON np.bucket = h.bucket ORDER BY h.bucket"
    )


# --------------------------------------------------------------------------
# z-score outlier buckets (date-histogram anomaly lane)
# --------------------------------------------------------------------------


def events_zscore_outliers(
    events: DataFrame, event_type: str = "click", threshold: float = 2.0
) -> DataFrame:
    """(bucket, n_events, z, outlier) — the traffic-anomaly alarm a
    crawl/ingest monitor runs over the hourly date-histogram (the
    relational form of ES's bucket_selector-over-stats pattern):
    z = (n - mean) / std over the bucket series, ``outlier`` = 1 when
    |z| >= threshold.

    Determinism: mean = exact integer sum / bucket count; variance is
    the TWO-PASS mean-centered form sum((n-mean)^2 ORDER BY bucket) /
    nb — an ordered fold over the CALENDAR-bounded series (never the
    corpus; no n^2 integer overflow at any per-bucket count), spelled
    as the same ordered sum on both engines. A constant series
    (std = 0) reports z = 0.0 / no outliers instead of dividing by
    zero (the normalize_01 degenerate rule).

    Scale: one map-side-combinable histogram agg; both passes over
    the bucket series are calendar-bounded; the stats ride a 1-row
    broadcast."""
    if not float(threshold) > 0:
        raise ValueError(f"threshold must be > 0: {threshold!r}")
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    st = base.agg(
        F.count("*").cast("long").alias("nb"),
        F.sum("n_events").cast("long").alias("s1"),
    ).first()
    nb = int(st["nb"] or 0)
    if nb == 0:
        return events.sparkSession.createDataFrame(
            [], "bucket long, n_events long, z double, outlier int"
        )
    mean = float(st["s1"]) / nb
    var_row = base.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "bucket",
                        (
                            (F.col("n_events").cast("double") - F.lit(mean))
                            * (F.col("n_events").cast("double") - F.lit(mean))
                        ).alias("sq"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, x: acc + x["sq"],
        ).alias("ssq")
    ).first()
    import math

    var = float(var_row["ssq"]) / nb
    std = math.sqrt(var)  # sqrt, never var**0.5 — pow(x, .5) is not
    # guaranteed bit-identical to the engines' IEEE sqrt
    if std > 0:
        z = (F.col("n_events").cast("double") - F.lit(mean)) / F.lit(std)
    else:
        z = F.lit(0.0)
    return (
        base.select(
            "bucket",
            "n_events",
            round6(z).alias("z"),
            F.when(
                F.abs(z) >= F.lit(float(threshold)), F.lit(1)
            ).otherwise(F.lit(0)).cast("int").alias("outlier"),
        )
        .orderBy("bucket")
    )


def events_zscore_outliers_sql(
    event_type: str = "click", threshold: float = 2.0
) -> str:
    """DuckDB mirror of events_zscore_outliers: the identical two-pass
    arithmetic — mean from the exact integer sum, variance as the
    bucket-ordered mean-centered fold, sqrt at the 1-row stage."""
    from ..functions.rounding import sql_double

    et = event_type.replace("'", "''")
    th = sql_double(float(threshold))
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1), "
        "m AS (SELECT CAST(count(*) AS BIGINT) AS nb, "
        "CAST(sum(n_events) AS DOUBLE) / count(*) AS mean FROM base), "
        "v AS (SELECT sum((CAST(n_events AS DOUBLE) - (SELECT mean FROM m)) * "
        "(CAST(n_events AS DOUBLE) - (SELECT mean FROM m)) ORDER BY bucket) "
        "/ (SELECT nb FROM m) AS var FROM base), "
        "s AS (SELECT sqrt(var) AS std FROM v) "
        "SELECT bucket, n_events, "
        + "(floor((CASE WHEN (SELECT std FROM s) > 0 "
        "THEN (CAST(n_events AS DOUBLE) - (SELECT mean FROM m)) / (SELECT std FROM s) "
        "ELSE 0.0 END) * 1000000.0 + 0.5) / 1000000.0) AS z, "
        "CAST(CASE WHEN abs(CASE WHEN (SELECT std FROM s) > 0 "
        "THEN (CAST(n_events AS DOUBLE) - (SELECT mean FROM m)) / (SELECT std FROM s) "
        f"ELSE 0.0 END) >= {th} THEN 1 ELSE 0 END AS INT) AS outlier "
        "FROM base ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# variable_width_histogram (deterministic 1-D k-means buckets)
# --------------------------------------------------------------------------


def events_variable_width_histogram(
    events: DataFrame, event_type: str = "click", k: int = 4, iters: int = 4
) -> DataFrame:
    """(bucket, key, min_val, max_val, n_events) — the ES
    ``variable_width_histogram``: k buckets whose widths adapt to the
    value distribution. ES's implementation is a shard-order-dependent
    streaming heuristic no relational engine can reproduce; ours is
    the deterministic equivalent — fixed-iteration weighted Lloyd's
    k-means (the pagerank/BPE fixed-iteration precedent) over the
    VALUE DISTRIBUTION, not the corpus:

    - values quantize to integer cents (floor(v*100 + 0.5), the round6
      arithmetic — identical on both engines) and the whole algorithm
      runs on the (cent, n) weighted relation, so every iteration is
      one map-side-combinable groupBy bounded by the distinct-value
      cardinality, never corpus-sized;
    - init: k centroids evenly spaced over [min, max] (exact integer
      extremes, one 1-row agg);
    - assign: first-min argmin |c - cent_j| (ties -> lowest j);
      update: new cent = exact Σ(c·n) / Σ(n) (two BIGINTs, one
      division); an empty cluster keeps its previous centroid;
    - output: per surviving cluster, centroid key, min/max value
      (display cents/100) and count, ordered by key.

    The k-row centroid state moves driver<->cluster per iteration
    (the trained-centroid seam's shape at k rows); the DuckDB mirror
    unrolls the same iterations as MATERIALIZED CTEs."""
    if int(k) < 2:
        raise ValueError(f"k must be >= 2: {k!r}")
    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1: {iters!r}")
    spark = events.sparkSession
    out = (
        "bucket int, key double, min_val double, max_val double, "
        "n_events long"
    )
    dist = (
        events.where(F.col("event_type") == event_type)
        .select(
            F.expr("CAST(floor(value * 100.0 + 0.5) AS BIGINT)").alias("c")
        )
        .groupBy("c")
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)
    )
    st = dist.agg(
        F.min("c").alias("mn"), F.max("c").alias("mx"), F.count("*").alias("nv")
    ).first()
    if not st["nv"]:
        return spark.createDataFrame([], out)
    mn, mx = int(st["mn"]), int(st["mx"])
    span = float(mx - mn)
    cents = [float(mn) + (j + 0.5) * (span / int(k)) for j in range(int(k))]

    cd = F.col("c").cast("double")
    for _ in range(int(iters)):
        darr = F.array(*[F.abs(cd - F.lit(c)) for c in cents])
        assign = (F.array_position(darr, F.array_min(darr)) - F.lit(1)).cast(
            "int"
        )
        rows = (
            dist.withColumn("j", assign)
            .groupBy("j")
            .agg(
                F.sum(F.col("c") * F.col("n")).cast("long").alias("s"),
                F.sum("n").cast("long").alias("w"),
            )
            .collect()
        )
        by = {int(r["j"]): r for r in rows}
        cents = [
            (float(by[j]["s"]) / float(by[j]["w"]))
            if j in by and by[j]["w"]
            else cents[j]
            for j in range(int(k))
        ]

    darr = F.array(*[F.abs(cd - F.lit(c)) for c in cents])
    assign = (F.array_position(darr, F.array_min(darr)) - F.lit(1)).cast("int")
    key_arr = F.array(*[F.lit(c) for c in cents])
    agg = (
        dist.withColumn("j", assign)
        .groupBy("j")
        .agg(
            F.min("c").alias("cmin"),
            F.max("c").alias("cmax"),
            F.sum("n").cast("long").alias("n_events"),
        )
        .withColumn("key", F.element_at(key_arr, F.col("j") + F.lit(1)))
    )
    w = Window.orderBy(F.asc("key"), F.asc("j"))
    return (
        agg.withColumn("bucket", F.row_number().over(w))
        .select(
            "bucket",
            round6(F.col("key") / F.lit(100.0)).alias("key"),
            round6(F.col("cmin").cast("double") / F.lit(100.0)).alias("min_val"),
            round6(F.col("cmax").cast("double") / F.lit(100.0)).alias("max_val"),
            "n_events",
        )
        .orderBy("bucket")
    )


def events_variable_width_histogram_sql(
    event_type: str = "click", k: int = 4, iters: int = 4
) -> str:
    """DuckDB mirror of events_variable_width_histogram: the identical
    init / first-min assign / exact-integer mean update unrolled as
    MATERIALIZED CTE pairs (the pagerank CTE-inlining lesson), with a
    j-spine + coalesce keeping every level k rows so an empty cluster
    falls back to its previous centroid without expression blowup."""
    if int(k) < 2:
        raise ValueError(f"k must be >= 2: {k!r}")
    if int(iters) < 1:
        raise ValueError(f"iters must be >= 1: {iters!r}")
    et = event_type.replace("'", "''")
    kk = int(k)

    def cent_ref(level: int, j: int) -> str:
        return f"(SELECT cent FROM c{level} WHERE j = {j})"

    def assign_case(level: int) -> str:
        ds = [
            f"abs(CAST(c AS DOUBLE) - {cent_ref(level, j)})" for j in range(kk)
        ]
        whens = []
        for j in range(kk - 1):
            conds = " AND ".join(
                f"{ds[j]} <= {ds[i]}" for i in range(j + 1, kk)
            )
            whens.append(f"WHEN {conds} THEN {j}")
        return "CASE " + " ".join(whens) + f" ELSE {kk - 1} END"

    parts = [
        "base AS MATERIALIZED (SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1)",
        "st AS (SELECT min(c) AS mn, max(c) AS mx FROM base)",
        "jspine AS (SELECT unnest(generate_series(0, "
        f"{kk - 1})) AS j)",
        "c0 AS MATERIALIZED (SELECT j, CAST((SELECT mn FROM st) AS DOUBLE) + "
        "(j + 0.5e0) * (CAST((SELECT mx FROM st) - (SELECT mn FROM st) "
        f"AS DOUBLE) / {kk}) AS cent FROM jspine)",
    ]
    for t in range(1, int(iters) + 1):
        parts.append(
            f"a{t} AS MATERIALIZED (SELECT c, n, {assign_case(t - 1)} AS j "
            "FROM base)"
        )
        parts.append(
            f"c{t} AS MATERIALIZED (SELECT js.j, coalesce("
            "CAST(ag.s AS DOUBLE) / CAST(ag.w AS DOUBLE), prev.cent) AS cent "
            "FROM jspine js "
            f"LEFT JOIN (SELECT j, sum(c * n) AS s, sum(n) AS w FROM a{t} "
            "GROUP BY j) ag ON ag.j = js.j AND ag.w > 0 "
            f"LEFT JOIN c{t - 1} prev ON prev.j = js.j)"
        )
    fin = int(iters)
    parts.append(
        f"af AS MATERIALIZED (SELECT c, n, {assign_case(fin)} AS j FROM base)"
    )
    parts.append(
        "agg AS (SELECT af.j, min(c) AS cmin, max(c) AS cmax, "
        "CAST(sum(n) AS BIGINT) AS n_events FROM af GROUP BY af.j)"
    )
    r6 = "(floor(({x}) * 1000000.0 + 0.5) / 1000000.0)"
    return (
        "WITH "
        + ", ".join(parts)
        + ", fin AS (SELECT agg.*, c"
        + str(fin)
        + ".cent AS key FROM agg JOIN c"
        + str(fin)
        + " ON c"
        + str(fin)
        + ".j = agg.j) "
        "SELECT CAST(row_number() OVER (ORDER BY key ASC, j ASC) AS INT) AS bucket, "
        + r6.format(x="key / 100.0")
        + " AS key, "
        + r6.format(x="CAST(cmin AS DOUBLE) / 100.0")
        + " AS min_val, "
        + r6.format(x="CAST(cmax AS DOUBLE) / 100.0")
        + " AS max_val, n_events "
        "FROM fin ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# simple exponential smoothing (the ES moving_fn holt family, level-only)
# --------------------------------------------------------------------------


def events_ses_forecast(
    events: DataFrame, event_type: str = "click", alpha: float = 0.3
) -> DataFrame:
    """(n_buckets, last_bucket, level) — simple exponential smoothing
    over the hourly date-histogram: s_1 = x_1, s_t = alpha*x_t +
    (1-alpha)*s_{t-1}; ``level`` is the final state == the one-step-
    ahead forecast (the level-only member of the ES ``moving_fn``
    holt family, reduced to its serving output).

    The recurrence is inherently sequential, so it runs as the house
    sequential-state fold (the ERR precedent): a 2-slot [level, seen]
    array accumulator folded in bucket order — Spark ``aggregate``
    over the sorted bucket list == DuckDB ``list_reduce`` over the
    bucket-ordered list with a prepended [0,0] initial state, the
    identical op sequence. alpha and (1-alpha) embed as the same
    Python-computed literals on both engines.

    Scale: the fold runs over the CALENDAR-bounded series (the
    events_pipeline_aggs window discipline), after one map-side-
    combinable histogram agg."""
    if not (0.0 < float(alpha) <= 1.0):
        raise ValueError(f"alpha must be in (0, 1]: {alpha!r}")
    a = float(alpha)
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    arr = F.array_sort(
        F.collect_list(F.struct("bucket", F.col("n_events").alias("n")))
    )
    fold = F.aggregate(
        arr,
        F.array(F.lit(0.0), F.lit(0.0)),
        lambda acc, x: F.array(
            F.when(
                F.element_at(acc, 2) == F.lit(0.0), x["n"].cast("double")
            ).otherwise(
                F.lit(a) * x["n"].cast("double")
                + F.lit(1.0 - a) * F.element_at(acc, 1)
            ),
            F.lit(1.0),
        ),
    )
    return base.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.max("bucket").alias("last_bucket"),
        round6(F.element_at(fold, 1)).alias("level"),
    )


def events_ses_forecast_sql(
    event_type: str = "click", alpha: float = 0.3
) -> str:
    """DuckDB mirror of events_ses_forecast: list_reduce over the
    bucket-ordered [x, 1] pairs with the prepended [0, 0] init (the
    e0-suffixed DOUBLE literals — the ERR DECIMAL-fold hazard)."""
    from ..functions.rounding import sql_double

    if not (0.0 < float(alpha) <= 1.0):
        raise ValueError(f"alpha must be in (0, 1]: {alpha!r}")
    et = event_type.replace("'", "''")
    a = sql_double(float(alpha))
    c1 = sql_double(1.0 - float(alpha))
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1), "
        "seq AS (SELECT list_prepend([0.0e0, 0.0e0], "
        "list(ARRAY[CAST(n_events AS DOUBLE), 1.0e0] ORDER BY bucket)) AS xs, "
        "CAST(count(*) AS BIGINT) AS n_buckets, max(bucket) AS last_bucket "
        "FROM base), "
        "f AS (SELECT n_buckets, last_bucket, "
        "list_reduce(xs, (acc, x) -> [CASE WHEN acc[2] = 0.0e0 THEN x[1] "
        f"ELSE {a} * x[1] + {c1} * acc[1] END, 1.0e0]) AS st FROM seq) "
        "SELECT n_buckets, last_bucket, "
        f"{round6_sql('st[1]')} AS level FROM f"
    )


# --------------------------------------------------------------------------
# bucket_sort + percentiles_bucket (remaining ES pipeline aggs)
# --------------------------------------------------------------------------


def events_bucket_sort(
    events: DataFrame, event_type: str = "click", frm: int = 0, size: int = 5
) -> DataFrame:
    """(bucket, n_events) — the ES ``bucket_sort`` pipeline agg over
    the hourly date-histogram: the parent's buckets re-ordered by
    their metric (n_events desc, bucket asc — deterministic ties) with
    ``from``/``size`` truncation, the "top N busiest hours" view.
    Calendar-bounded window rank + one filter; at scale the window
    partitions by series key."""
    if int(frm) < 0 or int(size) < 1:
        raise ValueError(f"need frm >= 0 and size >= 1: {frm!r}, {size!r}")
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy(
        F.desc("n_events"), F.asc("bucket")
    )
    return (
        base.withColumn("rn", F.row_number().over(w))
        .where(
            (F.col("rn") > int(frm)) & (F.col("rn") <= int(frm) + int(size))
        )
        .select("bucket", "n_events")
        .orderBy(F.desc("n_events"), F.asc("bucket"))
    )


def events_bucket_sort_sql(
    event_type: str = "click", frm: int = 0, size: int = 5
) -> str:
    if int(frm) < 0 or int(size) < 1:
        raise ValueError(f"need frm >= 0 and size >= 1: {frm!r}, {size!r}")
    et = event_type.replace("'", "''")
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1), "
        "r AS (SELECT bucket, n_events, row_number() OVER "
        "(ORDER BY n_events DESC, bucket ASC) AS rn FROM base) "
        "SELECT bucket, n_events FROM r "
        f"WHERE rn > {int(frm)} AND rn <= {int(frm) + int(size)} "
        "ORDER BY n_events DESC, bucket ASC"
    )


def events_percentiles_bucket(
    events: DataFrame, event_type: str = "click"
) -> DataFrame:
    """(stat, value) — the ES ``percentiles_bucket`` pipeline agg:
    exact type-1 (lower) quantiles of the per-bucket counts (min / p25
    / p50 / p75 / max at rank ceil(q*n), the bm25_boxplot integer-rank
    convention — every output is a count that actually occurred,
    float-free). The rank lookup runs over the GROUPED count
    distribution (cardinality-bounded cumulative window)."""
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    grouped = base.groupBy(F.col("n").alias("v")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = grouped.withColumn("cum", F.sum("cnt").over(w))
    n1 = cum.agg(F.sum("cnt").cast("long").alias("nb"))
    j = cum.crossJoin(F.broadcast(n1))
    ranks = {
        "min": "1",
        "p25": "(nb + 3) DIV 4",
        "p50": "(nb + 1) DIV 2",
        "p75": "(3 * nb + 3) DIV 4",
        "max": "nb",
    }
    aggs = [
        F.min(F.when(F.col("cum") >= F.expr(expr), F.col("v")))
        .cast("long")
        .alias(f"v_{name}")
        for name, expr in ranks.items()
    ]
    row = j.agg(*aggs)
    items = ", ".join(f"'{name}', v_{name}" for name in ranks)
    return row.selectExpr(
        f"stack({len(ranks)}, {items}) AS (stat, value)"
    ).orderBy("stat")


def events_percentiles_bucket_sql(event_type: str = "click") -> str:
    et = event_type.replace("'", "''")
    ranks = {
        "min": "1",
        "p25": "(nb + 3) // 4",
        "p50": "(nb + 1) // 2",
        "p75": "(3 * nb + 3) // 4",
        "max": "nb",
    }
    sel = ", ".join(
        f"CAST(min(CASE WHEN cum >= {expr} THEN v END) AS BIGINT) AS v_{name}"
        for name, expr in ranks.items()
    )
    unions = " UNION ALL ".join(
        f"SELECT '{name}' AS stat, v_{name} AS value FROM one"
        for name in ranks
    )
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1), "
        "g AS (SELECT n AS v, CAST(count(*) AS BIGINT) AS cnt FROM base GROUP BY n), "
        "c AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM g), "
        "t AS (SELECT c.*, (SELECT sum(cnt) FROM g) AS nb FROM c), "
        f"one AS (SELECT {sel} FROM t) "
        f"{unions} ORDER BY stat"
    )


# --------------------------------------------------------------------------
# change_point detection (the ES change_point agg, mean-shift variant)
# --------------------------------------------------------------------------


def events_change_point(
    events: DataFrame, event_type: str = "click"
) -> DataFrame:
    """1 row (split_bucket, n_before, n_after, mean_before, mean_after,
    shift) — the ES ``change_point`` aggregation reduced to its
    deterministic mean-shift core: the split of the bucket series that
    maximizes |mean_after - mean_before| (ES's ML implementation
    layers p-values on several change types; the argmax mean-shift is
    the reproducible spine every variant ranks by). ``split_bucket``
    is the FIRST bucket of the after-segment; ties break to the
    earliest split.

    Exactness: per-side means divide exact integer prefix sums by
    exact counts — the only floats are the two divisions and the
    |diff| per split, evaluated identically on both engines over the
    CALENDAR-bounded series (cumulative window + 1-row broadcast
    totals); the argmax is TakeOrdered(1). Fewer than 2 buckets
    yields zero rows."""
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    rn = Window.partitionBy(F.lit(1)).orderBy("bucket")
    cum = base.select(
        "bucket",
        "n",
        F.sum("n").over(w).cast("long").alias("cum"),
        F.row_number().over(rn).cast("long").alias("i"),
    )
    tot = cum.agg(
        F.max("cum").cast("long").alias("s"), F.count("*").cast("long").alias("nb")
    )
    j = cum.crossJoin(F.broadcast(tot)).where(F.col("i") < F.col("nb"))
    mb = F.col("cum").cast("double") / F.col("i").cast("double")
    ma = (F.col("s") - F.col("cum")).cast("double") / (
        F.col("nb") - F.col("i")
    ).cast("double")
    shift = F.abs(ma - mb)
    scored = j.select(
        "bucket", "i", "cum", "s", "nb",
        mb.alias("mb"), ma.alias("ma"), shift.alias("shift"),
    )
    best = scored.orderBy(F.desc("shift"), F.asc("bucket")).limit(1)
    # split_bucket = the NEXT bucket after the before-segment's last:
    # join back for the (i+1)-th bucket
    nxt = cum.select(F.col("i").alias("i2"), F.col("bucket").alias("nb2"))
    return (
        best.join(F.broadcast(nxt), F.col("i2") == F.col("i") + 1)
        .select(
            F.col("nb2").alias("split_bucket"),
            F.col("i").alias("n_before"),
            (F.col("nb") - F.col("i")).cast("long").alias("n_after"),
            round6("mb").alias("mean_before"),
            round6("ma").alias("mean_after"),
            round6("shift").alias("shift"),
        )
    )


def events_change_point_sql(event_type: str = "click") -> str:
    et = event_type.replace("'", "''")
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1), "
        "cum AS (SELECT bucket, n, "
        "CAST(sum(n) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING "
        "AND CURRENT ROW) AS BIGINT) AS cum, "
        "CAST(row_number() OVER (ORDER BY bucket) AS BIGINT) AS i FROM base), "
        "tot AS (SELECT max(cum) AS s, CAST(count(*) AS BIGINT) AS nb FROM cum), "
        "sc AS (SELECT bucket, i, "
        "CAST(cum AS DOUBLE) / CAST(i AS DOUBLE) AS mb, "
        "CAST((SELECT s FROM tot) - cum AS DOUBLE) / "
        "CAST((SELECT nb FROM tot) - i AS DOUBLE) AS ma, "
        "abs(CAST((SELECT s FROM tot) - cum AS DOUBLE) / "
        "CAST((SELECT nb FROM tot) - i AS DOUBLE) - "
        "CAST(cum AS DOUBLE) / CAST(i AS DOUBLE)) AS shift "
        "FROM cum WHERE i < (SELECT nb FROM tot)), "
        "best AS (SELECT * FROM sc ORDER BY shift DESC, bucket ASC LIMIT 1) "
        "SELECT (SELECT bucket FROM cum WHERE i = best.i + 1) AS split_bucket, "
        "best.i AS n_before, "
        "CAST((SELECT nb FROM tot) - best.i AS BIGINT) AS n_after, "
        + "(floor((best.mb) * 1000000.0 + 0.5) / 1000000.0) AS mean_before, "
        "(floor((best.ma) * 1000000.0 + 0.5) / 1000000.0) AS mean_after, "
        "(floor((best.shift) * 1000000.0 + 0.5) / 1000000.0) AS shift "
        "FROM best"
    )


# --------------------------------------------------------------------------
# moving_percentiles (exact windowed median)
# --------------------------------------------------------------------------


def events_moving_median(
    events: DataFrame, event_type: str = "click", window: int = 5
) -> DataFrame:
    """(bucket, n_events, moving_median) — the ES
    ``moving_percentiles`` pipeline agg at p50, EXACT: the type-1
    lower median (rank (n+1) DIV 2 — the boxplot convention) of the
    LAST ``window`` observed buckets' counts, per bucket. The window
    frame collects <= ``window`` longs, sorts them in-row and indexes
    the rank — bounded by the window parameter, never the series, and
    the output is always a count that actually occurred (float-free;
    ES's TDigest approximation is replaced by the exact integer).

    Scale: the calendar-bounded window discipline of
    events_pipeline_aggs; the frame state is ``window`` longs."""
    if int(window) < 1:
        raise ValueError(f"window must be >= 1: {window!r}")
    base = (
        events.where(F.col("event_type") == event_type)
        .groupBy(F.unix_timestamp(F.date_trunc("hour", "ts")).alias("bucket"))
        .agg(F.count("*").cast("long").alias("n_events"))
    )
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy("bucket")
        .rowsBetween(-(int(window) - 1), 0)
    )
    arr = F.sort_array(F.collect_list("n_events").over(w))
    # rank via integer DIV on both engines — a double->int CAST
    # truncates on Spark but rounds on DuckDB (2.5 -> 2 vs 3)
    med = F.element_at(
        arr, F.expr("CAST((size(_a) + 1) DIV 2 AS INT)")
    )
    return (
        base.withColumn("_a", arr)
        .select(
            "bucket",
            "n_events",
            F.element_at(
                F.col("_a"), F.expr("CAST((size(_a) + 1) DIV 2 AS INT)")
            ).cast("long").alias("moving_median"),
        )
        .orderBy("bucket")
    )


def events_moving_median_sql(
    event_type: str = "click", window: int = 5
) -> str:
    if int(window) < 1:
        raise ValueError(f"window must be >= 1: {window!r}")
    et = event_type.replace("'", "''")
    frame = (
        f"OVER (ORDER BY bucket ROWS BETWEEN {int(window) - 1} PRECEDING "
        "AND CURRENT ROW)"
    )
    return (
        "WITH base AS (SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS bucket, "
        "CAST(count(*) AS BIGINT) AS n_events FROM events "
        f"WHERE event_type = '{et}' GROUP BY 1), "
        f"wl AS (SELECT bucket, n_events, list_sort(list(n_events) {frame}) AS a "
        "FROM base) "
        "SELECT bucket, n_events, "
        "CAST(a[CAST((len(a) + 1) // 2 AS INT)] AS BIGINT) AS moving_median "
        "FROM wl ORDER BY bucket"
    )


# --------------------------------------------------------------------------
# hour-of-day profile (seasonality heatmap row)
# --------------------------------------------------------------------------


def events_hour_profile(events: DataFrame) -> DataFrame:
    """(hour_of_day, event_type, n_events, n_users) — the seasonality
    profile a crawl/capacity scheduler reads (which hours are hot, per
    event type): counts folded ACROSS days into the 24 hour-of-day
    slots. Distinct from the date-histogram family: the bucket key is
    hour(ts), not a timestamp — the periodic fold. Exact integers
    (count + exact distinct users via countDistinct — at web scale the
    distinct lane swaps for the KMV/HLL sketch unchanged); one
    map-side-combinable groupBy over <= 24 x |types| cells."""
    return (
        events.groupBy(
            F.hour("ts").cast("int").alias("hour_of_day"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("hour_of_day", "event_type")
    )


def events_hour_profile_sql() -> str:
    return (
        "SELECT CAST(hour(ts) AS INT) AS hour_of_day, event_type, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS n_users "
        "FROM events GROUP BY 1, 2 ORDER BY hour_of_day, event_type"
    )


# --------------------------------------------------------------------------
# heavy hitters (abuse/bot-detection ledger)
# --------------------------------------------------------------------------


def events_heavy_hitters(
    events: DataFrame, k: int = 10, min_share: float = 0.0
) -> DataFrame:
    """(user_id, n_events, share) — the exact top-k event producers
    with their traffic share, the abuse/bot-detection ledger a serving
    stack reads before rate-limiting (the CMS sketch estimates the
    same number approximately; this is the exact candidates-for-
    action list). ``min_share`` drops tail rows below the alerting
    threshold. Counts exact (map-side combinable), total a 1-row
    broadcast, share = one division per emitted row, TakeOrdered cut
    (n desc, user_id asc)."""
    if int(k) < 1 or not (0.0 <= float(min_share) <= 1.0):
        raise ValueError(f"bad params: k={k} min_share={min_share}")
    g = events.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events")
    )
    tot = g.agg(F.sum("n_events").cast("long").alias("t")).first()
    t = int(tot["t"] or 0)
    if t == 0:
        return events.sparkSession.createDataFrame(
            [], "user_id long, n_events long, share double"
        )
    share = F.col("n_events").cast("double") / F.lit(float(t))
    return (
        g.select("user_id", "n_events", round6(share).alias("share"))
        .where(share >= F.lit(float(min_share)))
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(int(k))
    )


def events_heavy_hitters_sql(k: int = 10, min_share: float = 0.0) -> str:
    from ..functions.rounding import sql_double

    if int(k) < 1 or not (0.0 <= float(min_share) <= 1.0):
        raise ValueError(f"bad params: k={k} min_share={min_share}")
    ms = sql_double(float(min_share))
    return (
        "WITH g AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events "
        "FROM events GROUP BY user_id), "
        "t AS (SELECT CAST(sum(n_events) AS BIGINT) AS tot FROM g) "
        "SELECT user_id, n_events, "
        + "(floor((CAST(n_events AS DOUBLE) / CAST((SELECT tot FROM t) AS DOUBLE)) "
        "* 1000000.0 + 0.5) / 1000000.0) AS share "
        "FROM g WHERE CAST(n_events AS DOUBLE) / CAST((SELECT tot FROM t) AS DOUBLE) "
        f">= {ms} "
        f"ORDER BY n_events DESC, user_id ASC LIMIT {int(k)}"
    )
