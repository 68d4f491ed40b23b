"""Events: tumbling windows + sessionization — split from the single-file catalogue (round 5, pure
mechanical move; see sievedata/queries/__init__.py for the contract)."""
from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.kernels.normalize import desc_norm_array, invnum_norm_array
from sievedata.queries._shared import (_LUT_CACHE, _drop_empty_blocks,
                                       _join_parts, _rp)

# Events: tumbling windows + sessionization (streaming-shaped)
# --------------------------------------------------------------------------

def q_events_hourly(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    def trunc(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        return pa.table(
            {"hour": hour, "event_type": t["event_type"], "value": t["value"]}
        )

    out = (
        _rp(sf_dir, "events", ["ts", "event_type", "value"])
        .map_batches(trunc, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["sum_value"] = out["sum_value"].round(2)
    # µs resolution to match DuckDB's date_trunc dtype exactly
    # (floor_temporal preserves the source's timestamp[s] unit)
    out["hour"] = out["hour"].astype("datetime64[us]")
    return out


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q_window_drift(sf_dir: str, bin_width: float = 100.0):
    """Windowed distribution-drift inputs over the event stream: for every
    (hour, value-bin) present, the bin's event count and the SAME bin's
    count in the previous hour — the integer PSI/KS inputs of the flagship
    drift monitor (A6, sketches/drift.py) as a first-class streaming query.
    Verdict metrics stay float-free per the engine's exactness contract:
    consumers derive PSI from the integer (n_cur, n_prev) pairs.

    Scale shape: per-block (hour, bin) count partials via Arrow group_by
    (the event stream never shuffles), ONE narrow hour×bin groupby, then a
    self LEFT join of that aggregate onto itself shifted one hour.  The
    join consumes aggregate output, so empty zero-column partitions are
    stripped first (_drop_empty_blocks — Ray 2.49 footgun).  Bin ids are
    ``floor(value / width)``, the identical IEEE double op in DuckDB."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        h = (pc.cast(pc.floor_temporal(t["ts"], unit="hour"), pa.timestamp("us"))
             .cast(pa.int64()).to_numpy(zero_copy_only=False)
             // 3_600_000_000)
        v = t["value"].to_numpy(zero_copy_only=False)
        b = np.floor(v / bin_width).astype(np.int64)
        g = (pa.table({"h": pa.array(h), "bin": pa.array(b)})
             .group_by(["h", "bin"]).aggregate([([], "count_all")]))
        return pa.table({"h": g["h"], "bin": g["bin"],
                         "n": g["count_all"].cast(pa.int64())})

    agg = (
        _rp(sf_dir, "events", ["ts", "value"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["h", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # hour×bin-sized; consumed twice (cur + prev sides)
    )
    stripped = _drop_empty_blocks(agg)
    if stripped is None:  # empty events: typed empty result, no join
        return pd.DataFrame({
            "bin": pd.Series([], dtype="int64"),
            "hour": pd.Series([], dtype="datetime64[us]"),
            "n_cur": pd.Series([], dtype="int64"),
            "n_prev": pd.Series([], dtype="int64"),
        })
    agg = stripped

    def shift(t: pa.Table) -> pa.Table:
        return pa.table({
            "h": t["h"], "bin": t["bin"], "n": t["n"],
            "prev_h": pc.subtract(t["h"], pa.scalar(1, pa.int64())),
        })

    def as_prev(t: pa.Table) -> pa.Table:
        return pa.table({"h_r": t["h"], "bin_r": t["bin"], "n_prev": t["n"]})

    joined = agg.map_batches(shift, batch_format="pyarrow").join(
        agg.map_batches(as_prev, batch_format="pyarrow"),
        join_type="left_outer",
        num_partitions=_join_parts(agg),
        on=("prev_h", "bin"),
        right_on=("h_r", "bin_r"),
    )

    def finalize(t: pa.Table) -> pa.Table:
        hour = pc.multiply(t["h"], pa.scalar(3_600_000_000, pa.int64())) \
            .cast(pa.timestamp("us"))
        return pa.table({
            "hour": hour,
            "bin": t["bin"],
            "n_cur": t["n"],
            "n_prev": pc.fill_null(pc.cast(t["n_prev"], pa.int64()), 0),
        })

    return joined.map_batches(finalize, batch_format="pyarrow")


SQL_WINDOW_DRIFT = """
WITH binned AS (
  SELECT date_trunc('hour', ts) AS hour,
         CAST(floor(value / 100.0) AS BIGINT) AS bin,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT c.hour AS hour, c.bin AS bin, c.n AS n_cur,
       CAST(COALESCE(p.n, 0) AS BIGINT) AS n_prev
FROM binned c
LEFT JOIN binned p ON p.hour = c.hour - INTERVAL 1 HOUR AND p.bin = c.bin
"""


def q_events_sessions(sf_dir: str, gap_minutes: int = 30):
    """Sessionization: per-user session count with a 30-min inactivity gap
    (groupby(key).map_groups over ts-sorted events — the engine's
    streaming-window idiom)."""

    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % n_buckets))

    def sessions_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="mergesort")
        gaps = df.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        new_session = (gaps > gap_minutes * 60).astype(int)
        out = (
            pd.DataFrame({"user_id": df["user_id"].to_numpy(), "brk": new_session.to_numpy()})
            .groupby("user_id", sort=False)["brk"].sum().add(1).rename("n_sessions")
            .reset_index()
        )
        return out

    return (
        _rp(sf_dir, "events", ["user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
        .select_columns(["user_id", "n_sessions"])
    )


SQL_EVENTS_SESSIONS = """
WITH x AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(1 + sum(CASE WHEN prev_ts IS NOT NULL
                     AND ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM x GROUP BY user_id
"""


# --------------------------------------------------------------------------
