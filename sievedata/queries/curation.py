"""Web-corpus curation operators — split from the single-file catalogue (round 5, pure
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
from sievedata.queries.joins import BROADCAST_MAX_ROWS
from sievedata.queries.similarity import _ngram_pairs_dataset
from sievedata.queries.analytics import _token_counts
from sievedata.queries.corpus import _mul_hash32

# Web-corpus curation operators (round-4 additions)
# --------------------------------------------------------------------------

def q_domain_caps(sf_dir: str, cap: int = 15):
    """Per-domain document cap (the C4/RefinedWeb "max N pages per host"
    rule): keep at most ``cap`` docs per ``source``, chosen by a
    deterministic multiplicative-hash priority — a uniform within-domain
    sample rather than a doc_id-order prefix — with doc_id tiebreak; emit
    each kept row with its within-domain rank.

    Scale shape: every block first prunes itself to ≤ cap rows per source
    via one lexsort + run-boundary ranks (no per-key masks), so the
    exchange carries O(cap · sources_per_block · blocks) rows; the final
    selection is a hash-bucketed map_groups over ≤ 64 buckets — never a
    whole-corpus sort, and a hot domain costs cap rows per block, not its
    full page count."""
    from sievedata.sketches.hashing import hash64

    n_buckets = 64

    def _ranked_prefix(ids: np.ndarray, src: np.ndarray, k: int):
        pri = _mul_hash32(ids)
        order = np.lexsort((ids, pri, src))
        src_s = src[order]
        starts = np.flatnonzero(np.concatenate(([True], src_s[1:] != src_s[:-1])))
        pos = np.arange(len(src_s), dtype=np.int64)
        rank = pos - starts[np.searchsorted(starts, pos, side="right") - 1]
        keep = order[rank < k]
        return keep, (rank[rank < k] + 1)

    def partial(t: pa.Table) -> pa.Table:
        # NULL sources are unorderable under np.lexsort (None vs str);
        # drop them here and in the oracle's WHERE clause alike.
        t = t.filter(pc.is_valid(t["source"]))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        src = t["source"].to_numpy(zero_copy_only=False)
        keep, _ = _ranked_prefix(ids, src, cap)
        kept_src = src[keep]
        return pa.table({
            "doc_id": pa.array(ids[keep]),
            "source": pa.array(kept_src),
            "bucket": pa.array(hash64(pa.array(kept_src)).astype(np.int64)
                               % n_buckets),
        })

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy().astype(np.int64)
        src = df["source"].to_numpy()
        keep, rn = _ranked_prefix(ids, src, cap)
        return pd.DataFrame({
            "doc_id": ids[keep],
            "source": src[keep],
            "rn": rn.astype(np.int64),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "source"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(finalize, batch_format="pandas")
        .select_columns(["doc_id", "source", "rn"])
    )


SQL_DOMAIN_CAPS = """
WITH r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
             ORDER BY CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296,
                      doc_id) AS rn
  FROM documents WHERE source IS NOT NULL)
SELECT doc_id, source, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 15
"""


def q_hash_split(sf_dir: str):
    """Deterministic train/valid/test corpus split by doc_id hash (the
    standard leakage-safe split: membership is a pure function of the id,
    stable under re-runs and across workers) — emits per-split doc and
    char totals, the manifest row a curation pipeline writes next to each
    split.

    Scale shape: per-block integer partials (≤ 3 rows each) into one
    3-group aggregate; nothing but the manifest leaves the workers."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        h = _mul_hash32(ids) % 100
        split = np.where(h < 10, "test", np.where(h < 20, "valid", "train"))
        uniq, inv = np.unique(split, return_inverse=True)
        return pa.table({
            "split": pa.array(uniq),
            "n_docs": pa.array(np.bincount(inv, minlength=len(uniq))
                               .astype(np.int64)),
            "n_chars": pa.array(np.bincount(inv, weights=nch,
                                            minlength=len(uniq))
                                .astype(np.int64)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "split": t["split"],
            "n_docs": pc.cast(t["sum(n_docs)"], pa.int64()),
            "n_chars": pc.cast(t["sum(n_chars)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("split")
        .aggregate(Sum("n_docs", alias_name="sum(n_docs)"),
                   Sum("n_chars", alias_name="sum(n_chars)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_HASH_SPLIT = """
SELECT CASE
         WHEN CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 % 100 < 10
           THEN 'test'
         WHEN CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296 % 100 < 20
           THEN 'valid'
         ELSE 'train' END AS split,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY 1
"""


def q_pack_windows(sf_dir: str, window: int = 512):
    """Concat-and-chunk sequence packing (the LLM-pretraining step after
    dedup/filter): documents are concatenated in doc_id order and cut into
    fixed ``window``-token contexts; each doc reports the window span it
    lands in — first/last window id — so straddling docs (attention-mask
    boundaries) are visible.

    Scale shape: the global token prefix-sum is distributed exactly like
    q_token_shards — doc_id-range bins, per-bin token sums, a driver
    prefix over ≤ 256 ints, per-bin local cumsum + offset.  No sort and no
    whole-corpus materialization; the window span is pure arithmetic on
    the exclusive prefix."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if stats.get("min(doc_id)") is None:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "tokens": pd.Series(dtype="int64"),
                             "first_win": pd.Series(dtype="int64"),
                             "last_win": pd.Series(dtype="int64")})
    lo = int(stats["min(doc_id)"])
    hi = int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def tok_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((ids - lo) // width, 0, n_bins - 1).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": pa.array(_token_counts(t["text"])),
            "bin": pa.array(b),
        })

    rows = ds.map_batches(tok_rows, batch_format="pyarrow")
    bin_sums = (
        rows.groupby("bin").aggregate(Sum("tokens", alias_name="t"))
        .to_pandas().sort_values("bin")
    )
    cum = np.concatenate([[0], np.cumsum(bin_sums["t"].to_numpy())[:-1]])
    offsets = {int(b): int(o) for b, o in zip(bin_sums["bin"], cum)}

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        tok = df["tokens"].to_numpy().astype(np.int64)
        excl = offsets[int(df["bin"].iloc[0])] + np.cumsum(tok) - tok
        keep = tok > 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep],
            "tokens": tok[keep],
            "first_win": (excl[keep] // window).astype(np.int64),
            "last_win": ((excl[keep] + tok[keep] - 1) // window).astype(np.int64),
        })

    return rows.groupby("bin").map_groups(finalize, batch_format="pandas")


SQL_PACK_WINDOWS = """
WITH tok AS (
  SELECT doc_id,
         CAST(COALESCE(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')), 0) AS BIGINT) AS tokens
  FROM documents),
pre AS (
  SELECT doc_id, tokens,
         CAST(COALESCE(sum(tokens) OVER (
                ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS excl
  FROM tok)
SELECT doc_id, tokens,
       excl // 512 AS first_win,
       (excl + tokens - 1) // 512 AS last_win
FROM pre WHERE tokens > 0
"""


def q_length_filter(sf_dir: str, qlo: float = 0.05, qhi: float = 0.95):
    """Exact global length-percentile band filter (the "drop the shortest
    and longest tails" curation rule): keep docs whose ``n_chars`` lies in
    [p5, p95], where the percentiles are EXACT discrete quantiles
    (sorted[ceil(q·n)−1], DuckDB's quantile_disc convention — verified
    index-by-index, see tests).

    Scale shape: the quantiles come from a value-domain histogram — each
    block emits (n_chars, count) partials via np.unique, one narrow
    groupby sums them, and the driver prefix-scans the ≤ |distinct
    lengths| rows (bounded by the value domain, not the corpus); the
    filter pass is then an embarrassingly-parallel map_batches.  No sort,
    no quantile sketch approximation."""
    import math

    from ray.data.aggregate import Sum

    def hist(t: pa.Table) -> pa.Table:
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(nch, return_counts=True)
        return pa.table({"n_chars": pa.array(uniq),
                         "cnt": pa.array(cnt.astype(np.int64))})

    hdf = (
        _rp(sf_dir, "documents", ["n_chars"])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("n_chars").aggregate(Sum("cnt", alias_name="c"))
        .to_pandas()
    )
    if len(hdf) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_chars": pd.Series(dtype="int64")})
    hdf = hdf.sort_values("n_chars")
    vals = hdf["n_chars"].to_numpy()
    cum = np.cumsum(hdf["c"].to_numpy())
    n = int(cum[-1])

    def disc(q: float) -> int:
        rank = min(max(math.ceil(q * n) - 1, 0), n - 1)  # 0-based
        return int(vals[np.searchsorted(cum, rank + 1)])

    lo_v, hi_v = disc(qlo), disc(qhi)

    def band(t: pa.Table) -> pa.Table:
        nch = t["n_chars"]
        keep = pc.and_(pc.greater_equal(nch, lo_v), pc.less_equal(nch, hi_v))
        t = t.filter(keep)
        return pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                         "n_chars": pc.cast(t["n_chars"], pa.int64())})

    return _rp(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
        band, batch_format="pyarrow")


SQL_LENGTH_FILTER = """
WITH b AS (
  SELECT quantile_disc(n_chars, 0.05) AS lo,
         quantile_disc(n_chars, 0.95) AS hi
  FROM documents)
SELECT doc_id, n_chars FROM documents, b WHERE n_chars BETWEEN lo AND hi
"""


def q_embedding_quantize(sf_dir: str):
    """Symmetric int8 embedding quantization audit (the memory-4× step
    before ANN serving): per vector, scale = max|v| ∕ 127, codes =
    ⌊v∕scale + ½⌋, and the max absolute reconstruction error — emitted as
    nano-unit integers so the gate compares exact values.  Every op is an
    identical elementwise IEEE double op on both sides (widen, divide,
    floor, multiply, subtract, abs, max) — no ordering-sensitive
    reduction.

    Scale shape: one zero-copy matrix per batch, pure row-wise numpy; no
    shuffle at all (the audit is embarrassingly parallel)."""
    from sievedata.functions.ann import embedding_matrix

    def audit(t: pa.Table) -> pa.Table:
        m = embedding_matrix(t["embedding"])
        ids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        if m.size == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "scale_nano": pa.array([], pa.int64()),
                             "max_err_nano": pa.array([], pa.int64())})
        vmax = np.abs(m).max(axis=1)
        keep = vmax > 0
        m, ids, vmax = m[keep], ids[keep], vmax[keep]
        scale = vmax / 127.0
        codes = np.floor(m / scale[:, None] + 0.5)
        err = np.abs(m - codes * scale[:, None]).max(axis=1)
        return pa.table({
            "vec_id": pa.array(ids),
            "scale_nano": pa.array(np.floor(scale * 1e9).astype(np.int64)),
            "max_err_nano": pa.array(np.floor(err * 1e9).astype(np.int64)),
        })

    return _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        audit, batch_format="pyarrow")


SQL_EMBEDDING_QUANTIZE = """
WITH d AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
m AS (
  SELECT vec_id, max(abs(x)) AS vmax FROM d GROUP BY vec_id),
j AS (
  SELECT d.vec_id, d.x, m.vmax / 127 AS scale
  FROM d JOIN m USING (vec_id) WHERE m.vmax > 0)
SELECT vec_id,
       CAST(floor(any_value(scale) * 1000000000) AS BIGINT) AS scale_nano,
       CAST(floor(max(abs(x - floor(x / scale + 0.5) * scale))
                  * 1000000000) AS BIGINT) AS max_err_nano
FROM j GROUP BY vec_id
"""


def q_bpe_merge_candidates(sf_dir: str, k: int = 20):
    """First BPE merge step: corpus-wide counts of ADJACENT token pairs
    (the pair a byte-pair-encoding trainer would merge next), top-k by
    count with deterministic (t1, t2) tiebreak.

    Scale shape: each block dictionary-encodes its token stream once,
    forms adjacency pairs with pure offset arithmetic (a pair exists where
    two consecutive flat tokens share a parent doc), and emits
    vocab²-bounded (pair, n) partials via one np.unique — the shuffle
    carries pair-vocabulary rows, never the token stream; the final top-k
    is a sort over the summed pair vocabulary."""
    from ray.data.aggregate import Sum

    def pair_partials(t: pa.Table) -> pa.Table:
        empty = pa.table({"pair": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        txt = t["text"].combine_chunks()
        if len(txt) == 0:
            return empty
        split = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        if len(flat) < 2:
            return empty
        adj = parents[1:] == parents[:-1]
        if not adj.any():
            return empty
        left = flat.slice(0, len(flat) - 1).filter(pa.array(adj))
        right = flat.slice(1).filter(pa.array(adj))
        pair = pc.binary_join_element_wise(left, right, "\x1f")
        uniq, cnt = np.unique(np.asarray(pair), return_counts=True)
        return pa.table({"pair": pa.array(uniq, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    def project(t: pa.Table) -> pa.Table:
        parts = pc.split_pattern(t["pair"], "\x1f")
        return pa.table({
            "t1": pc.list_element(parts, 0),
            "t2": pc.list_element(parts, 1),
            "n": pc.cast(t["sum(n)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(pair_partials, batch_format="pyarrow")
        .groupby("pair")
        .aggregate(Sum("n", alias_name="sum(n)"))
        .map_batches(project, batch_format="pyarrow")
        .sort(["n", "t1", "t2"], descending=[True, False, False])
        .limit(k)
    )


SQL_BPE_MERGE_CANDIDATES = """
WITH tok AS (
  SELECT list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents WHERE text IS NOT NULL),
idx AS (
  SELECT ts, unnest(generate_series(1, len(ts) - 1)) AS i
  FROM tok WHERE len(ts) >= 2)
SELECT ts[i] AS t1, ts[i + 1] AS t2, count(*) AS n
FROM idx GROUP BY t1, t2
ORDER BY n DESC, t1, t2 LIMIT 20
"""


def q_dup_ratio_by_source(sf_dir: str):
    """Per-domain exact-duplicate ratio (boilerplate-host detector): for
    each ``source``, total docs and how many are byte-identical copies of
    another doc from the same source (n_docs − distinct texts) — the
    curation metric that decides which hosts get aggressive dedup.

    Scale shape: distinct-text counting is EXACT via a NATIVE
    (source, text) hash aggregate — per-block Arrow group_by pre-dedup
    combiner, one shuffle of the deduped (source, text) rows, then a
    source-keyed integer sum; no pandas group ever materializes a corpus
    fraction and the text column crosses the wire exactly once."""
    from ray.data.aggregate import Sum

    def block_dedup(t: pa.Table) -> pa.Table:
        # per-block (source, text) pre-dedup combiner before the shuffle
        t = t.filter(pc.is_valid(t["text"]))
        return t.group_by(["source", "text"]).aggregate([])

    def src_rows(t: pa.Table) -> pa.Table:
        return pa.table({"source": t["source"],
                         "n_distinct": pa.array(
                             np.ones(t.num_rows, dtype=np.int64))})

    # NATIVE (source, text) hash aggregate — exact distinct with no pandas
    # group ever holding a corpus fraction; the text column shuffles once
    distinct = (
        _rp(sf_dir, "documents", ["source", "text"])
        .map_batches(block_dedup, batch_format="pyarrow")
        .groupby(["source", "text"]).count()
        .map_batches(src_rows, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_distinct", alias_name="nd"))
    )

    def count_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        src = t["source"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(src, return_counts=True)
        return pa.table({"source": pa.array(uniq),
                         "n_docs": pa.array(cnt.astype(np.int64))})

    totals = (
        _rp(sf_dir, "documents", ["source", "text"])
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Sum("n_docs", alias_name="n"))
    )

    def project(t: pa.Table) -> pa.Table:
        n = pc.cast(t["n"], pa.int64())
        nd = pc.cast(t["nd"], pa.int64())
        return pa.table({
            "source": t["source"],
            "n_docs": n,
            "n_dup_docs": pc.subtract(n, nd),
        })

    # hash aggregates can emit zero-column blocks for empty partitions
    # (Ray 2.49) which break the join's FieldRef resolution — strip them
    totals = totals.materialize()
    totals = _drop_empty_blocks(totals) or totals
    distinct = distinct.materialize()
    distinct = _drop_empty_blocks(distinct) or distinct
    return (
        totals.join(distinct, join_type="inner", num_partitions=8,
                    on=("source",))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_DUP_RATIO_BY_SOURCE = """
SELECT source, count(*) AS n_docs,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_dup_docs
FROM documents WHERE text IS NOT NULL GROUP BY source
"""


def q_event_funnel(sf_dir: str):
    """Ordered conversion funnel over the event stream: per user, how far
    through view → click → purchase they progressed, where each stage must
    STRICTLY FOLLOW the previous one in time (min qualifying timestamp
    chains, the standard product-analytics funnel with re-ordering
    ruled out).

    Scale shape: one user-hash cogroup shuffle; inside each bucket the
    stage chain is three masked groupby-transform('min') passes over
    microsecond-integer timestamps — vectorized across all users in the
    bucket, no per-user loop, and timestamp comparisons are integer-exact
    so the oracle agrees bit-for-bit."""
    n_buckets = 1024  # a bucket holds ~1/1024 of users — never one group

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % n_buckets))

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"]
        ts = df["ts"]
        t1 = ts.where(df["event_type"] == "view").groupby(uid).transform("min")
        t2 = (ts.where((df["event_type"] == "click") & (ts > t1))
              .groupby(uid).transform("min"))
        t3 = (ts.where((df["event_type"] == "purchase") & (ts > t2))
              .groupby(uid).transform("min"))
        stage = (t1.notna().astype(np.int64) + t2.notna().astype(np.int64)
                 + t3.notna().astype(np.int64))
        out = pd.DataFrame({"user_id": uid.to_numpy().astype(np.int64),
                            "stage": stage.to_numpy()})
        return out.groupby("user_id", as_index=False, sort=False)["stage"].max()

    return (
        _rp(sf_dir, "events", ["user_id", "ts", "event_type"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
        .select_columns(["user_id", "stage"])
    )


SQL_EVENT_FUNNEL = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id),
c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
SELECT u.user_id,
       CAST(CASE WHEN p.user_id IS NOT NULL THEN 3
                 WHEN c.user_id IS NOT NULL THEN 2
                 WHEN v.user_id IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage
FROM (SELECT DISTINCT user_id FROM events) u
LEFT JOIN v USING (user_id)
LEFT JOIN c USING (user_id)
LEFT JOIN p USING (user_id)
"""


def q_json_props_sum(sf_dir: str):
    """Semi-structured payload extraction: pull the integer ``k`` field
    out of the JSON ``props`` column and aggregate it per event type (the
    ubiquitous "parse the properties blob" step of event analytics).

    Exactness: extraction is the same RE2 regex on both sides (Arrow
    ``extract_regex`` and DuckDB ``regexp_extract`` are both RE2 — the
    pii_scan precedent), and the aggregate is an integer sum.

    Scale shape: per-block (event_type, sum, count) integer partials; one
    ≤ |event types| groupby — nothing but the partials shuffles."""
    from ray.data.aggregate import Sum

    pat = r'"k":\s*(?P<v>-?\d+)'

    def partial(t: pa.Table) -> pa.Table:
        props = pc.fill_null(t["props"].combine_chunks(), "")
        ext = pc.extract_regex(props, pat)
        valid = pc.is_valid(ext).to_numpy(zero_copy_only=False)
        vals = np.zeros(len(props), dtype=np.int64)
        if valid.any():
            picked = pc.struct_field(ext.filter(pa.array(valid)), "v")
            vals[valid] = pc.cast(picked, pa.int64()).to_numpy(
                zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(uniq),
            "k_sum": pa.array(np.bincount(inv, weights=vals,
                                          minlength=len(uniq))
                              .astype(np.int64)),
            "n_extracted": pa.array(np.bincount(inv, weights=valid.astype(np.int64),
                                                minlength=len(uniq))
                                    .astype(np.int64)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "k_sum": pc.cast(t["sum(k_sum)"], pa.int64()),
            "n_extracted": pc.cast(t["sum(n_extracted)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "events", ["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("k_sum", alias_name="sum(k_sum)"),
                   Sum("n_extracted", alias_name="sum(n_extracted)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_JSON_PROPS_SUM = """
SELECT event_type,
       CAST(COALESCE(sum(CAST(nullif(
              regexp_extract(props, '"k":\\s*(-?\\d+)', 1), '') AS BIGINT)),
            0) AS BIGINT) AS k_sum,
       CAST(sum(CASE WHEN regexp_extract(props, '"k":\\s*(-?\\d+)', 1) <> ''
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_extracted
FROM events WHERE props IS NOT NULL
GROUP BY event_type
"""


def q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention over the event stream: users are cohorted
    by the Monday-start week of their FIRST event; for each (cohort week,
    week offset) the distinct active users — the grid every retention
    curve is drawn from.

    Week truncation is pure integer arithmetic on epoch days
    (``day − ((day + 3) mod 7)``, Monday-start, matching DuckDB's
    date_trunc('week')), so both sides agree exactly.

    Scale shape: per-user first-event is a narrow (user, min-micros)
    aggregate; cohorts rejoin the stream with ONE hash join (no
    user-table broadcast — users are unbounded at corpus scale); distinct
    actives collapse per block via np.unique before the final
    (cohort, offset, user)-keyed dedup groupby and the tiny count
    groupby."""
    from ray.data.aggregate import Min

    DAY_US = 86_400_000_000

    def week_day(micros: np.ndarray) -> np.ndarray:
        day = micros // DAY_US
        return day - ((day + 3) % 7)

    def to_int(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "micros": pc.cast(t["ts"], pa.int64()),
        })

    ev = _rp(sf_dir, "events", ["user_id", "ts"]).map_batches(
        to_int, batch_format="pyarrow")
    first = ev.groupby("user_id").aggregate(
        Min("micros", alias_name="first_micros")).materialize()
    first = _drop_empty_blocks(first) or first

    def cohort_col(t: pa.Table) -> pa.Table:
        fm = t["first_micros"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "user_id": pc.cast(t["user_id"], pa.int64()),
            "cohort_day": pa.array(week_day(fm)),
        })

    cohorts = first.map_batches(cohort_col, batch_format="pyarrow")

    def triples(t: pa.Table) -> pa.Table:
        um = t["micros"].to_numpy(zero_copy_only=False).astype(np.int64)
        cd = t["cohort_day"].to_numpy(zero_copy_only=False).astype(np.int64)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        off = (week_day(um) - cd) // 7
        # per-block distinct collapse before the shuffle
        key = np.stack([cd, off, uid], axis=1)
        key = np.unique(key, axis=0)
        return pa.table({
            "cohort_day": pa.array(key[:, 0]),
            "week_offset": pa.array(key[:, 1]),
            "user_id": pa.array(key[:, 2]),
        })

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table({"cohort_day": pc.cast(t["cohort_day"], pa.int64()),
                         "week_offset": pc.cast(t["week_offset"], pa.int64())})

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"cohort_day": pc.cast(t["cohort_day"], pa.int64()),
                         "week_offset": pc.cast(t["week_offset"], pa.int64()),
                         "n_users": pc.cast(t["count()"], pa.int64())})

    # two NATIVE hash aggregates (triple-dedup, then pair-count): no
    # map_groups ever materializes a whole cohort of users in one block
    return (
        ev.join(cohorts, join_type="inner", num_partitions=8,
                on=("user_id",))
        .map_batches(triples, batch_format="pyarrow")
        .groupby(["cohort_day", "week_offset", "user_id"]).count()
        .map_batches(pair_rows, batch_format="pyarrow")
        .groupby(["cohort_day", "week_offset"]).count()
        .map_batches(project, batch_format="pyarrow")
    )


SQL_RETENTION_COHORTS = """
WITH f AS (
  SELECT user_id,
         datediff('day', DATE '1970-01-01', date_trunc('week', min(ts)))
           AS cohort_day
  FROM events GROUP BY user_id)
SELECT f.cohort_day,
       (datediff('day', DATE '1970-01-01', date_trunc('week', e.ts))
          - f.cohort_day) // 7 AS week_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN f USING (user_id)
GROUP BY 1, 2
"""


def q_degree_histogram(sf_dir: str):
    """Near-dup graph degree distribution (dedup diagnostics): for the
    exact n-gram Jaccard graph (`ngram_jaccard_pairs`), how many docs have
    1, 2, … near-dup neighbors — the shape that decides whether clustering
    is pair-dominated (safe) or star-dominated (template storms).

    Scale shape: edges come from the already-distributed PPJoin Dataset
    seam; degrees are one narrow groupby over the symmetric edge list
    (O(edges) rows), the histogram a second groupby over ≤ max-degree
    rows."""
    edges = _ngram_pairs_dataset(sf_dir)

    def symmetric(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"doc_id": pa.concat_arrays([a, b])})

    deg = (
        edges.map_batches(symmetric, batch_format="pyarrow")
        .groupby("doc_id").count()
    )

    def to_deg(t: pa.Table) -> pa.Table:
        return pa.table({"degree": pc.cast(t["count()"], pa.int64())})

    hist = (
        deg.map_batches(to_deg, batch_format="pyarrow")
        .groupby("degree").count()
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table({"degree": pc.cast(t["degree"], pa.int64()),
                         "n_docs": pc.cast(t["count()"], pa.int64())})

    return hist.map_batches(project, batch_format="pyarrow")


SQL_DEGREE_HISTOGRAM = """
WITH e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, i::INT, 5)) AS grams
  FROM e GROUP BY doc_id
),
pairs AS (
  SELECT a, b FROM (
    SELECT a.doc_id AS a, b.doc_id AS b,
           len(list_intersect(a.grams, b.grams)) AS inter,
           len(a.grams) AS na, len(b.grams) AS nb
    FROM g a JOIN g b ON a.doc_id < b.doc_id
  )
  WHERE inter * 5 >= 4 * (na + nb - inter)
),
deg AS (
  SELECT doc_id, count(*) AS degree FROM (
    SELECT a AS doc_id FROM pairs UNION ALL SELECT b AS doc_id FROM pairs)
  GROUP BY doc_id)
SELECT degree, count(*) AS n_docs FROM deg GROUP BY degree
"""


def q_tokenizer_coverage(sf_dir: str, vocab_k: int = 100):
    """Vocabulary coverage / OOV audit: fix the vocab to the corpus's
    top-``vocab_k`` tokens by total frequency (deterministic count-then-
    token tiebreak), then per doc report total tokens and how many are
    in-vocab — the OOV-rate table a tokenizer change is judged by.

    Scale shape: the vocab phase reuses the term-partial pattern
    (vocab-sized per-block (term, n) counts, one narrow groupby, driver
    keeps only k rows); the probe phase broadcasts the k tokens once and
    runs an embarrassingly-parallel ``pc.is_in`` count per block."""
    import ray
    from ray.data.aggregate import Sum

    def term_partials(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        uniq, cnt = np.unique(np.asarray(flat), return_counts=True)
        return pa.table({"t": pa.array(uniq, pa.string()),
                         "n": pa.array(cnt.astype(np.int64))})

    vocab_df = (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(term_partials, batch_format="pyarrow")
        .groupby("t").aggregate(Sum("n", alias_name="n"))
        .sort(["n", "t"], descending=[True, False])
        .limit(vocab_k)
        .to_pandas()
    )
    if len(vocab_df) == 0:
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_tokens": pd.Series(dtype="int64"),
                             "n_in_vocab": pd.Series(dtype="int64")})
    vocab_ref = ray.put(pa.array(sorted(vocab_df["t"]), pa.string()))

    def probe(t: pa.Table) -> pa.Table:
        vocab = ray.get(vocab_ref)
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        n = t.num_rows
        n_tokens = np.bincount(parents, minlength=n).astype(np.int64)
        inv = pc.is_in(flat, value_set=vocab).to_numpy(zero_copy_only=False)
        n_in = np.bincount(parents[inv], minlength=n).astype(np.int64)
        keep_docs = n_tokens > 0  # docs with no tokens have no coverage row
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()).filter(
                pa.array(keep_docs)),
            "n_tokens": pa.array(n_tokens[keep_docs]),
            "n_in_vocab": pa.array(n_in[keep_docs]),
        })

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        probe, batch_format="pyarrow")


SQL_TOKENIZER_COVERAGE = """
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(text, ' '),
                                    x -> x <> '')) AS t
  FROM documents WHERE text IS NOT NULL),
v AS (
  SELECT t FROM (
    SELECT t, count(*) AS n FROM tok GROUP BY t
    ORDER BY n DESC, t LIMIT 100))
SELECT doc_id, count(*) AS n_tokens,
       CAST(sum(CASE WHEN t IN (SELECT t FROM v) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_in_vocab
FROM tok GROUP BY doc_id
"""


def q_null_profile(sf_dir: str):
    """Column completeness profile over the documents table (the first
    pass of any schema-validation engine): per column, total rows, nulls,
    and empty-string counts — pure integer counts so the gate is exact.

    Scale shape: per-block partials are |columns| rows each (pc.is_null /
    equality kernels, zero data-dependent state), one ≤ |columns|-group
    aggregate — nothing but the tiny profile shuffles."""
    from ray.data.aggregate import Sum

    cols = ["doc_id", "text", "lang", "source", "n_chars"]

    def partial(t: pa.Table) -> pa.Table:
        names, n_null, n_empty = [], [], []
        for c in cols:
            col = t[c]
            names.append(c)
            n_null.append(col.null_count)
            if pa.types.is_string(col.type):
                ne = pc.sum(pc.equal(col, "")).as_py() or 0
            else:
                ne = 0
            n_empty.append(int(ne))
        k = len(cols)
        return pa.table({
            "column": pa.array(names, pa.string()),
            "n_rows": pa.array([t.num_rows] * k, pa.int64()),
            "n_null": pa.array(n_null, pa.int64()),
            "n_empty": pa.array(n_empty, pa.int64()),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "column": t["column"],
            "n_rows": pc.cast(t["sum(n_rows)"], pa.int64()),
            "n_null": pc.cast(t["sum(n_null)"], pa.int64()),
            "n_empty": pc.cast(t["sum(n_empty)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", cols)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("n_rows", alias_name="sum(n_rows)"),
                   Sum("n_null", alias_name="sum(n_null)"),
                   Sum("n_empty", alias_name="sum(n_empty)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_NULL_PROFILE = """
SELECT 'doc_id' AS column, count(*) AS n_rows,
       CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
       CAST(0 AS BIGINT) AS n_empty
FROM documents
UNION ALL
SELECT 'text', count(*),
       CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN text = '' THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'lang', count(*),
       CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN lang = '' THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'source', count(*),
       CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(sum(CASE WHEN source = '' THEN 1 ELSE 0 END) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', count(*),
       CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       CAST(0 AS BIGINT)
FROM documents
"""


def q_above_avg_orders(sf_dir: str):
    """Correlated-subquery pattern: orders whose total exceeds their
    customer's average order total.  Float averages never cross the gate —
    the predicate is the cross-multiplied integer-cents comparison
    ``price_cents · n_orders > sum_cents`` (exactly ⇔ price > avg).

    Scale shape: per-customer (n, Σcents) via per-block integer partials
    and one narrow groupby; the predicate pass re-reads orders and probes
    a broadcast (guarded) customer stat table — or one hash join past the
    guard."""
    import ray
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, inv = np.unique(ck, return_inverse=True)
        return pa.table({
            "o_custkey": pa.array(uniq),
            "n": pa.array(np.bincount(inv, minlength=len(uniq)).astype(np.int64)),
            "s": pa.array(np.bincount(inv, weights=cents,
                                      minlength=len(uniq)).astype(np.int64)),
        })

    stats = (
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .materialize()
    )
    stats = _drop_empty_blocks(stats) or stats
    out_cols = ("o_orderkey", "o_custkey", "o_totalprice")

    if stats.count() <= BROADCAST_MAX_ROWS:
        sdf = stats.to_pandas()
        order = np.argsort(sdf["o_custkey"].to_numpy())
        stats_ref = ray.put((
            sdf["o_custkey"].to_numpy()[order].astype(np.int64),
            sdf["n"].to_numpy()[order].astype(np.int64),
            sdf["s"].to_numpy()[order].astype(np.int64),
        ))

        def above(t: pa.Table) -> pa.Table:
            keys, n, s = ray.get(stats_ref)
            ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.round(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
            ).astype(np.int64)
            pos = np.searchsorted(keys, ck)
            keep = cents * n[pos] > s[pos]  # price > avg, integer-exact
            return t.select(list(out_cols)).filter(pa.array(keep))

        return _rp(sf_dir, "orders", list(out_cols)).map_batches(
            above, batch_format="pyarrow")

    def above_joined(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.select(list(out_cols)).filter(pa.array(cents * n > s))

    return (
        _rp(sf_dir, "orders", list(out_cols))
        .join(stats, join_type="inner", num_partitions=8, on=("o_custkey",))
        .map_batches(above_joined, batch_format="pyarrow")
    )


SQL_ABOVE_AVG_ORDERS = """
WITH s AS (
  SELECT o_custkey, count(*) AS n,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
  FROM orders GROUP BY o_custkey)
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
FROM orders o JOIN s USING (o_custkey)
WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) * s.n > s.s
"""


def q_orders_per_weekday(sf_dir: str):
    """Date-part aggregate: order counts and integer-cents revenue per ISO
    weekday.  The weekday is pure epoch-day arithmetic
    (``(day + 3) mod 7 + 1`` with Monday = 1, matching DuckDB's
    isodow), so no date library crosses the gate.

    Scale shape: ≤ 7-row per-block integer partials, one tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        micros = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        days = micros // 86_400_000_000
        dow = (days + 3) % 7 + 1  # 1970-01-01 = Thursday; Monday = 1
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        uniq, inv = np.unique(dow, return_inverse=True)
        return pa.table({
            "weekday": pa.array(uniq),
            "n_orders": pa.array(np.bincount(inv, minlength=len(uniq))
                                 .astype(np.int64)),
            "revenue_cents": pa.array(np.bincount(inv, weights=cents,
                                                  minlength=len(uniq))
                                      .astype(np.int64)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "weekday": pc.cast(t["weekday"], pa.int64()),
            "n_orders": pc.cast(t["sum(n_orders)"], pa.int64()),
            "revenue_cents": pc.cast(t["sum(revenue_cents)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "orders", ["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("weekday")
        .aggregate(Sum("n_orders", alias_name="sum(n_orders)"),
                   Sum("revenue_cents", alias_name="sum(revenue_cents)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_ORDERS_PER_WEEKDAY = """
SELECT CAST(isodow(o_orderdate) AS BIGINT) AS weekday,
       count(*) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders GROUP BY 1
"""


def q_char_concentration(sf_dir: str, threshold_ppm: int = 80_000):
    """Character-concentration spam signal: per doc, the Simpson-index
    numerator Σ c_i² over CHARACTER counts, reported as parts-per-million
    of its maximum n² (1e6 = one repeated character — the classic
    keyboard-mash / padding detector).  Integer arithmetic end to end;
    flags docs at or above ``threshold_ppm``.

    Scale shape: one embarrassingly-parallel pass; per batch the character
    counts come from the vectorized UTF-8 codepoint kernel
    (functions/text.py::utf8_codepoints — a ≤4-step byte-position fold, no
    per-row python) and ONE np.unique over (row << 21 | codepoint) keys
    (codepoints ≤ 0x10FFFF fit 21 bits exactly)."""
    from sievedata.functions.text import utf8_codepoints

    def conc(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        n_rows = len(txt)
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "conc_ppm": pa.array([], pa.int64())})
        if n_rows == 0:
            return empty
        parent, cp, n_chars = utf8_codepoints(txt)
        if parent.size == 0:
            return empty
        key = (parent << np.int64(21)) | cp
        uk, cnt = np.unique(key, return_counts=True)
        # Σc² per doc (cnt < 2^21 ⇒ the float64 accumulation is exact)
        ss = np.bincount(uk >> np.int64(21),
                         weights=cnt.astype(np.float64) ** 2,
                         minlength=n_rows).astype(np.int64)
        keep = n_chars > 0
        n2 = n_chars.astype(np.int64) ** 2
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ppm = np.zeros(n_rows, dtype=np.int64)
        ppm[keep] = ss[keep] * 1_000_000 // n2[keep]
        sel = keep & (ppm >= threshold_ppm)
        return pa.table({"doc_id": pa.array(ids[sel]),
                         "conc_ppm": pa.array(ppm[sel])})

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        conc, batch_format="pyarrow")


SQL_CHAR_CONCENTRATION = """
WITH pos AS (
  SELECT doc_id, text, length(text) AS n,
         unnest(generate_series(1, length(text))) AS i
  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
c AS (
  SELECT doc_id, any_value(n) AS n, count(*) AS cnt
  FROM (SELECT doc_id, n, substr(text, i::INT, 1) AS ch FROM pos)
  GROUP BY doc_id, ch)
SELECT doc_id,
       CAST(sum(cnt * cnt) * 1000000 // (any_value(n) * any_value(n))
            AS BIGINT) AS conc_ppm
FROM c GROUP BY doc_id
HAVING CAST(sum(cnt * cnt) * 1000000 // (any_value(n) * any_value(n))
            AS BIGINT) >= 80000
"""


# --------------------------------------------------------------------------
