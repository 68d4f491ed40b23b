"""Data-mixing / corpus-statistics family — split from the single-file catalogue (round 5, pure
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

# Data-mixing / corpus-statistics family (round 3)
# --------------------------------------------------------------------------

def q_domain_mixture(sf_dir: str):
    """Target-mixture domain resampling (training-data mixing, DoReMi-style
    reweighting made deterministic): source ``srcN`` gets target weight
    ``N + 1``; the corpus is scaled to the largest integer multiple the
    scarcest domain supports (``scale = min_s(count_s // w_s)``) and each
    source keeps its first ``scale·w_s`` docs in doc_id order.

    Scale shape: the quota table is one tiny groupby (≤ #sources rows on
    the driver); the per-source GLOBAL rank reuses the stratified-sample
    bin machinery — (source, doc_id-range-bin) counts → driver exclusive
    prefix over ≤ sources × 256 ints → per-bin local sort + offset filter.
    Both data passes stream; nothing domain-sized materializes."""
    from ray.data.aggregate import Max, Min

    ds = _rp(sf_dir, "documents", ["doc_id", "source"])
    counts = ds.groupby("source").count().to_pandas()
    if len(counts) == 0:  # empty table → typed empty result
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "source": pd.Series(dtype="str")})
    wt = {
        s: int("".join(ch for ch in s if ch.isdigit()) or 0) + 1
        for s in counts["source"]
    }
    scale = int((counts["count()"] // counts["source"].map(wt)).min())
    quota = {s: scale * w for s, w in wt.items()}

    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(stats["min(doc_id)"]), int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def add_bin(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((v - lo) // width, 0, n_bins - 1).astype(np.int64)
        return t.append_column("bin", pa.array(b))

    bc = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["source", "bin"])
        .count()
        .to_pandas()
        .sort_values(["source", "bin"])
    )
    offsets = {}
    for src, g in bc.groupby("source", sort=False):
        cum = np.concatenate([[0], np.cumsum(g["count()"].to_numpy())[:-1]])
        for b, o in zip(g["bin"], cum):
            offsets[(src, int(b))] = int(o)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        src = df["source"].iloc[0]
        base = offsets[(src, int(df["bin"].iloc[0]))]
        keep = (base + np.arange(len(df))) < quota.get(src, 0)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep],
            "source": df["source"].to_numpy()[keep],
        })

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["source", "bin"])
        .map_groups(finalize, batch_format="pandas")
    )


SQL_DOMAIN_MIXTURE = """
WITH w AS (
  SELECT source, CAST(substr(source, 4) AS BIGINT) + 1 AS wt, count(*) AS cnt
  FROM documents GROUP BY source
), s AS (SELECT min(cnt // wt) AS scale FROM w),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
SELECT r.doc_id, r.source
FROM r JOIN w USING (source) CROSS JOIN s
WHERE r.rn <= s.scale * w.wt
"""


def q_label_centroids(sf_dir: str):
    """Grouped vector aggregate over the embedding column: per-label
    centroid partial sums in integer microunits (k-means-style class
    centroids / per-domain embedding means).

    Exactness: each float32 component is widened to float64, scaled by 1e6
    and floored to an int64 — identical IEEE ops on both sides — so the
    cross-block SUM is an order-insensitive integer reduction (the engine
    convention for float aggregates under the driver's value-hash gate).
    Per block: one (labels × dims) np.add.at partial, so the shuffle moves
    O(labels · dims · blocks) rows, never the vectors."""
    from ray.data.aggregate import Sum

    def partials(t: pa.Table) -> pa.Table:
        col = t["embedding"].combine_chunks()
        n = len(col)
        if n == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s_micro": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        flat = col.flatten().to_numpy(zero_copy_only=False)
        dims = np.diff(np.asarray(col.offsets))
        d = int(dims[0])
        assert (dims == d).all(), "ragged embedding column"
        micro = np.floor(flat.astype(np.float64) * 1e6).astype(np.int64)
        mat = micro.reshape(n, d)
        labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, mat)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
            "s_micro": pa.array(sums.ravel()),
            "n": pa.array(np.repeat(cnt, d)),
        })

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "label": pc.cast(t["label"], pa.int64()),
            "dim": pc.cast(t["dim"], pa.int64()),
            "s_micro": pc.cast(t["sum(s_micro)"], pa.int64()),
            "n": pc.cast(t["sum(n)"], pa.int64()),
        })

    return (
        _rp(sf_dir, "embeddings", ["label", "embedding"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("s_micro", alias_name="sum(s_micro)"),
                   Sum("n", alias_name="sum(n)"))
        .map_batches(project, batch_format="pyarrow")
    )


SQL_LABEL_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(i AS BIGINT) AS dim,
       CAST(SUM(CAST(floor(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS s_micro,
       count(*) AS n
FROM (SELECT label, unnest(embedding) AS e,
             unnest(range(len(embedding))) AS i
      FROM embeddings)
GROUP BY label, i
"""


def q_ngram_diversity(sf_dir: str):
    """Per-language corpus n-gram diversity: total char-3-gram occurrences
    and DISTINCT 3-gram vocabulary size per ``lang`` (the distinct/total
    ratio is the standard templated-corpus health metric; emitted as the
    two exact integers so the gate never compares a float division).

    Scale shape: totals are pure length arithmetic (Σ max(len−2, 0), one
    lang-keyed integer groupby); the distinct side emits each block's
    per-(lang, gram) DISTINCT set via the packed-uint64 gram kernel + one
    np.unique over (lang_code << 27 | gram) keys, so the shuffle carries
    vocabulary-sized partials (≤ langs × |charset|³), never the token
    stream.  Non-ASCII blocks fall back to per-row Python gram sets with
    identical semantics."""
    from ray.data.aggregate import Sum

    from sievedata.kernels import grams as G

    ds = _rp(sf_dir, "documents", ["lang", "text"])

    def totals(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        ln = pc.fill_null(pc.utf8_length(txt), 0).to_numpy(zero_copy_only=False)
        tot = np.maximum(ln.astype(np.int64) - 2, 0)
        lang = t["lang"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(lang, return_inverse=True)
        return pa.table({
            "lang": pa.array(uniq),
            "total_grams": pa.array(np.bincount(inv, weights=tot,
                                                minlength=len(uniq)).astype(np.int64)),
        })

    def distinct_pairs(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        ln = pc.fill_null(pc.utf8_length(txt), 0).to_numpy(zero_copy_only=False)
        keep = np.flatnonzero(ln >= 3)
        empty = pa.table({"lang": pa.array([], pa.string()),
                          "gram": pa.array([], pa.int64())})
        if len(keep) == 0:
            return empty
        txt = txt.take(pa.array(keep, pa.int64()))
        lang = t["lang"].to_numpy(zero_copy_only=False)[keep]
        luniq, linv = np.unique(lang, return_inverse=True)
        if G.is_ascii(txt):
            di, gram, _ = G.distinct_grams_packed(txt, 3)
            lcode = linv[di].astype(np.uint64)
        else:  # char-exact fallback: python gram sets per row
            rows_l, rows_g = [], []
            for i, s in enumerate(txt.to_pylist()):
                for g in {s[j:j + 3] for j in range(len(s) - 2)}:
                    rows_l.append(linv[i])
                    rows_g.append(hash(g) & ((1 << 27) - 1))
            lcode = np.asarray(rows_l, np.uint64)
            gram = np.asarray(rows_g, np.uint64)
        key = np.unique((lcode << np.uint64(27)) | gram)
        return pa.table({
            "lang": pa.array(luniq[(key >> np.uint64(27)).astype(np.int64)]),
            "gram": pa.array((key & np.uint64((1 << 27) - 1)).astype(np.int64)),
        })

    tot = (
        ds.map_batches(totals, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("total_grams", alias_name="sum(total_grams)"))
        .to_pandas()
    )
    dist = (
        ds.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby(["lang", "gram"])
        .count()
        .groupby("lang")
        .count()
        .to_pandas()
    )
    if len(tot) == 0:
        return pd.DataFrame({"lang": pd.Series(dtype="str"),
                             "total_grams": pd.Series(dtype="int64"),
                             "distinct_grams": pd.Series(dtype="int64")})
    out = tot.rename(columns={"sum(total_grams)": "total_grams"}).merge(
        dist.rename(columns={"count()": "distinct_grams"}), on="lang", how="left")
    # SQL's pos CTE has no rows for a lang whose docs are all len<3/NULL —
    # that lang must be absent, not a zero row
    out = out[out["total_grams"] > 0]
    out["distinct_grams"] = out["distinct_grams"].fillna(0).astype(np.int64)
    out["total_grams"] = out["total_grams"].astype(np.int64)
    return out.sort_values("lang").reset_index(drop=True)


SQL_NGRAM_DIVERSITY = """
WITH pos AS (
  SELECT lang, text, unnest(generate_series(1, length(text) - 2)) AS i
  FROM documents WHERE length(text) >= 3
)
SELECT lang,
       count(*) AS total_grams,
       CAST(count(DISTINCT substr(text, i, 3)) AS BIGINT) AS distinct_grams
FROM pos GROUP BY lang ORDER BY lang
"""


def _mul_hash32(ids: np.ndarray) -> np.ndarray:
    """Knuth multiplicative hash mod 2**32, well-defined for any doc_id ≥ 0:
    the product is computed in uint64 so it wraps mod 2**64 (2**32 divides
    2**64, so the low 32 bits equal those of the exact product — no silent
    int64 overflow for doc_id ≳ 3.5e9), then returned as int64 (< 2**32).
    SQL mirror: CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296."""
    return ((ids.astype(np.uint64) * np.uint64(2654435761))
            % np.uint64(4294967296)).astype(np.int64)


def q_weighted_sample(sf_dir: str, k: int = 100):
    """Deterministic size-weighted corpus sampling: priority key
    ``((doc_id · 2654435761) mod 2³²) · 10⁶ ∕∕ n_chars`` (a multiplicative
    hash divided by the weight — larger docs draw smaller keys, the
    integer-exact analogue of Efraimidis–Spirakis exponential keys without
    any float op the oracle could disagree on); keep the k smallest keys,
    doc_id tiebreak.

    Scale shape: per-block k-best partial pushdown (each block contributes
    ≤ k rows) before the final sort+limit, so the exchange carries
    O(k · blocks) rows regardless of corpus size."""

    def partial(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        nch = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = nch > 0
        ids, nch = ids[m], nch[m]
        h = _mul_hash32(ids)
        wkey = (h * 1000000) // nch
        order = np.lexsort((ids, wkey))[:k]
        return pa.table({"doc_id": pa.array(ids[order]),
                         "wkey": pa.array(wkey[order])})

    return (
        _rp(sf_dir, "documents", ["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow")
        .sort(["wkey", "doc_id"])
        .limit(k)
    )


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id,
       CAST((CAST(doc_id AS HUGEINT) * 2654435761 % 4294967296)
            * 1000000 // n_chars AS BIGINT) AS wkey
FROM documents WHERE n_chars > 0
ORDER BY wkey, doc_id LIMIT 100
"""


# --------------------------------------------------------------------------
