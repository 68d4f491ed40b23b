"""Explode / pivot / rollup / window / set-op analytics families — split from the single-file catalogue (round 5, pure
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
from sievedata.queries.similarity import _NGRAM_VOCAB_BROADCAST_LIMIT, _ngram_pairs_dataset

# Explode / pivot / rollup / histogram / quantile / semi-join families
# --------------------------------------------------------------------------

def q_word_count(sf_dir: str, k: int = 100):
    """Word-frequency top-k over documents.text (explode/UNNEST family,
    M7-adjacent tokenization).

    The explode happens INSIDE map_batches via Arrow ``split_pattern`` +
    ``list_flatten`` (vectorized — never a per-row ``flat_map``), and each
    block pre-aggregates its own word counts (``value_counts`` combiner), so
    the shuffle moves one row per distinct word per block rather than one
    row per token — at 100 TB the raw token stream never enters the object
    store."""
    from ray.data.aggregate import Sum

    def block_counts(t: pa.Table) -> pa.Table:
        words = pc.list_flatten(pc.split_pattern(t["text"].combine_chunks(), " "))
        words = words.filter(pc.not_equal(words, ""))
        vc = words.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    return (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(block_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
    )


SQL_WORD_COUNT = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 100
"""

# sentinel for per-block Misra-Gries error rows: split(' ') pieces can never
# contain the delimiter, so a leading space cannot collide with a real token
_MG_ERR_SENTINEL = " __mg_err__"


def q_heavy_hitters(sf_dir: str, k: int = 20, capacity: int = 4096):
    """EXACT top-k most frequent words via mergeable Misra-Gries summaries
    (Agarwal et al. 2013, "Mergeable summaries") — same result as
    ``word_count`` but a fundamentally different 100-TB execution strategy:
    the vocabulary never shuffles.

    q_word_count shuffles one row per DISTINCT word per block (vocab-sized
    exchange — fine for bounded vocabularies, quadratic pain for web-scale
    token soup).  Here each block emits an MG summary of ≤ ``capacity``
    (word, lower_bound) rows built from its exact value_counts by
    subtracting the (capacity+1)-th largest count (per-block error e_b ≤
    N_b/(capacity+1)), plus one sentinel row carrying e_b.  One
    summary-sized groupby merges them (MG merge = counter sum; errors add:
    E = Σ e_b).  Candidates with merged lower bound ≥ kth_lo − E are then
    EXACT-counted in a second read whose shuffle carries only candidate
    rows (``pc.is_in`` probe against the broadcast candidate set).

    Exactness proof enforced at runtime: ≥ k words have true count ≥
    kth_lo, so the k-th exact count c_k ≥ kth_lo; every excluded candidate
    has true count ≤ lo + E < kth_lo ≤ c_k (strict — ties cannot flip);
    every never-summarized word has true count ≤ E.  If E < c_k the result
    is provably the exact global top-k; otherwise (adversarially flat
    distribution / tiny capacity) fall back to the full vocab-sized
    groupby, which is always exact.  Both the candidate set and the
    summary table are guarded by BROADCAST_MAX_ROWS with the same
    fallback."""
    import ray
    from ray.data.aggregate import Sum

    docs = _rp(sf_dir, "documents", ["text"])

    def _tokens(t: pa.Table) -> pa.Array:
        words = pc.list_flatten(
            pc.split_pattern(t["text"].combine_chunks(), " "))
        return words.filter(pc.not_equal(words, ""))

    def _full_exact():
        def block_counts(t: pa.Table) -> pa.Table:
            vc = _tokens(t).value_counts()
            return pa.table({
                "word": vc.field("values"),
                "n": pc.cast(vc.field("counts"), pa.int64()),
            })

        return (
            docs.map_batches(block_counts, batch_format="pyarrow")
            .groupby("word")
            .aggregate(Sum("n", alias_name="n"))
            .sort(["n", "word"], descending=[True, False])
            .limit(k)
        )

    def block_mg(t: pa.Table) -> pa.Table:
        vc = _tokens(t).value_counts()
        w = vc.field("values")
        c = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) > capacity:
            off = int(np.partition(c, len(c) - capacity - 1)[len(c) - capacity - 1])
            keep = c > off
            w = w.filter(pa.array(keep))
            lo = c[keep] - off
        else:
            off = 0
            lo = c
        return pa.table({
            "word": pa.concat_arrays(
                [pc.cast(w, pa.string()),
                 pa.array([_MG_ERR_SENTINEL], pa.string())]),
            "lo": pa.array(np.concatenate([lo, [off]]).astype(np.int64)),
        })

    merged = (
        docs.map_batches(block_mg, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("lo", alias_name="lo"))
        .materialize()  # summary-sized: ≤ capacity × blocks (+1 sentinel)
    )
    if merged.count() == 0:  # empty corpus: Ray's empty groupby loses schema
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    if merged.count() > BROADCAST_MAX_ROWS:
        return _full_exact()

    def _strip(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t["word"], _MG_ERR_SENTINEL))

    sent = merged.map_batches(
        lambda t: t.filter(pc.equal(t["word"], _MG_ERR_SENTINEL)),
        batch_format="pyarrow").to_pandas()
    err_total = int(sent["lo"].sum()) if len(sent) else 0
    cand_all = merged.map_batches(_strip, batch_format="pyarrow")
    top_lo = cand_all.sort("lo", descending=True).limit(k).to_pandas()
    if not len(top_lo):
        return pd.DataFrame({"word": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    kth_lo = int(top_lo["lo"].min())
    thr = kth_lo - err_total  # candidates that could still reach top-k
    cands_ds = cand_all.map_batches(
        lambda t, _thr=thr: t.filter(
            pc.greater_equal(t["lo"], pa.scalar(_thr, pa.int64()))),
        batch_format="pyarrow").materialize()
    if cands_ds.count() > BROADCAST_MAX_ROWS:  # guard BEFORE the driver pull
        return _full_exact()
    cands = cands_ds.to_pandas()
    cand_ref = ray.put(pa.array(cands["word"].to_numpy(), pa.string()))

    def exact_counts(t: pa.Table) -> pa.Table:
        words = _tokens(t)
        words = words.filter(pc.is_in(words, value_set=ray.get(cand_ref)))
        vc = words.value_counts()
        return pa.table({
            "word": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    topk = (
        docs.map_batches(exact_counts, batch_format="pyarrow")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(k)
        .to_pandas()  # k rows
    )
    if err_total > 0 and (len(topk) < k or err_total >= int(topk["n"].min())):
        # never-summarized words are only bounded by E = err_total: with
        # fewer than k provable rows, or E ≥ c_k, the pruned pass is not
        # provably exact — take the always-exact path.  (E == 0 means no
        # block ever dropped a word, so the counted set IS the vocabulary
        # restricted to the threshold and the proof holds even under k.)
        return _full_exact()
    return topk.reset_index(drop=True)


SQL_HEAVY_HITTERS = """
SELECT word, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
WHERE word <> ''
GROUP BY word
ORDER BY n DESC, word
LIMIT 20
"""


def q_semi_join(sf_dir: str, threshold: float = 300_000.0):
    """Distributed semi-join (EXISTS / IN-subquery): customers with at least
    one order above the threshold (J3's complement — the Bloom anti-probe
    pattern, inverted).

    The key set is reduced distributed (per-block ``unique`` combiner →
    groupby), broadcast ONCE via ``ray.put`` when under the size guard and
    probed with vectorized ``np.isin``; above the guard it falls back to the
    native shuffle ``Dataset.join``."""
    import ray

    def block_keys(t: pa.Table) -> pa.Table:
        hit = t.filter(pc.greater(t["o_totalprice"], threshold))
        return pa.table({"o_custkey": pc.unique(hit["o_custkey"].combine_chunks())})

    keys_ds = (
        _rp(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        .map_batches(block_keys, batch_format="pyarrow")
        .groupby("o_custkey")
        .count()
        .select_columns(["o_custkey"])
        .materialize()  # count() below + the probe/join both consume it
    )
    cust = _rp(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    if keys_ds.count() > BROADCAST_MAX_ROWS:
        return cust.join(
            keys_ds, join_type="inner", num_partitions=16,
            on=("c_custkey",), right_on=("o_custkey",),
        ).select_columns(["c_custkey", "c_acctbal"])

    keys = np.sort(keys_ds.to_pandas()["o_custkey"].to_numpy())
    keys_ref = ray.put(keys)

    def probe(t: pa.Table) -> pa.Table:
        k = ray.get(keys_ref)
        mask = np.isin(t["c_custkey"].to_numpy(zero_copy_only=False), k)
        return t.filter(pa.array(mask))

    return cust.map_batches(probe, batch_format="pyarrow")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_acctbal FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
"""


def q_pivot_status(sf_dir: str):
    """Pivot via conditional aggregation: one row per order priority, one
    revenue column per order status — the wide-table reshape done as masked
    integer-cents partial sums inside map_batches (grid-exact, association-
    order-free) + ONE narrow groupby."""
    from ray.data.aggregate import Count, Sum

    statuses = ("F", "O", "P")

    def project(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        st = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        cols = {"o_orderpriority": t["o_orderpriority"]}
        for s in statuses:
            cols[f"cents_{s.lower()}"] = pa.array(np.where(st == s, cents, 0))
        return pa.table(cols)

    return (
        _rp(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(
            Sum("cents_f", alias_name="cents_f"),
            Sum("cents_o", alias_name="cents_o"),
            Sum("cents_p", alias_name="cents_p"),
            Count(alias_name="n_orders"),
        )
        .to_pandas()
    )


SQL_PIVOT_STATUS = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P'
                THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS cents_p,
       count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
"""


def q_rollup_orders(sf_dir: str):
    """ROLLUP multi-level aggregate: (priority, status) → (priority) → ()
    from ONE fine-grained shuffle; the coarser levels re-merge the ≤15-row
    partial table on the driver instead of rescanning the input — the
    partial-reuse pattern every profile/drift aggregate here is built on."""
    from ray.data.aggregate import Count, Sum

    def project(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "o_orderpriority": t["o_orderpriority"],
            "o_orderstatus": t["o_orderstatus"],
            "cents": pa.array(cents),
        })

    base = (
        _rp(sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"])
        .map_batches(project, batch_format="pyarrow")
        .groupby(["o_orderpriority", "o_orderstatus"])
        .aggregate(Sum("cents", alias_name="sum_cents"), Count(alias_name="n"))
        .to_pandas()
    )
    lvl1 = base.groupby("o_orderpriority", as_index=False)[["sum_cents", "n"]].sum()
    lvl1["o_orderstatus"] = "ALL"
    lvl0 = pd.DataFrame({
        "o_orderpriority": ["ALL"], "o_orderstatus": ["ALL"],
        "sum_cents": [base["sum_cents"].sum()], "n": [base["n"].sum()],
    })
    cols = ["o_orderpriority", "o_orderstatus", "sum_cents", "n"]
    return pd.concat([base[cols], lvl1[cols], lvl0[cols]], ignore_index=True)


SQL_ROLLUP_ORDERS = """
SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
       COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       count(*) AS n
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def q_value_histogram(sf_dir: str, width: float = 25_000.0):
    """Fixed-width histogram of order totals with per-bin min/max — the
    binned-distribution primitive behind the PSI/KS drift verdicts (A6),
    driver-facing.  Bin ids via double divide + floor (bit-identical in
    numpy and DuckDB); min/max are exact data values, so no float-reduction
    ordering can flip the hash gate."""
    from ray.data.aggregate import Count, Max, Min

    def bin_col(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bin": pa.array(np.floor(v / width).astype(np.int64)),
            "o_totalprice": t["o_totalprice"],
        })

    return (
        _rp(sf_dir, "orders", ["o_totalprice"])
        .map_batches(bin_col, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(
            Count(alias_name="n"),
            Min("o_totalprice", alias_name="min_total"),
            Max("o_totalprice", alias_name="max_total"),
        )
    )


SQL_VALUE_HISTOGRAM = """
SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bin, count(*) AS n,
       min(o_totalprice) AS min_total, max(o_totalprice) AS max_total
FROM orders GROUP BY bin
"""


def q_supplier_quantiles(sf_dir: str):
    """Per-group multi-quantile (p25/p50/p75/p95) in one bucketized grouped
    pass — the exact-quantile generalization of `median_price` (A3/A6: the
    reference's robust per-vendor percentiles, requirements.md:127).

    Discrete quantile = sorted value at 0-based index ceil(q·n)−1, matching
    DuckDB ``quantile_disc`` exactly (verified empirically) — an exact data
    value, immune to interpolation/rounding drift."""
    QS = (0.25, 0.5, 0.75, 0.95)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % 64))

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["l_suppkey", "l_extendedprice"], kind="mergesort")
        keys = df["l_suppkey"].to_numpy()
        vals = df["l_extendedprice"].to_numpy()
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        lens = np.diff(np.r_[starts, len(keys)])
        out = {"l_suppkey": keys[starts]}
        for q in QS:
            idx = starts + np.ceil(q * lens).astype(np.int64) - 1
            out[f"p{int(q * 100)}"] = vals[idx]
        return pd.DataFrame(out)

    return (
        _rp(sf_dir, "lineitem", ["l_suppkey", "l_extendedprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(quantiles, batch_format="pandas")
        .select_columns(["l_suppkey", "p25", "p50", "p75", "p95"])
    )


SQL_SUPPLIER_QUANTILES = """
SELECT l_suppkey,
       quantile_disc(l_extendedprice, 0.25) AS p25,
       quantile_disc(l_extendedprice, 0.50) AS p50,
       quantile_disc(l_extendedprice, 0.75) AS p75,
       quantile_disc(l_extendedprice, 0.95) AS p95
FROM lineitem GROUP BY l_suppkey
"""


def q_dedup_components(sf_dir: str, max_iters: int = 50):
    """Connected components over the exact n-gram Jaccard near-dup graph —
    dedup CLUSTERING (entity resolution): every document labeled with the
    smallest doc_id reachable through near-dup edges (J ≥ 0.8).

    Edges come from the exact PPJoin near-dup query (`ngram_jaccard_pairs`,
    itself oracle-checked); component labels are computed by DISTRIBUTED
    min-label propagation — per round: symmetric-edge ``Dataset.join``
    against the label table, union, per-node min.  Convergence is detected
    by the label-sum fixpoint (min-labels decrease monotonically, so an
    unchanged integer sum ⇔ no label changed — one cheap aggregate instead
    of a diff join per round).  Near-dup clusters are shallow, so the first
    rounds are plain neighbor-min (one join each); from round 3 a
    pointer-doubling self-join (label ← label[label]) is unioned in, making
    total rounds O(log diameter) for pathological chained corpora
    (templated docs with incremental drift) instead of O(diameter).
    Correctness: label values are always within-component doc_ids ≥ the
    component min and monotonically decreasing, so adding the label-of-label
    candidate preserves the fixpoint (= per-component min) and the sum-based
    convergence test.  The loop iterates ONLY over edge-touched nodes (labels
    of untouched docs cannot change — they union back in identity form at
    the end), so each round shuffles the near-dup SUBGRAPH, not the whole
    corpus.  Label tables stay Datasets end-to-end — no driver union-find."""
    import ray.data as rd
    from ray.data.aggregate import Min

    labels = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda t: pa.table({
                "doc_id": pc.cast(
                    t.filter(pc.is_valid(t["text"]))["doc_id"], pa.int64()
                ),
            }),
            batch_format="pyarrow",
        )
        .map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "component": t["doc_id"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # edges stay a DATASET end to end (pulling the pair list to the driver
    # would be O(edges) driver state — the round-1 scale sin class)
    edges_ds = _ngram_pairs_dataset(sf_dir)

    def symmetric(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.int64())
        b = t["b"].combine_chunks().cast(pa.int64())
        return pa.table({"src": pa.concat_arrays([a, b]),
                         "dst": pa.concat_arrays([b, a])})

    edges = edges_ds.map_batches(symmetric, batch_format="pyarrow").materialize()
    if edges.count() == 0:
        return labels

    # propagate only over edge-touched nodes: identity labels of untouched
    # docs can never change, so they skip every round's join/shuffle
    sub = (
        edges.select_columns(["src"])
        .groupby("src").count()
        .map_batches(
            lambda t: pa.table({"doc_id": t["src"], "component": t["src"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )
    prev_sum = None
    converged = False
    for it in range(max_iters):
        nbr = (
            edges.join(
                sub, join_type="inner", num_partitions=8,
                on=("src",), right_on=("doc_id",),
            )
            .select_columns(["dst", "component"])
            .rename_columns({"dst": "doc_id"})
        )
        cand = sub.union(nbr)
        if it >= 2:
            # pointer doubling: every label value is itself an edge-touched
            # doc_id present in `sub`, so label[label[v]] resolves via an
            # inner self-join; union it as one more min-candidate
            hop = (
                sub.join(
                    sub.map_batches(
                        lambda t: pa.table(
                            {"cdoc": t["doc_id"], "parent": t["component"]}),
                        batch_format="pyarrow",
                    ),
                    join_type="inner", num_partitions=8,
                    on=("component",), right_on=("cdoc",),
                )
                .map_batches(
                    lambda t: pa.table(
                        {"doc_id": t["doc_id"], "component": t["parent"]}),
                    batch_format="pyarrow",
                )
            )
            cand = cand.union(hop)
        sub = (
            cand.groupby("doc_id")
            .aggregate(Min("component", alias_name="component"))
            .materialize()
        )
        # empty hash partitions emit zero-column blocks that break the
        # next round's join FieldRef resolution — strip them (refs only)
        sub = _drop_empty_blocks(sub) or sub
        s = sub.sum("component")
        if s == prev_sum:
            converged = True
            break
        prev_sum = s
    if not converged:
        # silent exit would hand wrong labels to dedup_corpus / the CLI
        # keep-list; a chain with diameter > max_iters must fail loudly
        raise RuntimeError(
            f"dedup_components: min-label propagation did not converge in "
            f"{max_iters} rounds (graph diameter exceeds budget); raise "
            f"max_iters"
        )
    sub = sub.select_columns(["doc_id", "component"]).materialize()

    # untouched docs keep their identity label; touched ids are
    # output-sized, so probe with a guarded broadcast (join fallback)
    import ray

    if sub.count() <= BROADCAST_MAX_ROWS:
        touched_ref = ray.put(np.sort(
            sub.to_pandas()["doc_id"].to_numpy().astype(np.int64)))

        def untouched(t: pa.Table) -> pa.Table:
            w = ray.get(touched_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(ids, w)))

        rest = labels.map_batches(untouched, batch_format="pyarrow")
    else:
        rest = labels.join(
            sub.map_batches(
                lambda t: pa.table({"tid": t["doc_id"]}),
                batch_format="pyarrow"),
            join_type="left_outer", num_partitions=8,
            on=("doc_id",), right_on=("tid",),
        ).map_batches(
            lambda t: t.filter(pc.is_null(t["tid"])).select(
                ["doc_id", "component"]),
            batch_format="pyarrow",
        )
    return rest.union(sub)


SQL_DEDUP_COMPONENTS = """
WITH RECURSIVE
e AS (
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
  ) WHERE inter * 5 >= 4 * (na + nb - inter)
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM g
  UNION
  SELECT edg.dst, reach.r FROM reach JOIN edges edg ON reach.node = edg.src
)
SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node
"""


def q_left_join_counts(sf_dir: str):
    """Native LEFT OUTER shuffle join with null-fill: every customer and
    its order count, 0 when no orders match (outer-join semantics — the
    complement of the inner `join_native`)."""
    from ray.data.aggregate import Count

    orders_base = _rp(sf_dir, "orders", ["o_custkey"])
    cust_base = _rp(sf_dir, "customer", ["c_custkey"])
    counts = orders_base.groupby("o_custkey").aggregate(
        Count(alias_name="n_orders"))
    joined = cust_base.join(
        counts, join_type="left_outer",
        num_partitions=_join_parts(orders_base, cust_base),
        on=("c_custkey",), right_on=("o_custkey",),
    )

    def fill(t: pa.Table) -> pa.Table:
        n = pc.fill_null(pc.cast(t["n_orders"], pa.int64()), 0)
        return pa.table({"c_custkey": t["c_custkey"], "n_orders": n})

    return joined.map_batches(fill, batch_format="pyarrow")


SQL_LEFT_JOIN_COUNTS = """
SELECT c_custkey, CAST(COALESCE(o.n, 0) AS BIGINT) AS n_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey) o
ON c_custkey = o_custkey
"""


def q_priority_topk(sf_dir: str, k: int = 5):
    """Per-group top-k with PARTIAL top-k pushdown (K1/K5 generalized
    beyond top-1): each block keeps only its k best rows per group inside
    map_batches, so the shuffle moves O(k · groups · blocks) rows — never
    the full table — and the per-group finalize picks the k best of the
    partials.  Deterministic total order (value desc, key asc) so ties
    can't flip the hash gate."""

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.sort_values(
                ["o_orderpriority", "o_totalprice", "o_orderkey"],
                ascending=[True, False, True], kind="mergesort",
            )
            .groupby("o_orderpriority", sort=False)
            .head(k)
        )

    return (
        _rp(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])
        .map_batches(topk, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(topk, batch_format="pandas")
        .select_columns(["o_orderpriority", "o_orderkey", "o_totalprice"])
    )


SQL_PRIORITY_TOPK = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_orderpriority
           ORDER BY o_totalprice DESC, o_orderkey
         ) AS rn
  FROM orders
) WHERE rn <= 5
"""


def q_order_gap_days(sf_dir: str):
    """LAG window: per order, whole days since the same customer's previous
    order (-1 for the first) — the navigation-window companion to
    q_running_total's cumulative frame.  Bucket shuffle on customer hash →
    within-bucket (customer, date, key) sort → vectorized grouped diff.
    Order dates are midnight-aligned timestamps, so the day diff is an exact
    integer on both engines (DuckDB date_diff counts boundary crossings)."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        d = df.groupby("o_custkey", sort=False)["o_orderdate"].diff()
        df["gap_days"] = d.dt.days.fillna(-1).astype(np.int64)
        return df[["o_orderkey", "gap_days"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
        .select_columns(["o_orderkey", "gap_days"])
    )


SQL_ORDER_GAP_DAYS = """
SELECT o_orderkey,
       COALESCE(date_diff('day',
         lag(o_orderdate) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         o_orderdate), -1) AS gap_days
FROM orders
"""


def q_cube_orders(sf_dir: str):
    """GROUP BY CUBE multi-level aggregate over (returnflag, linestatus):
    all four grouping levels from ONE fine-grained shuffle; the coarser
    levels (flag-only, status-only, grand total) re-merge the ≤6-row partial
    table — integer-cents sums, so every re-aggregation is association-order
    exact (the rollup pattern completed to the full lattice)."""
    from ray.data.aggregate import Count, Sum

    def project(t: pa.Table) -> pa.Table:
        cents = np.round(
            t["l_quantity"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "cents": pa.array(cents),
        })

    base = (
        _rp(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])
        .map_batches(project, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Sum("cents", alias_name="qty_cents"), Count(alias_name="n"))
        .to_pandas()
    )
    lvl_f = base.groupby("l_returnflag", as_index=False)[["qty_cents", "n"]].sum()
    lvl_f["l_linestatus"] = "ALL"
    lvl_s = base.groupby("l_linestatus", as_index=False)[["qty_cents", "n"]].sum()
    lvl_s["l_returnflag"] = "ALL"
    lvl0 = pd.DataFrame({
        "l_returnflag": ["ALL"], "l_linestatus": ["ALL"],
        "qty_cents": [base["qty_cents"].sum()], "n": [base["n"].sum()],
    })
    cols = ["l_returnflag", "l_linestatus", "qty_cents", "n"]
    return pd.concat(
        [base[cols], lvl_f[cols], lvl_s[cols], lvl0[cols]], ignore_index=True
    )


SQL_CUBE_ORDERS = """
SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
       COALESCE(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents,
       count(*) AS n
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
"""


def q_full_outer_join(sf_dir: str):
    """Native FULL OUTER shuffle join with genuine unmatched rows on BOTH
    sides: per-customer urgent-order counts ⟗ per-user purchase-event
    counts on customer-key = user-id (user ids are a subset of customer
    keys, and urgent-order filtering drops customers — so the result mixes
    matched, left-only and right-only rows, all COALESCE-filled)."""
    from ray.data.aggregate import Count

    orders_base = _rp(sf_dir, "orders", ["o_custkey", "o_orderpriority"])
    events_base = _rp(sf_dir, "events", ["user_id", "event_type"])
    left = (
        orders_base
        .filter(expr="o_orderpriority == '1-URGENT'")
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n_urgent"))
    )
    right = (
        events_base
        .filter(expr="event_type == 'purchase'")
        .groupby("user_id")
        .aggregate(Count(alias_name="n_purchases"))
    )
    joined = left.join(
        right, join_type="full_outer",
        num_partitions=_join_parts(orders_base, events_base),
        on=("o_custkey",), right_on=("user_id",),
    )

    def fill(t: pa.Table) -> pa.Table:
        # Ray's outer join already coalesces the key into the left column
        return pa.table({
            "key": pc.cast(t["o_custkey"], pa.int64()),
            "n_urgent": pc.fill_null(pc.cast(t["n_urgent"], pa.int64()), 0),
            "n_purchases": pc.fill_null(pc.cast(t["n_purchases"], pa.int64()), 0),
        })

    return joined.map_batches(fill, batch_format="pyarrow")


SQL_FULL_OUTER_JOIN = """
SELECT CAST(COALESCE(o.k, e.k) AS BIGINT) AS key,
       CAST(COALESCE(o.n, 0) AS BIGINT) AS n_urgent,
       CAST(COALESCE(e.n, 0) AS BIGINT) AS n_purchases
FROM (SELECT o_custkey AS k, count(*) AS n FROM orders
      WHERE o_orderpriority = '1-URGENT' GROUP BY 1) o
FULL OUTER JOIN
     (SELECT user_id AS k, count(*) AS n FROM events
      WHERE event_type = 'purchase' GROUP BY 1) e
ON o.k = e.k
"""


def q_string_agg_statuses(sf_dir: str):
    """Ordered string aggregation (LISTAGG/string_agg): per customer, the
    '|'-joined sequence of order statuses in (date, key) order — the
    sequence-building groupby used for session/path features.  Bucket
    shuffle on customer hash keeps whole customers co-located; the join is
    a per-customer reduce inside the bucket, never a cross-bucket merge."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    def joinseq(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        out = (
            df.groupby("o_custkey", sort=False)["o_orderstatus"]
            .agg("|".join)
            .reset_index()
        )
        out.columns = ["o_custkey", "status_seq"]
        return out

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(joinseq, batch_format="pandas")
        .select_columns(["o_custkey", "status_seq"])
    )


SQL_STRING_AGG_STATUSES = """
SELECT o_custkey,
       string_agg(o_orderstatus, '|' ORDER BY o_orderdate, o_orderkey) AS status_seq
FROM orders GROUP BY o_custkey
"""


def q_intersect_users(sf_dir: str):
    """INTERSECT set operation: users that appear in BOTH the click and the
    purchase event streams — done as masked per-type flags + ONE groupby
    max (no second scan, no distinct-union shuffle), the cheapest
    distributed form of a set intersection over one table."""
    from ray.data.aggregate import Max

    def project(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": t["user_id"],
            "is_click": pa.array((et == "click").astype(np.int64)),
            "is_purchase": pa.array((et == "purchase").astype(np.int64)),
        })

    return (
        _rp(sf_dir, "events", ["user_id", "event_type"])
        .map_batches(project, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Max("is_click", alias_name="has_click"),
            Max("is_purchase", alias_name="has_purchase"),
        )
        .filter(expr="has_click == 1 and has_purchase == 1")
        .select_columns(["user_id"])
    )


SQL_INTERSECT_USERS = """
SELECT user_id FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_mode_event_type(sf_dir: str):
    """Per-group mode (most frequent value, deterministic lexicographic
    tiebreak): the arg-max-by-count aggregate.  One fine (user, type)
    groupby count, then a per-block top-1 partial so the second shuffle
    moves at most one row per user per block, finished per user inside a
    hash bucket (the priority_topk pushdown specialized to k=1)."""
    from ray.data.aggregate import Count

    n_buckets = 64

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "n", "event_type"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.groupby("user_id", sort=False).head(1)

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    return (
        _rp(sf_dir, "events", ["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="n"))
        .map_batches(top1, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(top1, batch_format="pandas")
        .select_columns(["user_id", "event_type", "n"])
    )


SQL_MODE_EVENT_TYPE = """
SELECT user_id, event_type, n FROM (
  SELECT user_id, event_type, count(*) AS n,
         row_number() OVER (
           PARTITION BY user_id ORDER BY count(*) DESC, event_type
         ) AS rn
  FROM events GROUP BY user_id, event_type
) WHERE rn = 1
"""


def q_global_rank(sf_dir: str, k: int = 8):
    """GLOBAL row_number + NTILE over the whole table — the one window shape
    no per-key cogroup can express (every prior window partitions by a key).
    Distributed pattern: (1) one cheap aggregate pass for min/max/count,
    (2) value-range bucketing (equal values always share a bucket, so
    cross-bucket ties are impossible), (3) exact per-bucket counts →
    driver-side exclusive prefix-sum over ≤256 small integers, (4) per-bucket
    local sort + offset.  Nothing larger than the 256-row count table ever
    leaves the workers; at scale the two data passes stream.  A production
    variant would pick boundaries from a quantile sketch for balance — the
    ranks are exact regardless of boundary placement."""
    from ray.data.aggregate import Count, Max, Min

    ds = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    stats = ds.aggregate(Min("o_totalprice"), Max("o_totalprice"), Count())
    lo = float(stats["min(o_totalprice)"])
    hi = float(stats["max(o_totalprice)"])
    n = int(stats["count()"])
    n_bins = 256
    width = (hi - lo) / n_bins or 1.0

    def add_bin(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.clip(((hi - v) / width).astype(np.int64), 0, n_bins - 1)
        return t.append_column("bin", pa.array(b))

    counts = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("bin")
    )
    cum = np.concatenate([[0], np.cumsum(counts["c"].to_numpy())[:-1]])
    offsets = {int(b): int(o) for b, o in zip(counts["bin"], cum)}
    # SQL NTILE(k): the first n % k tiles get ceil(n/k) rows, the rest floor
    q_, r_ = divmod(n, k)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True],
            kind="mergesort",
        )
        rn = offsets[int(df["bin"].iloc[0])] + np.arange(1, len(df) + 1)
        if q_ == 0:
            tile = rn
        else:
            big = r_ * (q_ + 1)
            tile = np.where(
                rn <= big,
                (rn - 1) // (q_ + 1) + 1,
                r_ + (rn - big - 1) // q_ + 1,
            )
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "rn": rn.astype(np.int64),
            "tile": tile.astype(np.int64),
        })

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby("bin")
        .map_groups(finalize, batch_format="pandas")
    )


SQL_GLOBAL_RANK = """
SELECT o_orderkey,
       CAST(row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn,
       CAST(ntile(8) OVER (ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS tile
FROM orders
"""


def q_shipping_priority(sf_dir: str, cutoff: str = "1998-06-01", k: int = 10):
    """TPC-H Q3-shaped multi-way join aggregate: customer(filter segment)
    ⋈ orders(filter date) ⋈ lineitem(filter date) → per-order revenue →
    global top-k.  Scale shape: lineitem is PRE-AGGREGATED to one row per
    orderkey before any join (the combiner cuts the big side ~4×); both
    joins are native hash-shuffle joins on the same key family; the final
    top-k uses the per-block-partial pushdown so only O(k·blocks) rows reach
    the driver.  Revenue as exact integer: cents(extprice) × (100 −
    pct(discount)) — association-order-proof int64 sums."""
    from ray.data.aggregate import Sum

    cut = pa.scalar(np.datetime64(cutoff, "us"), pa.timestamp("us"))

    def li_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], cut))
        ext = np.round(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        pct = np.round(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            "revenue_cents": pa.array(ext * (100 - pct)),
        })

    li_base = _rp(sf_dir, "lineitem",
                  ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
    n_parts = _join_parts(li_base)
    revenue = (
        li_base
        .map_batches(li_project, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    def o_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["o_orderdate"], cut))
        return t.select(["o_orderkey", "o_custkey", "o_orderpriority"])

    orders = _rp(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(o_project, batch_format="pyarrow")

    def c_project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["c_mktsegment"], pa.scalar("BUILDING")))
        return t.select(["c_custkey"])

    cust = _rp(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        c_project, batch_format="pyarrow"
    )

    # The customer restriction applies as a guarded-broadcast semi-join so
    # the lazy plan holds at most ONE shuffle join (two joins in one plan
    # can starve each other's actor pools on small CPU reservations); above
    # the guard the filtered-orders side is materialized between the joins.
    import ray

    if cust.count() <= BROADCAST_MAX_ROWS:
        keys_ref = ray.put(np.sort(cust.to_pandas()["c_custkey"].to_numpy()))

        def probe(t: pa.Table) -> pa.Table:
            k = ray.get(keys_ref)
            mask = np.isin(t["o_custkey"].to_numpy(zero_copy_only=False), k)
            return t.filter(pa.array(mask))

        orders_f = orders.map_batches(probe, batch_format="pyarrow")
    else:
        orders_f = orders.join(
            cust, join_type="inner", num_partitions=n_parts,
            on=("o_custkey",), right_on=("c_custkey",),
        ).materialize()

    joined = revenue.join(
        orders_f, join_type="inner", num_partitions=n_parts,
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["revenue_cents", "l_orderkey"], ascending=[False, True],
            kind="mergesort",
        ).head(k)

    out = (
        joined.select_columns(["l_orderkey", "o_orderpriority", "revenue_cents"])
        .map_batches(topk, batch_format="pandas")
        .to_pandas()
    )
    return topk(out).reset_index(drop=True)


SQL_SHIPPING_PRIORITY = """
SELECT l_orderkey, o_orderpriority, revenue_cents FROM (
  SELECT l.l_orderkey, o.o_orderpriority,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
           AS revenue_cents
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-06-01'
    AND l.l_shipdate > TIMESTAMP '1998-06-01'
  GROUP BY l.l_orderkey, o.o_orderpriority
) ORDER BY revenue_cents DESC, l_orderkey LIMIT 10
"""


def q_except_users(sf_dir: str):
    """EXCEPT set op (complement of q_intersect_users): (user, day) pairs
    with a click but no purchase that day.  Single-scan shape — masked
    per-type flags, one groupby max, then a vectorized filter; no second
    scan, no anti-join shuffle."""
    from ray.data.aggregate import Max

    def flags(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.floor_temporal(t["ts"], unit="day"),
            "has_a": pc.cast(pc.equal(et, pa.scalar("click")), pa.int8()),
            "has_b": pc.cast(pc.equal(et, pa.scalar("purchase")), pa.int8()),
        })

    def keep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.equal(t["has_a"], pa.scalar(1, pa.int8())),
                    pc.equal(t["has_b"], pa.scalar(0, pa.int8())))
        t = t.filter(m)
        # µs resolution to match DuckDB's date_trunc dtype exactly
        return pa.table({
            "user_id": t["user_id"],
            "day": pc.cast(t["day"], pa.timestamp("us")),
        })

    return (
        _rp(sf_dir, "events", ["user_id", "event_type", "ts"])
        .map_batches(flags, batch_format="pyarrow")
        .groupby(["user_id", "day"])
        .aggregate(Max("has_a", alias_name="has_a"), Max("has_b", alias_name="has_b"))
        .map_batches(keep, batch_format="pyarrow")
    )


SQL_EXCEPT_USERS = """
SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, date_trunc('day', ts) AS day FROM events WHERE event_type = 'purchase'
"""


def q_dense_rank(sf_dir: str):
    """Per-group DENSE_RANK (ties share a rank, no gaps): each order ranked
    within its customer by totalprice descending.  Bucket cogroup on the
    customer hash — the same skew-proof shape as q_order_gap_days — with the
    rank computed by a grouped vectorized pandas rank (dense), which is
    tie-stable, so no tiebreak column is needed for hash-gate determinism."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(c % n_buckets))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        r = (
            df.groupby("o_custkey", sort=False)["o_totalprice"]
            .rank(method="dense", ascending=False)
            .astype(np.int64)
        )
        return pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(),
            "drank": r.to_numpy(),
        })

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(rank, batch_format="pandas")
        .select_columns(["o_orderkey", "drank"])
    )


SQL_DENSE_RANK = """
SELECT o_orderkey,
       CAST(dense_rank() OVER (
         PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS BIGINT) AS drank
FROM orders
"""


def _token_counts(txt: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Per-row count of non-empty whitespace tokens (0 for null text) —
    vectorized: split → flatten with parent indices → bincount."""
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    split = pc.split_pattern(txt, " ")
    parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(split)
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    return np.bincount(parents[nonempty], minlength=len(txt)).astype(np.int64)


def q_stratified_sample(sf_dir: str, k: int = 10):
    """Deterministic stratified sampling: every k-th document per ``lang``
    stratum in doc_id order (training-data subsampling with per-stratum
    quotas).

    Scale shape: a per-stratum GLOBAL rank without ever materializing a
    stratum in one task — (1) one aggregate pass for the doc_id range,
    (2) (lang, doc_id-range-bin) counts → driver exclusive prefix-sum over
    ≤ strata × 256 small integers, (3) per-(lang, bin) local sort + offset
    → rank % k filter.  Equal doc_ids can't straddle bins (ids unique), so
    ranks are exact; both data passes stream."""
    from ray.data.aggregate import Count, Max, Min

    ds = _rp(sf_dir, "documents", ["doc_id", "lang"])
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if stats.get("min(doc_id)") is None:  # empty table → empty sample
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "lang": pd.Series(dtype="str")})
    lo = int(stats["min(doc_id)"])
    hi = int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def add_bin(t: pa.Table) -> pa.Table:
        v = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((v - lo) // width, 0, n_bins - 1).astype(np.int64)
        return t.append_column("bin", pa.array(b))

    counts = (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .count()
        .to_pandas()
        .sort_values(["lang", "bin"])
    )
    offsets = {}
    for lang, g in counts.groupby("lang", sort=False):
        cum = np.concatenate([[0], np.cumsum(g["count()"].to_numpy())[:-1]])
        for b, o in zip(g["bin"], cum):
            offsets[(lang, int(b))] = int(o)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        base = offsets[(df["lang"].iloc[0], int(df["bin"].iloc[0]))]
        rn = base + np.arange(len(df))
        keep = (rn % k) == 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep],
            "lang": df["lang"].to_numpy()[keep],
        })

    return (
        ds.map_batches(add_bin, batch_format="pyarrow")
        .groupby(["lang", "bin"])
        .map_groups(finalize, batch_format="pandas")
    )


SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents)
WHERE (rn - 1) % 10 = 0
"""


def q_token_shards(sf_dir: str, budget: int = 10_000):
    """Token-budget corpus sharding (sequence-packing precursor): walk the
    corpus in doc_id order and assign each document to the shard whose
    token budget its EXCLUSIVE prefix-sum falls in — how a training
    pipeline splits a corpus into ~budget-token output files.

    Scale shape: a global ordered prefix-sum, distributed exactly like
    q_global_rank — doc_id-range bins, per-bin token sums, driver prefix
    over ≤256 ints, per-bin local cumsum + offset.  No sort, no
    whole-corpus materialization; token counting is Arrow-vectorized."""
    from ray.data.aggregate import Max, Min, Sum

    ds = _rp(sf_dir, "documents", ["doc_id", "text"])
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if stats.get("min(doc_id)") is None:  # empty table → empty sharding
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "tokens": pd.Series(dtype="int64"),
                             "shard": pd.Series(dtype="int64")})
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
        tok = df["tokens"].to_numpy()
        excl = offsets[int(df["bin"].iloc[0])] + np.cumsum(tok) - tok
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "tokens": tok,
            "shard": (excl // budget).astype(np.int64),
        })

    return rows.groupby("bin").map_groups(finalize, batch_format="pandas")


SQL_TOKEN_SHARDS = """
SELECT doc_id, tokens,
       CAST(COALESCE(sum(tokens) OVER (
              ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // 10000 AS BIGINT) AS shard
FROM (
  SELECT doc_id,
         CAST(COALESCE(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')), 0) AS BIGINT) AS tokens
  FROM documents)
"""


def q_term_doc_freq(sf_dir: str, k: int = 100):
    """Vocabulary statistics: per-term document frequency (distinct docs
    containing the term) + total term frequency, top-k by df — the idf
    table every TF-IDF / quality-filter pipeline derives first.

    Scale shape: documents are one row each, so per-block (doc, term)
    DISTINCT pairs are exact without any shuffle — dictionary-encode the
    token stream, np.unique over (row << 32 | code) — and each block emits
    vocab-sized (term, df, tf) partials; one narrow groupby sums them."""
    from ray.data.aggregate import Sum

    def block_partials(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        terms = enc.dictionary
        tf = np.bincount(codes, minlength=len(terms))
        pair = np.unique((parents.astype(np.int64) << np.int64(32)) | codes)
        df_ = np.bincount(pair & np.int64(0xFFFFFFFF), minlength=len(terms))
        return pa.table({
            "term": terms,
            "df": pa.array(df_.astype(np.int64)),
            "tf": pa.array(tf.astype(np.int64)),
        })

    return (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(block_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("tf", alias_name="tf"))
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
    )


SQL_TERM_DOC_FREQ = """
SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
       CAST(count(*) AS BIGINT) AS tf
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
WHERE term <> ''
GROUP BY term
ORDER BY df DESC, term
LIMIT 100
"""


def _repetition_block_stats(t: pa.Table, max_dup_pct: int,
                            guard: int = 2**62) -> pa.Table:
    """Per-batch kernel for :func:`q_repetition_filter` (module-level so
    the overflow-fallback path is unit-testable with ``guard=0``)."""
    t = t.filter(pc.is_valid(t["text"]))
    txt = t["text"].combine_chunks()
    split = pc.split_pattern(txt, " ")
    lens = pc.list_value_length(split).to_numpy(zero_copy_only=False).astype(np.int64)
    n_grams = np.maximum(lens - 1, 0)
    n_distinct = np.zeros(len(t), dtype=np.int64)
    if int(n_grams.sum()) > 0:
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False).astype(np.int64)
        enc = pc.list_flatten(split).dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = np.int64(len(enc.dictionary))
        # gram j = (codes[j], codes[j+1]) where both positions sit in the
        # same doc
        same = parents[:-1] == parents[1:]
        gp = parents[:-1][same]
        c1, c2 = codes[:-1][same], codes[1:][same]
        n_docs = np.int64(len(t))
        if V > 0 and n_docs * V * V < np.int64(guard):
            key = (gp * V + c1) * V + c2
            uniq = np.unique(key)
            n_distinct = np.bincount(
                (uniq // (V * V)).astype(np.int64), minlength=len(t)
            ).astype(np.int64)
        elif V > 0:  # vocab² would overflow int64 — lexsort boundary count
            order = np.lexsort((c2, c1, gp))
            g, a, b = gp[order], c1[order], c2[order]
            new = np.ones(len(g), dtype=bool)
            new[1:] = (g[1:] != g[:-1]) | (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            n_distinct = np.bincount(g[new], minlength=len(t)).astype(np.int64)
    n_dup = n_grams - n_distinct
    keep = (n_dup * 100 <= max_dup_pct * n_grams).astype(np.int64)
    return pa.table({
        "doc_id": t["doc_id"],
        "n_grams": pa.array(n_grams),
        "n_distinct": pa.array(n_distinct),
        "n_dup": pa.array(n_dup),
        "keep": pa.array(keep),
    })


def q_repetition_filter(sf_dir: str, max_dup_pct: int = 5):
    """Gopher-style within-document repetition filter: per doc, the count
    of word-2-grams, distinct word-2-grams, duplicated 2-grams, and an
    integer keep verdict (duplicate fraction ≤ ``max_dup_pct``%) — the
    standard "drop template/spam pages that repeat themselves" quality
    gate a pre-training cleaning pipeline runs after per-token stats.

    Semantics pinned for the oracle: tokens are the RAW space split
    (empties kept — adjacency must match SQL's string_split), a 2-gram is
    every consecutive token pair, the verdict is pure integer arithmetic
    (``n_dup * 100 <= max_dup_pct * n_grams``; 0-gram docs keep).

    Scale shape: embarrassingly parallel — one map_batches pass, one
    doc-sized output row per input row, nothing shuffled.  Per batch the
    kernel is fully vectorized: dictionary-encode the flattened token
    stream once, pack each (doc, gram) into one int64 key (guarded
    against vocab² overflow with a lexsort fallback) and count distincts
    with a single np.unique."""
    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(
            lambda t: _repetition_block_stats(t, max_dup_pct),
            batch_format="pyarrow",
        )
    )


SQL_REPETITION_FILTER = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
),
e AS (
  SELECT doc_id, w[i] || ' ' || w[i + 1] AS gram
  FROM (SELECT doc_id, w,
               unnest(generate_series(1, greatest(len(w) - 1, 0))) AS i
        FROM t)
),
s AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct
  FROM e GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(s.n_grams, 0) AS n_grams,
       COALESCE(s.n_distinct, 0) AS n_distinct,
       COALESCE(s.n_grams - s.n_distinct, 0) AS n_dup,
       CAST(CASE WHEN COALESCE(s.n_grams - s.n_distinct, 0) * 100
                      <= 5 * COALESCE(s.n_grams, 0)
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM t LEFT JOIN s ON t.doc_id = s.doc_id
"""


def q_kmeans_clusters(sf_dir: str, k: int = 8, sample_cap: int = 20_000):
    """K-means document clustering over the embedding column: fit k
    centroids on a bounded sample (driver-side Lloyd, deterministic seed —
    functions/ann.py::kmeans_fit, the IVF coarse quantizer), then assign
    the full corpus in a streaming map_batches pass and report per-cluster
    sizes + exact integer centroid-similarity sums.  The sample is capped,
    the assignment broadcast the k×dim centroid matrix once via ray.put —
    at 100 TB only the sample and the k-row result ever leave the workers.
    No SQL oracle (iterative algorithm); gated by determinism + coverage
    tests."""
    from ray.data.aggregate import Count, Sum

    from sievedata.functions.ann import (
        embedding_matrix, kmeans_fit, make_ivf_assign_fn,
    )

    import ray

    sample = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .limit(sample_cap)
        .to_pandas()
    )
    if len(sample) == 0:
        # empty-table convention (stratified_sample, token_shards, …):
        # np.vstack over [] raises — return a typed empty frame instead
        return pd.DataFrame({
            "cluster": pd.Series([], dtype="int64"),
            "n": pd.Series([], dtype="int64"),
            "sim_micro": pd.Series([], dtype="int64"),
        })
    mat = np.vstack([np.asarray(v, dtype=np.float64)
                     for v in sample["embedding"]])
    cent_ref = ray.put(kmeans_fit(mat, k))

    def to_stats(t: pa.Table) -> pa.Table:
        # cluster col appended by the assign fn; similarity to own centroid
        # summed as integer 1e-6 units (order-insensitive exact reduce)
        return pa.table({
            "cluster": t["cluster"],
            "sim_micro": pa.array(
                np.round(
                    t["sim"].to_numpy(zero_copy_only=False) * 1e6
                ).astype(np.int64)),
        })

    assign = make_ivf_assign_fn(cent_ref)

    def assign_with_sim(t: pa.Table) -> pa.Table:
        out = assign(t)
        emb = embedding_matrix(t.column("embedding"))
        emb = emb / np.maximum(
            np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        cent = ray.get(cent_ref)
        cl = out["cluster"].to_numpy(zero_copy_only=False)
        sim = np.einsum("ij,ij->i", emb, cent[cl])
        return out.append_column("sim", pa.array(sim))

    return (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(assign_with_sim, batch_format="pyarrow")
        .map_batches(to_stats, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Count(alias_name="n"), Sum("sim_micro", alias_name="sim_micro"))
        .sort("cluster")
    )


def q_union_ids(sf_dir: str):
    """Distributed UNION (distinct) across two DIFFERENT tables: event
    user ids ∪ order customer keys — ``Dataset.union`` concatenates the
    streams without a barrier, then one groupby dedups.  The third set-op
    sibling (INTERSECT/EXCEPT above run single-scan over one table; UNION
    across tables genuinely needs the concat + distinct shuffle)."""

    def ev_ids(t: pa.Table) -> pa.Table:
        return pa.table({"id": pc.unique(t["user_id"].combine_chunks())})

    def od_ids(t: pa.Table) -> pa.Table:
        return pa.table({"id": pc.unique(t["o_custkey"].combine_chunks())})

    ev = _rp(sf_dir, "events", ["user_id"]).map_batches(
        ev_ids, batch_format="pyarrow")
    od = _rp(sf_dir, "orders", ["o_custkey"]).map_batches(
        od_ids, batch_format="pyarrow")
    return ev.union(od).groupby("id").count().select_columns(["id"])


SQL_UNION_IDS = """
SELECT user_id AS id FROM events
UNION
SELECT o_custkey AS id FROM orders
"""


def q_approx_quantiles(sf_dir: str, width: float = 1000.0):
    """Approximate quantiles from a MERGEABLE fixed-width histogram sketch
    — the streaming/scale path beside the exact sorted-offset quantiles
    (supplier_quantiles).  Per-block integer bin counts merge exactly
    (order-insensitive), the sketch is O(value-range/width) regardless of
    row count, and the estimate (lower edge of the first bin whose
    cumulative count reaches ⌈p·n/100⌉) is deterministic with error ≤
    one bin width.  Bin ids use the same bit-exact double floor-divide as
    the PSI/KS drift bins, so the SQL oracle reproduces the estimator
    EXACTLY — an approximate sketch with an exact correctness gate."""

    def bin_counts(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        b = np.floor(v / width).astype(np.int64)
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(uniq), "c": pa.array(cnt)})

    from ray.data.aggregate import Sum

    bins = (
        _rp(sf_dir, "orders", ["o_totalprice"])
        .map_batches(bin_counts, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()          # sketch-sized: O(range/width) rows
    )
    if len(bins) == 0:  # empty table (groupby loses the schema) → 0 rows
        return pd.DataFrame({"p": pd.Series(dtype="int64"),
                             "approx": pd.Series(dtype="float64")})
    bins = bins.sort_values("bin")
    cum = np.cumsum(bins["c"].to_numpy())
    n = int(cum[-1])
    out_p, out_a = [], []
    for p in (25, 50, 75, 95):
        need = np.ceil(p * n / 100.0)
        idx = int(np.searchsorted(cum, need))
        out_p.append(p)
        out_a.append(float(bins["bin"].iloc[idx]) * width)
    return pd.DataFrame({"p": pd.array(out_p, dtype="int64"),
                         "approx": pd.array(out_a, dtype="float64")})


SQL_APPROX_QUANTILES = """
WITH bins AS (
  SELECT CAST(floor(o_totalprice / 1000.0) AS BIGINT) AS b, count(*) AS c
  FROM orders GROUP BY b),
tot AS (SELECT sum(c) AS n FROM bins),
cum AS (SELECT b, sum(c) OVER (ORDER BY b) AS cc FROM bins),
ps AS (SELECT CAST(p AS BIGINT) AS p FROM (VALUES (25), (50), (75), (95)) AS t(p))
SELECT p, min(b) * 1000.0 AS approx
FROM ps, cum, tot
WHERE cc >= ceil(p * n / 100.0)
GROUP BY p
"""


def q_decontaminate(sf_dir: str, modulus: int = 97, threshold: int = 50,
                    n: int = 5):
    """Benchmark decontamination: flag training documents whose distinct
    char n-gram overlap with a held-out 'benchmark' set (docs with
    doc_id % modulus == 0) reaches ``threshold`` — the canonical
    pre-training hygiene pass (strip eval-set contamination from the
    corpus).

    Scale shape: the benchmark gram set is DISTINCT-aggregated
    distributed (vocab-sized output), broadcast once via ray.put as a
    sorted packed-uint64 array, and every training doc probes it with one
    searchsorted over its own distinct grams — no join, no per-row Python.
    Grams are length-tagged packed bytes (kernels/grams.py), lossless for
    ASCII; a non-ASCII corpus or an over-guard vocabulary falls back to a
    distributed string-gram join with identical semantics."""
    import ray

    from ray.data.aggregate import Count

    from sievedata.kernels import grams as G

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def bench_gram_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((ids % modulus) == 0))
        txt = t["text"].combine_chunks()
        if G.is_ascii(txt):
            _, gram, _ = G.distinct_grams_packed(txt, n)
            return pa.table({"gram": G.packed_to_strings(np.unique(gram), n)})
        grams: set[str] = set()  # exact scalar path for a non-ASCII batch
        for tx in txt.to_pylist():
            if tx is not None:
                grams |= {tx[i: i + n] for i in range(max(len(tx) - n + 1, 1))}
        return pa.table({"gram": pa.array(sorted(grams), pa.string())})

    bench = (docs.map_batches(bench_gram_rows, batch_format="pyarrow")
             .groupby("gram").count()
             .materialize())  # vocab-sized
    out_cols = ("doc_id", "n_overlap")
    if bench.count() == 0:  # no benchmark docs → nothing can be contaminated
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "n_overlap": pd.Series(dtype="int64")})
    if bench.count() <= _NGRAM_VOCAB_BROADCAST_LIMIT:
        bdf = bench.to_pandas()
        grams_str = pa.array(bdf["gram"].to_numpy(), pa.string())
        if G.is_ascii(grams_str):
            _, packed, _ = G.distinct_grams_packed(grams_str, n)
            # one gram per "doc" row ⇒ the packed set IS the distinct set
            bench_ref = ray.put(np.unique(packed))

            def probe(t: pa.Table) -> pa.Table:
                bg = ray.get(bench_ref)
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                keep_train = (ids % modulus) != 0
                t = t.filter(pa.array(keep_train))
                ids = ids[keep_train]
                txt = t["text"].combine_chunks()
                if G.is_ascii(txt):
                    doc_idx, gram, _ = G.distinct_grams_packed(txt, n)
                    pos = np.searchsorted(bg, gram)
                    pos[pos >= len(bg)] = len(bg) - 1 if len(bg) else 0
                    hit = bg[pos] == gram if len(bg) else np.zeros(
                        len(gram), bool)
                    cnt = np.bincount(doc_idx[hit], minlength=len(txt))
                else:  # exact scalar fallback for a non-ASCII batch
                    bset = set(G.packed_to_strings(bg, n).to_pylist())
                    cnt = np.array([
                        len({tx[i: i + n]
                             for i in range(max(len(tx) - n + 1, 1))} & bset)
                        if tx is not None else 0
                        for tx in txt.to_pylist()], dtype=np.int64)
                keep = cnt >= threshold
                return pa.table({
                    "doc_id": pa.array(ids[keep]),
                    "n_overlap": pa.array(cnt[keep].astype(np.int64)),
                })

            return docs.map_batches(probe, batch_format="pyarrow")

    # fallback: distributed string-gram join (non-ASCII corpus or a
    # benchmark vocabulary too large to broadcast)
    def train_gram_rows(t: pa.Table) -> pa.Table:
        ids_np = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array((ids_np % modulus) != 0))
        ids_np = ids_np[(ids_np % modulus) != 0]
        txt = t["text"].combine_chunks()
        if G.is_ascii(txt):
            doc_idx, gram, _ = G.distinct_grams_packed(txt, n)
            return pa.table({
                "doc_id": pa.array(ids_np[doc_idx]),
                "gram": G.packed_to_strings(gram, n),
            })
        out_id, out_g = [], []
        for d, tx in zip(ids_np, txt.to_pylist()):
            if tx is None:
                continue
            for g in {tx[i: i + n] for i in range(max(len(tx) - n + 1, 1))}:
                out_id.append(int(d))
                out_g.append(g)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "gram": pa.array(out_g, pa.string())})

    joined = (docs.map_batches(train_gram_rows, batch_format="pyarrow")
              .join(bench.select_columns(["gram"]), join_type="inner",
                    num_partitions=16, on=("gram",))
              .groupby("doc_id").aggregate(Count(alias_name="n_overlap")))
    return joined.filter(expr=f"n_overlap >= {threshold}").select_columns(
        list(out_cols))


SQL_DECONTAMINATE = """
WITH e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
bench AS (
  SELECT DISTINCT substr(text, i::INT, 5) AS g FROM e WHERE doc_id % 97 = 0),
dg AS (
  SELECT DISTINCT doc_id, substr(text, i::INT, 5) AS g
  FROM e WHERE doc_id % 97 <> 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM dg JOIN bench USING (g)
GROUP BY doc_id
HAVING count(*) >= 50
"""


def q_dedup_corpus(sf_dir: str):
    """End-to-end corpus deduplication keep-list: exact-Jaccard near-dup
    edges → connected components → keep each component's min-doc_id
    representative (plus docs with no text, which have no dedup basis),
    reporting each survivor's group size — the composition a training-data
    pipeline actually runs before tokenization.

    All stages are the already-oracle-checked distributed operators
    (PPJoin edges, min-label propagation); the survivor selection is ONE
    component-size groupby — the min-label IS a member doc_id, so the
    (component, size) aggregate already names each survivor and the old
    reps-filter + hash join were redundant (provably identical output,
    two exchanges and two materializations fewer)."""
    comps = q_dedup_components(sf_dir)  # (doc_id, component)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t["component"], pa.int64()),
            "group_size": pc.cast(t["count()"], pa.int64()),
        })

    sizes = comps.groupby("component").count().materialize()
    sizes = _drop_empty_blocks(sizes) or sizes  # zero-column empty blocks
    kept = sizes.map_batches(project, batch_format="pyarrow")

    def null_text_rows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t["text"]))
        return pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "group_size": pa.array([1] * t.num_rows, pa.int64()),
        })

    no_basis = _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        null_text_rows, batch_format="pyarrow")
    return kept.union(no_basis)


SQL_DEDUP_CORPUS = """
WITH RECURSIVE
e AS (
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
  ) WHERE inter * 5 >= 4 * (na + nb - inter)
),
edges AS (SELECT a AS src, b AS dst FROM pairs UNION ALL SELECT b, a FROM pairs),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM g
  UNION
  SELECT edg.dst, reach.r FROM reach JOIN edges edg ON reach.node = edg.src
),
comp AS (SELECT node AS doc_id, min(r) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, count(*) AS group_size FROM comp GROUP BY component)
SELECT c.doc_id, CAST(s.group_size AS BIGINT) AS group_size
FROM comp c JOIN sizes s USING (component)
WHERE c.doc_id = c.component
UNION ALL
SELECT doc_id, CAST(1 AS BIGINT) AS group_size
FROM documents WHERE text IS NULL
"""


def q_pii_scan(sf_dir: str, patterns: dict | None = None):
    """Vectorized regex PII scan + redaction over the document corpus —
    the distributed generalization of the reference's PII-stripped export
    (S10, `app/main.py` mask/hash fields): count matches of each sensitive
    pattern per doc and emit the redacted text for docs with any hit.

    Patterns are RE2 on BOTH sides (Arrow's ``count_substring_regex`` /
    ``replace_substring_regex`` and DuckDB's regexp functions are all
    RE2-backed), so non-overlap/leftmost-match semantics agree exactly.
    The default patterns are email/long-digit shapes plus a word-class
    probe that actually fires on the synthetic corpus (it contains no
    digits); the operator takes arbitrary patterns.

    Scale shape: pure map_batches — no shuffle, no state; the only
    non-streaming step is the final sort of the (hit-only) output."""
    pats = patterns or {
        "n_email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "n_digits": r"[0-9]{6,}",
        "n_entity": r"\b(customer|vendor|account)\b",
    }
    redact = "|".join(f"(?:{p})" for p in pats.values())

    def scan(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        cols = {"doc_id": t["doc_id"]}
        total = np.zeros(len(t), dtype=np.int64)
        for name, pat in pats.items():
            c = pc.count_substring_regex(txt, pat).to_numpy(zero_copy_only=False)
            c = c.astype(np.int64)
            cols[name] = pa.array(c)
            total += c
        cols["redacted"] = pc.replace_substring_regex(txt, redact, "[REDACTED]")
        out = pa.table(cols)
        return out.filter(pa.array(total > 0))

    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(scan, batch_format="pyarrow")
        .sort("doc_id")
    )


SQL_PII_SCAN = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_digits,
       CAST(len(regexp_extract_all(text, '\b(customer|vendor|account)\b')) AS BIGINT) AS n_entity,
       regexp_replace(text,
         '(?:[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,})|(?:[0-9]{6,})|(?:\b(?:customer|vendor|account)\b)',
         '[REDACTED]', 'g') AS redacted
FROM documents
WHERE text IS NOT NULL AND n_email + n_digits + n_entity > 0
ORDER BY doc_id
"""


def q_tfidf_top_terms(sf_dir: str):
    """Per-document top term by TF-IDF (whitespace tokens, idf =
    ln(N/df)) — the ranking layer over :func:`q_term_doc_freq`'s idf
    table; every keyword-extraction / relevance pipeline's first step.

    Two passes: (1) the term_doc_freq kernel aggregates the global
    (term → df) table (vocab-sized partials per block, one narrow
    groupby); (2) a stateless map_batches re-tokenizes each doc, computes
    per-(doc, term) tf via one np.unique over dictionary codes, scores
    tf·ln(N/df) and takes the per-doc argmax with an exact (score DESC,
    term ASC) tie-break.  The df table is broadcast via ray.put under the
    BROADCAST_MAX_ROWS guard; a vocab larger than the guard raises (at
    that point the right design is a term-bucketed join, as
    q_decontaminate's fallback does for grams).

    Output columns are integers + the term string — the float score is
    only an internal ORDER BY, computed as the identical double expression
    (CAST BIGINT tf × ln on doubles) on both engines."""
    import ray
    from ray.data.aggregate import Sum

    def df_partials(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parents = flat.filter(pa.array(keep)), parents[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pair = np.unique((parents.astype(np.int64) << np.int64(32)) | codes)
        df_ = np.bincount(pair & np.int64(0xFFFFFFFF), minlength=len(enc.dictionary))
        n_docs = pc.sum(pc.is_valid(t["text"]).cast(pa.int64())).as_py() or 0
        out = pa.table({
            "term": enc.dictionary,
            "df": pa.array(df_.astype(np.int64)),
            "n_docs": pa.array(np.full(len(enc.dictionary), 0, dtype=np.int64)),
        })
        # ride the doc count along as one sentinel row ('' never survives
        # the keep filter above, so it cannot collide with a real term)
        sentinel = pa.table({
            "term": pa.array([""], pa.string()),
            "df": pa.array([0], pa.int64()),
            "n_docs": pa.array([n_docs], pa.int64()),
        })
        return pa.concat_tables([out, sentinel])

    df_tbl = (
        _rp(sf_dir, "documents", ["text"])
        .map_batches(df_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"), Sum("n_docs", alias_name="n_docs"))
        .materialize()  # vocab-sized; consumed twice (count + pull)
    )
    if df_tbl.count() > BROADCAST_MAX_ROWS:
        raise NotImplementedError(
            "vocab exceeds broadcast guard — use a term-bucketed join "
            "(q_decontaminate fallback shape)"
        )
    dfp = df_tbl.to_pandas()
    n_total = int(dfp.loc[dfp["term"] == "", "n_docs"].sum())
    dfp = dfp[dfp["term"] != ""]
    df_ref = ray.put((
        np.asarray(dfp["term"], dtype=object),
        dfp["df"].to_numpy(np.int64),
        n_total,
    ))

    def top_term(t: pa.Table) -> pa.Table:
        terms_g, df_g, n_docs = ray.get(df_ref)
        order = np.argsort(terms_g, kind="mergesort")
        terms_sorted, df_sorted = terms_g[order], df_g[order]
        t = t.filter(pc.is_valid(t["text"]))
        txt = t["text"].combine_chunks()
        split = pc.split_pattern(txt, " ")
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(split)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat, parents = flat.filter(pa.array(keep)), parents[keep]
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        local_terms = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        pair, tf = np.unique(
            (parents.astype(np.int64) << np.int64(32)) | codes, return_counts=True
        )
        rows = (pair >> np.int64(32)).astype(np.int64)
        tcode = (pair & np.int64(0xFFFFFFFF)).astype(np.int64)
        pos = np.searchsorted(terms_sorted, local_terms[tcode])
        dfv = df_sorted[pos]
        score = tf.astype(np.float64) * np.log(np.float64(n_docs) / dfv)
        # per-doc argmax with (score DESC, term ASC) tie-break: lexsort is
        # stable, last key dominates
        ord_ = np.lexsort((local_terms[tcode], -score, rows))
        first = np.unique(rows[ord_], return_index=True)[1]
        pick = ord_[first]
        docs = t["doc_id"].take(pa.array(rows[pick]))
        return pa.table({
            "doc_id": docs,
            "top_term": pa.array(local_terms[tcode[pick]].tolist(), pa.string()),
            "tf": pa.array(tf[pick].astype(np.int64)),
            "df": pa.array(dfv[pick]),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(top_term, batch_format="pyarrow")
        .sort("doc_id")
    )


SQL_TFIDF_TOP_TERMS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term
  FROM documents WHERE text IS NOT NULL
), tok2 AS (SELECT doc_id, term FROM tok WHERE term <> ''),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok2 GROUP BY doc_id, term),
df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY term),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tok2),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                    tf.term
         ) AS rn
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term AS top_term, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df
FROM scored WHERE rn = 1
ORDER BY doc_id
"""


def q_multi_distinct(sf_dir: str):
    """COUNT(DISTINCT a, b) per group — multi-column distinct cardinality
    (distinct (part, supplier) combinations per returnflag), the exact
    companion to A5's single-column uniqueness checks.

    Scale shape: per-block distinct (flag, part<<32|supp) partials via one
    np.unique (the term_doc_freq idiom) collapse each block to its local
    distinct pairs before any shuffle; one groupby on the composite key
    dedups globally; the final per-flag count aggregates a 3-row table."""
    from ray.data.aggregate import Count

    def block_distinct(t: pa.Table) -> pa.Table:
        flag = t["l_returnflag"].combine_chunks().dictionary_encode()
        fcodes = flag.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        part = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        supp = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        nf = np.int64(len(flag.dictionary))
        key = (part << np.int64(32) | supp) * nf + fcodes
        uniq = np.unique(key)
        return pa.table({
            "l_returnflag": flag.dictionary.take(pa.array(uniq % nf)),
            "pair_key": pa.array(uniq // nf),
        })

    return (
        _rp(sf_dir, "lineitem", ["l_returnflag", "l_partkey", "l_suppkey"])
        .map_batches(block_distinct, batch_format="pyarrow")
        .groupby(["l_returnflag", "pair_key"])
        .count()
        .groupby("l_returnflag")
        .count()
        .map_batches(
            lambda t: pa.table({
                "l_returnflag": t["l_returnflag"],
                "n_pairs": t["count()"].cast(pa.int64()),
            }),
            batch_format="pyarrow",
        )
        .sort("l_returnflag")
    )


SQL_MULTI_DISTINCT = """
SELECT l_returnflag,
       CAST(count(DISTINCT (l_partkey, l_suppkey)) AS BIGINT) AS n_pairs
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def _doc_token_chunks(t: pa.Table, width: int):
    """Shared kernel: split ``text`` into space tokens (empties dropped) and
    join every ``width`` consecutive tokens per doc into one chunk string.

    Returns (doc_ids_per_chunk:int64 ndarray, chunks:pa.StringArray).
    Fully vectorized: one split, one boundary mask, one ``pc.binary_join``
    over a rebuilt list array — no per-token python."""
    t = t.filter(pc.is_valid(t["text"]))
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    split = pc.split_pattern(t["text"].combine_chunks(), " ")
    flat = pc.list_flatten(split)
    parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(keep))
    parents = parents[keep].astype(np.int64)
    n_tok = len(parents)
    if n_tok == 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    # within-doc token position (parents are non-decreasing after flatten)
    doc_start = np.flatnonzero(np.r_[True, parents[1:] != parents[:-1]])
    starts_per_tok = np.repeat(doc_start, np.diff(np.r_[doc_start, n_tok]))
    pos = np.arange(n_tok, dtype=np.int64) - starts_per_tok
    ci = pos // width
    # chunk boundary where the doc or the chunk index changes
    new_chunk = np.r_[True, (parents[1:] != parents[:-1]) | (ci[1:] != ci[:-1])]
    offsets = np.r_[np.flatnonzero(new_chunk), n_tok]
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    chunks = pc.binary_join(lists, " ")
    chunk_docs = doc_ids[parents[offsets[:-1]]]
    return chunk_docs, chunks


_DUP_CHUNK_BROADCAST_LIMIT = 2_000_000  # duplicated chunks; ~tens of MB


def q_chunk_dedup(sf_dir: str, width: int = 8):
    """Cross-corpus duplicated-chunk filter (Lee et al. substring-dedup at
    non-overlapping ``width``-token chunk granularity): a chunk is
    duplicated when its exact token string occurs ≥2 times anywhere in the
    corpus; per doc report chunk counts and keep = no duplicated chunk.

    Scale shape: pass 1 pre-aggregates per-block (chunk, cnt) partials
    (value_counts before any shuffle), one groupby sums them and keeps only
    cnt≥2 survivors — the DUPLICATED set, tiny for organic corpora — which
    broadcasts under a guard (probe = one ``pc.index_in`` per batch, exact
    string match); above the guard a distributed (doc, chunk)⋈dups join
    computes the same counts.  The token stream itself never shuffles on
    the fast path."""
    import ray
    from ray.data.aggregate import Sum

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def chunk_partials(t: pa.Table) -> pa.Table:
        _, chunks = _doc_token_chunks(t, width)
        vc = pa.table({"chunk": chunks}).group_by("chunk").aggregate(
            [("chunk", "count")])
        return pa.table({
            "chunk": vc["chunk"],
            "cnt": vc["chunk_count"].cast(pa.int64()),
        })

    dups = (
        docs.map_batches(chunk_partials, batch_format="pyarrow")
        .groupby("chunk")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .filter(expr="cnt >= 2")
        .materialize()  # duplicated-chunk set only (output-sized)
    )
    n_dups = dups.count()

    def finalize(doc_ids, chunks, hit) -> pa.Table:
        n_chunks = np.bincount(doc_ids[1], minlength=len(doc_ids[0]))
        n_dup = np.bincount(doc_ids[1][hit], minlength=len(doc_ids[0]))
        present = n_chunks > 0
        return pa.table({
            "doc_id": pa.array(doc_ids[0][present]),
            "n_chunks": pa.array(n_chunks[present].astype(np.int64)),
            "n_dup_chunks": pa.array(n_dup[present].astype(np.int64)),
            "keep": pa.array((n_dup[present] == 0).astype(np.int64)),
        })

    if n_dups <= _DUP_CHUNK_BROADCAST_LIMIT:
        if n_dups == 0:
            dup_arr = pa.array([], pa.string())
        else:
            dup_arr = pa.array(
                dups.to_pandas()["chunk"].to_numpy(), pa.string())
        dup_ref = ray.put(dup_arr)

        def probe(t: pa.Table) -> pa.Table:
            dup_set = ray.get(dup_ref)
            chunk_docs, chunks = _doc_token_chunks(t, width)
            # map chunk-doc ids back to batch-local row index for bincount
            uniq, inv = np.unique(chunk_docs, return_inverse=True)
            if len(dup_set):
                hit = pc.is_valid(pc.index_in(chunks, value_set=dup_set))
                hit = hit.to_numpy(zero_copy_only=False)
            else:
                hit = np.zeros(len(chunks), bool)
            return finalize((uniq, inv), chunks, hit)

        return docs.map_batches(probe, batch_format="pyarrow").sort("doc_id")

    # fallback: distributed join of (doc, chunk) instance rows against the
    # duplicated set, then per-doc counts merged with per-doc totals
    def instance_rows(t: pa.Table) -> pa.Table:
        chunk_docs, chunks = _doc_token_chunks(t, width)
        return pa.table({"doc_id": pa.array(chunk_docs), "chunk": chunks})

    inst = docs.map_batches(instance_rows, batch_format="pyarrow")
    from ray.data.aggregate import Count
    totals = inst.groupby("doc_id").aggregate(Count(alias_name="n_chunks"))
    dup_counts = (
        inst.join(dups.select_columns(["chunk"]), join_type="inner",
                  num_partitions=_join_parts(inst), on=("chunk",))
        .groupby("doc_id").aggregate(Count(alias_name="n_dup_chunks"))
    )
    joined = totals.join(dup_counts, join_type="left_outer",
                         num_partitions=_join_parts(totals), on=("doc_id",))

    def fill(t: pa.Table) -> pa.Table:
        nd = pc.fill_null(t["n_dup_chunks"], 0).combine_chunks().cast(pa.int64())
        return pa.table({
            "doc_id": t["doc_id"],
            "n_chunks": t["n_chunks"].combine_chunks().cast(pa.int64()),
            "n_dup_chunks": nd,
            "keep": pc.cast(pc.equal(nd, 0), pa.int64()),
        })

    return joined.map_batches(fill, batch_format="pyarrow").sort("doc_id")


SQL_CHUNK_DEDUP = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS rn
  FROM documents
  WHERE text IS NOT NULL
), t2 AS (
  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY rn) - 1 AS p
  FROM tok WHERE tok <> ''
), chunks AS (
  SELECT doc_id, p // 8 AS ci, string_agg(tok, ' ' ORDER BY p) AS chunk
  FROM t2 GROUP BY doc_id, p // 8
), cnt AS (
  SELECT chunk, count(*) AS c FROM chunks GROUP BY chunk
)
SELECT c.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(CASE WHEN sum(CASE WHEN cnt.c >= 2 THEN 1 ELSE 0 END) = 0
            THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM chunks c JOIN cnt USING (chunk)
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


_VOCAB_TF_BROADCAST_LIMIT = 4_000_000  # (term, tf) pairs


def q_token_rarity(sf_dir: str):
    """Per-doc token-rarity quality signal (the Gopher/C4 'fraction of rare
    words' filter, integer-exact): n_tokens, the sum of each token's GLOBAL
    corpus frequency (low sum/n ⇒ rare-word-heavy doc), and n_hapax (token
    positions whose term occurs exactly once in the corpus).

    Scale shape: pass 1 builds the global (term, tf) table from per-block
    value_counts partials (one narrow vocab-sized groupby); the vocabulary
    broadcasts under a guard and each batch scores via one ``pc.index_in``
    lookup + per-doc bincount sums; above the guard a distributed per-doc
    term-count join computes the same integers."""
    import ray
    from ray.data.aggregate import Sum

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def tok_rows(t: pa.Table):
        t = t.filter(pc.is_valid(t["text"]))
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        return doc_ids, flat.filter(pa.array(keep)), parents[keep]

    def tf_partials(t: pa.Table) -> pa.Table:
        _, flat, _ = tok_rows(t)
        vc = pa.table({"term": flat}).group_by("term").aggregate(
            [("term", "count")])
        return pa.table({
            "term": vc["term"],
            "tf": vc["term_count"].cast(pa.int64()),
        })

    vocab = (
        docs.map_batches(tf_partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("tf", alias_name="tf"))
        .materialize()  # vocab-sized
    )

    if vocab.count() <= _VOCAB_TF_BROADCAST_LIMIT:
        vdf = vocab.to_pandas()
        terms = pa.array(vdf["term"].to_numpy(), pa.string())
        tf_ref = ray.put((terms, vdf["tf"].to_numpy().astype(np.int64)))

        def score(t: pa.Table) -> pa.Table:
            terms_b, tf_b = ray.get(tf_ref)
            doc_ids, flat, parents = tok_rows(t)
            idx = pc.index_in(flat, value_set=terms_b)
            idx = idx.to_numpy(zero_copy_only=False)  # every term is in vocab
            tf_tok = tf_b[idx]
            n = len(doc_ids)
            n_tokens = np.bincount(parents, minlength=n)
            sum_tf = np.bincount(parents, weights=tf_tok.astype(np.float64),
                                 minlength=n).astype(np.int64)
            n_hapax = np.bincount(parents[tf_tok == 1], minlength=n)
            present = n_tokens > 0
            return pa.table({
                "doc_id": pa.array(doc_ids[present]),
                "n_tokens": pa.array(n_tokens[present].astype(np.int64)),
                "sum_tf": pa.array(sum_tf[present]),
                "n_hapax": pa.array(n_hapax[present].astype(np.int64)),
            })

        return docs.map_batches(score, batch_format="pyarrow").sort("doc_id")

    # fallback: per-doc (term, n) count rows joined to the tf table — the
    # shuffle moves per-doc DISTINCT terms, not the token stream
    def doc_term_counts(t: pa.Table) -> pa.Table:
        doc_ids, flat, parents = tok_rows(t)
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(len(enc.dictionary), 1)
        key = parents.astype(np.int64) * V + codes
        uniq, counts = np.unique(key, return_counts=True)
        return pa.table({
            "doc_id": pa.array(doc_ids[(uniq // V).astype(np.int64)]),
            "term": enc.dictionary.take(pa.array(uniq % V)),
            "n": pa.array(counts.astype(np.int64)),
        })

    dtc = docs.map_batches(doc_term_counts, batch_format="pyarrow")
    joined = dtc.join(vocab, join_type="inner",
                      num_partitions=_join_parts(dtc), on=("term",))

    def partials(t: pa.Table) -> pa.Table:
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        tf = t["tf"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n),
            "sum_tf": pa.array(n * tf),
            "n_hapax": pa.array(n * (tf == 1).astype(np.int64)),
        })

    return (
        joined.map_batches(partials, batch_format="pyarrow")
        .groupby("doc_id")
        .aggregate(Sum("n_tokens", alias_name="n_tokens"),
                   Sum("sum_tf", alias_name="sum_tf"),
                   Sum("n_hapax", alias_name="n_hapax"))
        .sort("doc_id")
    )


SQL_TOKEN_RARITY = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), t2 AS (
  SELECT doc_id, tok FROM tok WHERE tok <> ''
), tf AS (
  SELECT tok, count(*) AS tf FROM t2 GROUP BY tok
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tf.tf) AS BIGINT) AS sum_tf,
       CAST(sum(CASE WHEN tf.tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
FROM t2 JOIN tf USING (tok)
GROUP BY doc_id
ORDER BY doc_id
"""


def q_winnow_fingerprints(sf_dir: str):
    """MOSS winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003) at word-3-gram granularity, window w=4: per doc the shingle
    count, the DISTINCT window-min fingerprint count, and the min/max
    fingerprint values (order-insensitive integer summaries of the
    fingerprint set — the near-copy detection sketch MOSS uses).

    Embarrassingly parallel: ONE map_batches pass, no shuffle.  Shingle
    construction (``binary_join_element_wise`` over shifted token slices),
    window minima (``np.minimum`` over shifted hash slices — same-doc
    shingles are contiguous after the boundary filter) and per-doc dedup
    (lexsort + boundary diff) are Arrow/numpy vectorized; sha256 is the one
    per-shingle python loop (no Arrow kernel — the documented
    row_fingerprint trade).  Docs appear iff they have ≥1 full window
    (≥ 6 tokens)."""
    import hashlib

    K, W = 3, 4
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    _EMPTY = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_shingles": pa.array([], pa.int64()),
        "n_fp": pa.array([], pa.int64()),
        "fp_min": pa.array([], pa.int64()),
        "fp_max": pa.array([], pa.int64()),
    })

    def fp(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep].astype(np.int64)
        n_tok = len(parents)
        if n_tok < K:
            return _EMPTY
        # shingles: token positions p with p and p+K-1 in the same doc;
        # within a doc these are all positions start..end-K+1, contiguous
        m = n_tok - K + 1
        sh = pc.binary_join_element_wise(
            flat.slice(0, m), flat.slice(1, m), flat.slice(2, m), " ")
        ok = parents[:m] == parents[K - 1:]
        sh = sh.filter(pa.array(ok))
        sp = parents[:m][ok]
        if len(sp) < W:
            return _EMPTY
        h = np.fromiter(
            (int(hashlib.sha256(s).hexdigest()[:15], 16)
             for s in sh.cast(pa.binary()).to_pylist()),
            dtype=np.int64, count=len(sp))
        # full windows: shingle positions q with q and q+W-1 in the same doc
        nw = len(sp) - W + 1
        wok = sp[:nw] == sp[W - 1:]
        wm = h[:nw].copy()
        for off in range(1, W):
            np.minimum(wm, h[off:off + nw], out=wm)
        wm, wp = wm[wok], sp[:nw][wok]
        if not len(wm):
            return _EMPTY
        # distinct (doc, fingerprint) pairs via lexsort + boundary diff
        order = np.lexsort((wm, wp))
        wp, wm = wp[order], wm[order]
        first = np.r_[True, (wp[1:] != wp[:-1]) | (wm[1:] != wm[:-1])]
        wp, wm = wp[first], wm[first]
        starts = np.flatnonzero(np.r_[True, wp[1:] != wp[:-1]])
        ends = np.r_[starts[1:], len(wp)] - 1
        docs_out = wp[starts]
        n_sh = np.bincount(sp, minlength=len(doc_ids))[docs_out]
        return pa.table({
            "doc_id": pa.array(doc_ids[docs_out]),
            "n_shingles": pa.array(n_sh.astype(np.int64)),
            "n_fp": pa.array((ends - starts + 1).astype(np.int64)),
            "fp_min": pa.array(wm[starts]),   # sorted asc within doc
            "fp_max": pa.array(wm[ends]),
        })

    return docs.map_batches(fp, batch_format="pyarrow").sort("doc_id")


SQL_WINNOW_FINGERPRINTS = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS rn
  FROM documents
  WHERE text IS NOT NULL
), t2 AS (
  SELECT doc_id, tok, row_number() OVER (PARTITION BY doc_id ORDER BY rn) AS p
  FROM tok WHERE tok <> ''
), sh AS (
  SELECT doc_id, p,
         tok || ' ' || lead(tok, 1) OVER w || ' ' || lead(tok, 2) OVER w AS shingle,
         count(*) OVER (PARTITION BY doc_id) AS n_tok
  FROM t2 WINDOW w AS (PARTITION BY doc_id ORDER BY p)
), h AS (
  SELECT doc_id, p, n_tok - 2 AS n_sh,
         CAST(concat('0x', substr(sha256(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh WHERE p <= n_tok - 2
), wm AS (
  SELECT doc_id, n_sh, p,
         min(h) OVER (PARTITION BY doc_id ORDER BY p
                      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS m
  FROM h
), sel AS (
  SELECT DISTINCT doc_id, n_sh, m FROM wm WHERE p <= n_sh - 3
)
SELECT doc_id,
       CAST(max(n_sh) AS BIGINT) AS n_shingles,
       CAST(count(*) AS BIGINT) AS n_fp,
       min(m) AS fp_min,
       max(m) AS fp_max
FROM sel
GROUP BY doc_id
ORDER BY doc_id
"""


def q_posting_lists(sf_dir: str, cap: int = 5):
    """Inverted-index build (the S4 search-index sink as a first-class
    distributed materialization): per term its document frequency and a
    doc_id-ascending posting list CAPPED at ``cap`` entries (comma-joined —
    the impact-ordered prefix a search tier actually ships).

    Scale shape: per-block DISTINCT (term, doc_id) pairs via dictionary
    codes + one packed np.unique (the term_doc_freq combiner), ONE
    term-keyed shuffle of those distinct pairs, then a term-bucket cogroup
    that builds every posting string vectorized — lexsort boundaries, a
    rank<cap mask, and one ``pc.binary_join`` over a rebuilt list array; no
    per-term python.  map_groups granularity is the ~1k hash buckets, never
    the vocabulary."""
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])
    n_buckets = 512

    def distinct_pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["text"]))
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        split = pc.split_pattern(t["text"].combine_chunks(), " ")
        flat = pc.list_flatten(split)
        parents = pc.list_parent_indices(split).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        flat = flat.filter(pa.array(keep))
        parents = parents[keep].astype(np.int64)
        if not len(parents):
            return pa.table({"term": pa.array([], pa.string()),
                             "doc_id": pa.array([], pa.int64()),
                             "tbucket": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        V = max(len(enc.dictionary), 1)
        key = parents * V + codes
        uniq = np.unique(key)
        terms = enc.dictionary.take(pa.array(uniq % V))
        from sievedata.sketches.hashing import hash64
        tb = (hash64(terms, seed=11) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "term": terms,
            "doc_id": pa.array(doc_ids[(uniq // V).astype(np.int64)]),
            "tbucket": pa.array(tb),
        })

    def build_postings(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"term": pd.Series(dtype=str),
                                 "df": pd.Series(dtype="int64"),
                                 "posting": pd.Series(dtype=str)})
        terms = df["term"].to_numpy()
        doc_ids = df["doc_id"].to_numpy().astype(np.int64)
        order = np.lexsort((doc_ids, terms))
        terms, doc_ids = terms[order], doc_ids[order]
        starts = np.flatnonzero(np.r_[True, terms[1:] != terms[:-1]])
        counts = np.diff(np.r_[starts, len(terms)])
        # global rank within term (pairs are globally distinct, so the
        # cogroup sees each (term, doc) once)
        rank = np.arange(len(terms)) - np.repeat(starts, counts)
        m = rank < cap
        kept_counts = np.minimum(counts, cap)
        lists = pa.ListArray.from_arrays(
            pa.array(np.r_[0, np.cumsum(kept_counts)], pa.int32()),
            pa.array(doc_ids[m].astype("U"), pa.string()))
        posting = pc.binary_join(lists, ",")
        return pd.DataFrame({
            "term": terms[starts],
            "df": counts.astype(np.int64),
            "posting": posting.to_pandas().to_numpy(),
        })

    return (
        docs.map_batches(distinct_pairs, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(build_postings, batch_format="pandas")
        .sort("term")
    )


SQL_POSTING_LISTS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), dt AS (
  SELECT DISTINCT tok AS term, doc_id FROM tok WHERE tok <> ''
), ranked AS (
  SELECT term, doc_id,
         row_number() OVER (PARTITION BY term ORDER BY doc_id) AS r
  FROM dt
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       string_agg(CASE WHEN r <= 5 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS posting
FROM ranked
GROUP BY term
ORDER BY term
"""


def q_quality_buckets(sf_dir: str, n_buckets: int = 10):
    """CCNet-style corpus quality bucketing: assign every document a decile
    bucket by its GLOBAL token-count percentile, tie-insensitive (equal
    token counts always share a bucket — `floor(n_buckets · rank_lt / N)`
    where rank_lt counts docs with STRICTLY smaller token counts).  This is
    the head/middle/tail split CCNet applies to its perplexity scores.

    Scale shape: rank_lt depends only on the doc's own token VALUE, so the
    whole window collapses to one value-domain histogram — per-block token
    counting (Arrow-vectorized), ONE narrow groupby over distinct token
    counts (bounded by max doc length, never corpus size), a driver-side
    exclusive prefix-sum over that tiny table, then a stateless broadcast
    searchsorted per batch.  No full-row shuffle or sort anywhere — cheaper
    than the q_global_rank bin pattern because no per-bin row cogroup is
    needed."""
    import ray
    from ray.data.aggregate import Count

    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def tok_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": pa.array(_token_counts(t["text"])),
        })

    rows = docs.map_batches(tok_rows, batch_format="pyarrow")
    hist = (
        rows.groupby("tokens").aggregate(Count(alias_name="c")).to_pandas()
    )  # value-domain-bounded: one row per DISTINCT token count
    if not len(hist):
        return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                             "tokens": pd.Series(dtype="int64"),
                             "bucket": pd.Series(dtype="int64")})
    hist = hist.sort_values("tokens")
    vals = hist["tokens"].to_numpy().astype(np.int64)
    counts = hist["c"].to_numpy().astype(np.int64)
    n_total = int(counts.sum())
    rank_lt = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ref = ray.put((vals, rank_lt))

    def bucketize(t: pa.Table) -> pa.Table:
        v, rl = ray.get(ref)
        tok = _token_counts(t["text"])
        lt = rl[np.searchsorted(v, tok)]
        return pa.table({
            "doc_id": t["doc_id"],
            "tokens": pa.array(tok),
            "bucket": pa.array((n_buckets * lt // n_total).astype(np.int64)),
        })

    return docs.map_batches(bucketize, batch_format="pyarrow").sort("doc_id")


SQL_QUALITY_BUCKETS = """
WITH tok AS (
  SELECT doc_id,
         CAST(COALESCE(len(list_filter(string_split(text, ' '),
                                       x -> x <> '')), 0) AS BIGINT) AS tokens
  FROM documents
)
SELECT doc_id, tokens,
       CAST((10 * (rank() OVER (ORDER BY tokens) - 1))
            // count(*) OVER () AS BIGINT) AS bucket
FROM tok
ORDER BY doc_id
"""


def q_image_phash_dups(sf_dir: str, group_mod: int = 64, jitter_mod: int = 3):
    """Multimodal near-dup image grouping via 64-bit average-hash (aHash):
    synthesize one REAL image per document — 24-bit BMP for even ids, 8-bit
    PNG for odd (base image seeded by ``doc_id % group_mod``, then a
    per-doc uniform brightness shift of ``doc_id % jitter_mod`` — so group
    members are byte-DISTINCT payloads in MIXED container formats),
    decode → brightness-invariant aHash → hash-group.  Exact byte dedup
    cannot group these (different bytes, different containers); the
    perceptual hash groups them across formats, and ``distinct_payloads``
    proves it (1 ⇔ the group holds ≥2 different byte payloads).

    Scale shape: one map_batches decode+hash pass (per-row loop documented
    — binary codecs have no Arrow kernel; images are bounded 24×16), then
    ONE narrow groupby over 8-byte hash keys with integer aggregates.  At
    100 TB the payloads would arrive as a binary column; the synth step is
    the in-sandbox stand-in (no image libs / no binary testdata column)."""
    import hashlib

    from ray.data.aggregate import Count, Max, Min

    from sievedata.functions.codecs import (ahash64, bmp_decode, bmp_encode,
                                            png_decode, png_encode)
    from sievedata.functions.media import synth_bmp

    docs = _rp(sf_dir, "documents", ["doc_id"])

    def hash_rows(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ph = np.empty(len(ids), np.int64)
        pk = np.empty(len(ids), np.int64)
        for i, d in enumerate(ids):
            img = bmp_decode(synth_bmp(int(d) % group_mod))
            img = np.clip(img.astype(np.int16) + int(d) % jitter_mod,
                          0, 255).astype(np.uint8)
            if int(d) % 2 == 0:
                payload = bmp_encode(img)
                decoded = bmp_decode(payload)
            else:
                payload = png_encode(img, filters=int(d) % 5)
                decoded = png_decode(payload)
            ph[i] = np.int64(np.uint64(ahash64(decoded)))
            pk[i] = np.frombuffer(
                hashlib.sha256(payload).digest()[:8], "<i8")[0]
        return pa.table({
            "phash": pa.array(ph),
            "payload_key": pa.array(pk),
            "doc_id": pa.array(ids),
        })

    agg = (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("phash")
        .aggregate(
            Count(alias_name="n_docs"),
            Min("doc_id", alias_name="min_doc"),
            Max("doc_id", alias_name="max_doc"),
            Min("payload_key", alias_name="_pk_min"),
            Max("payload_key", alias_name="_pk_max"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        keep = pc.greater(t["n_docs"], 1)
        t = t.filter(keep)
        distinct = pc.cast(
            pc.not_equal(t["_pk_min"], t["_pk_max"]), pa.int64())
        return pa.table({
            "phash": t["phash"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "min_doc": t["min_doc"],
            "max_doc": t["max_doc"],
            "distinct_payloads": distinct,
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort("phash")


# --------------------------------------------------------------------------
