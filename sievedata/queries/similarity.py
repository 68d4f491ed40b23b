"""Near-dup similarity: LSH / ANN / PPJoin / media / flagship pipelines — split from the single-file catalogue (round 5, pure
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
from sievedata.queries.embeddings import SQL_ANN_TOPK

# Rows-only operators (no ANSI-SQL equivalent; driver does a rows check)
# --------------------------------------------------------------------------

def q_lang_id(sf_dir: str):
    """Stopword-profile language ID (actor pool, vectorized is_in).  The
    classifier is a deterministic stopword-count argmax (ties → first lang
    in sorted order, zero hits → 'und'), so DuckDB reproduces it exactly:
    same RE2 split, the profile word lists as VALUES literals, argmax as a
    row_number window — the pii_scan RE2↔RE2 parity pattern."""
    from sievedata.functions.text import LangId

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 4)
    )


def _lang_profile_values() -> str:
    """_LANG_PROFILES as SQL VALUES literals (the classifier's word lists
    ARE the model — embedding them keeps engine and oracle pinned to the
    same constants, like ann_lsh's hyperplane literals)."""
    from sievedata.functions.text import _LANG_PROFILES

    rows = [f"('{lang}','{tok}')"
            for lang in sorted(_LANG_PROFILES)
            for tok in sorted(_LANG_PROFILES[lang])]
    return ",\n  ".join(rows)


SQL_LANG_ID = f"""
WITH prof(lang, tok) AS (VALUES
  {_lang_profile_values()}),
toks AS (
  SELECT doc_id, tok
  FROM (SELECT doc_id,
               unnest(string_split_regex(lower(COALESCE(text, '')),
                                         '[^a-z'']+')) AS tok
        FROM documents)
  WHERE tok <> ''
),
hits AS (
  SELECT t.doc_id, p.lang, count(*) AS h
  FROM toks t JOIN prof p ON t.tok = p.tok
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY h DESC, lang) AS rn
  FROM hits
)
SELECT d.doc_id, COALESCE(b.lang, 'und') AS lang_pred
FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
"""


def q_fingerprint(sf_dir: str):
    def fp(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import fingerprint_column

        return pa.table(
            {"doc_id": t["doc_id"],
             "fingerprint": fingerprint_column(t["text"].combine_chunks())}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(fp, batch_format="pyarrow")


def q_simhash(sf_dir: str):
    def sh(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import simhash_column

        sig = simhash_column(t["text"].to_pylist())
        return pa.table(
            {"doc_id": t["doc_id"],
             "simhash": pa.array([f"{int(x):016x}" for x in sig], pa.string())}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(sh, batch_format="pyarrow")


def q_minhash_near_dups(sf_dir: str, threshold_ppm: int = 500_000):
    """MinHash-LSH near-dup candidate pairs, exact-Jaccard verified.

    shingle→minhash per batch → band-explode → groupby(band) → pairs →
    dedup pairs → verify with exact n-gram Jaccard (broadcast text of
    candidate docs only).  Jaccard is emitted as integer parts-per-million
    (inter·10⁶ ∕∕ union) and the threshold predicate is pure integer
    arithmetic, so the DuckDB oracle reproduces it bit-exactly.

    Oracle contract: because candidates are VERIFIED with the exact
    distinct-char-5-gram Jaccard, the emitted set equals the full
    {pairs : J ≥ τ} set whenever no qualifying pair falls in the LSH
    marginal band.  Measured on the driver corpus (sf0.001/0.01/0.1):
    the J distribution is bimodal — every qualifying pair has J ≥ 0.92,
    where the 16-band × 4-row miss probability is ≤ (1−0.92⁴)¹⁶ ≈ 2e-9 —
    and recall was verified exhaustively to be 1 at each scale."""
    import ray

    from sievedata.functions.dedup import lsh_band_rows, minhash_signature_batch

    n_buckets = 128

    def sig_rows(t: pa.Table) -> pa.Table:
        ids = [str(x) for x in t["doc_id"].to_pylist()]
        sigs = minhash_signature_batch(t["text"].combine_chunks())
        rows = lsh_band_rows(ids, sigs)
        bucket = (rows["band_hash"].to_numpy() % np.uint64(n_buckets)).astype(np.int64)
        return rows.append_column("bucket", pa.array(bucket))

    def pairs_bucket(df: pd.DataFrame, cap: int = 50) -> pd.DataFrame:
        """Candidate pairs from all multi-doc (band_id, band_hash) groups in
        one bucket — vectorized group filter; per-group doc cap bounds the
        O(n²) fan-out like the reference's BR-004 candidate cap."""
        sizes = df.groupby(["band_id", "band_hash"], sort=False)["doc_id"].transform("size")
        multi = df[sizes >= 2]
        rows = []
        for _, g in multi.groupby(["band_id", "band_hash"], sort=False):
            ids = sorted(g["doc_id"].unique())[:cap]
            rows.extend((a, b) for i, a in enumerate(ids) for b in ids[i + 1 :])
        if not rows:
            return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str)})
        return pd.DataFrame(rows, columns=["a", "b"])

    # candidate pairs, deduped DISTRIBUTED: same (a,b) always hashes to the
    # same pair bucket, so one per-bucket drop_duplicates is global.
    def add_pair_bucket(t: pa.Table) -> pa.Table:
        from sievedata.sketches.hashing import hash64

        combined = pc.binary_join_element_wise(
            t["a"].combine_chunks(), t["b"].combine_chunks(), "\x1f"
        )
        pb = (hash64(combined, seed=71) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("pair_bucket", pa.array(pb))

    pairs = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sig_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(
            lambda df: df.drop_duplicates(["a", "b"])[["a", "b"]],
            batch_format="pandas",
        )
        .materialize()  # small: candidate pairs only
    )
    if pairs.count() == 0:
        return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
                             "jaccard_ppm": pd.Series(dtype="int64")})

    # exact-Jaccard verification as two hash-partitioned shuffle joins
    # (pairs ⋈ shingles on a, then on b).  The candidate-ID set is
    # output-sized (O(pairs), COUNTED small above) so it broadcasts to
    # prune shingle computation to candidate docs only; the shingle ARRAYS
    # themselves never touch the driver (round-1 scale sin).  If the
    # candidate set ever exceeds the guard, skip the pruning broadcast and
    # shingle the full corpus streaming — the joins stay identical.
    prune_ref = None
    if pairs.count() <= 200_000:
        pdf_ids = pairs.to_pandas()
        prune_ref = ray.put(set(pdf_ids["a"]) | set(pdf_ids["b"]))

    def shingle_sets(t: pa.Table) -> pa.Table:
        from sievedata.functions.dedup import shingle_hashes

        ids = [str(x) for x in t["doc_id"].to_pylist()]
        txts = t["text"].to_pylist()
        if prune_ref is not None:
            wanted = ray.get(prune_ref)
            keep = [i for i, d in enumerate(ids) if d in wanted]
            ids = [ids[i] for i in keep]
            txts = [txts[i] for i in keep]
        # serialized (binary) sorted int64 arrays: hash joins don't support
        # list-typed payload columns, binary payloads shuffle fine
        arrs = [np.sort(shingle_hashes(x or "")).astype(np.int64).tobytes() for x in txts]
        return pa.table(
            {"doc_id": pa.array(ids, pa.string()),
             "shingles": pa.array(arrs, pa.binary())}
        )

    shingles = _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        shingle_sets, batch_format="pyarrow"
    )

    def _pair_overlap(sa: bytes, sb: bytes) -> tuple[int, int]:
        va = np.frombuffer(sa, dtype=np.int64)
        vb = np.frombuffer(sb, dtype=np.int64)
        inter = np.intersect1d(va, vb, assume_unique=True).size
        return inter, va.size + vb.size - inter

    if prune_ref is not None:
        # both sides are output-sized (counted small above): one worker-task
        # cogroup — the lookup dict lives in a REMOTE task, not the driver —
        # avoids the two hash-join operators' fixed cost on tiny inputs
        def pad_pairs(t: pa.Table) -> pa.Table:
            return pa.table(
                {"a": t["a"], "b": t["b"],
                 "doc_id": pa.nulls(t.num_rows, pa.string()),
                 "shingles": pa.nulls(t.num_rows, pa.binary())}
            )

        def pad_sh(t: pa.Table) -> pa.Table:
            return pa.table(
                {"a": pa.nulls(t.num_rows, pa.string()),
                 "b": pa.nulls(t.num_rows, pa.string()),
                 "doc_id": t["doc_id"], "shingles": t["shingles"]}
            )

        def verify_all(t: pa.Table) -> pa.Table:
            mask = pc.is_valid(t["doc_id"])
            sh = t.filter(mask)
            pr = t.filter(pc.invert(mask))
            lut = dict(zip(sh["doc_id"].to_pylist(), sh["shingles"].to_pylist()))
            a_l = pr["a"].to_pylist()
            b_l = pr["b"].to_pylist()
            ov = [_pair_overlap(lut[a], lut[b]) for a, b in zip(a_l, b_l)]
            inter = np.array([o[0] for o in ov], dtype=np.int64)
            union = np.maximum(np.array([o[1] for o in ov], dtype=np.int64), 1)
            out = pa.table(
                {"a": pr["a"], "b": pr["b"],
                 "jaccard_ppm": pa.array(inter * 1_000_000 // union)}
            )
            return out.filter(pa.array(inter * 1_000_000 >= threshold_ppm * union))

        out = (
            pairs.map_batches(pad_pairs, batch_format="pyarrow")
            .union(shingles.map_batches(pad_sh, batch_format="pyarrow"))
            .repartition(1)
            .map_batches(verify_all, batch_format="pyarrow", batch_size=None)
            .to_pandas()
        )
        return out.sort_values(["a", "b"]).reset_index(drop=True)

    joined = pairs.join(
        shingles, join_type="inner", num_partitions=8,
        on=("a",), right_on=("doc_id",), right_suffix="_a",
    ).join(
        shingles, join_type="inner", num_partitions=8,
        on=("b",), right_on=("doc_id",), right_suffix="_b",
    )

    def verify(t: pa.Table) -> pa.Table:
        sa_col = t["shingles"] if "shingles" in t.column_names else t["shingles_a"]
        sb_col = t["shingles_b"]
        ov = [_pair_overlap(sa, sb)
              for sa, sb in zip(sa_col.to_pylist(), sb_col.to_pylist())]
        inter = np.array([o[0] for o in ov], dtype=np.int64)
        union = np.maximum(np.array([o[1] for o in ov], dtype=np.int64), 1)
        out = pa.table({"a": t["a"], "b": t["b"],
                        "jaccard_ppm": pa.array(inter * 1_000_000 // union)})
        return out.filter(pa.array(inter * 1_000_000 >= threshold_ppm * union))

    out = joined.map_batches(verify, batch_format="pyarrow").to_pandas()
    return out.sort_values(["a", "b"]).reset_index(drop=True)


SQL_MINHASH_NEAR_DUPS = """
WITH d AS (
  SELECT CAST(doc_id AS VARCHAR) AS id, COALESCE(text, '') AS text
  FROM documents
),
g AS (
  SELECT id, substr(text, i, 5) AS gram
  FROM (SELECT id, text, unnest(generate_series(1, length(text) - 4)) AS i
        FROM d WHERE length(text) >= 5)
  GROUP BY id, gram
  UNION ALL
  SELECT id, text AS gram FROM d WHERE length(text) < 5
),
sz AS (SELECT id, count(*) AS n FROM g GROUP BY id),
inter AS (
  SELECT ga.id AS a, gb.id AS b, count(*) AS i
  FROM g ga JOIN g gb ON ga.gram = gb.gram AND ga.id < gb.id
  GROUP BY 1, 2
)
SELECT x.a, x.b,
       CAST(x.i * 1000000 // (sa.n + sb.n - x.i) AS BIGINT) AS jaccard_ppm
FROM inter x
JOIN sz sa ON sa.id = x.a
JOIN sz sb ON sb.id = x.b
WHERE x.i * 1000000 >= 500000 * (sa.n + sb.n - x.i)
ORDER BY a, b
"""


def q_simhash_near_dups(sf_dir: str, max_hamming: int = 12, n_tables: int = 4):
    """SimHash near-dup pairs: 64-bit signatures bucketed by rotated 16-bit
    prefixes (a pair within Hamming distance d collides in ≥1 of the
    ``n_tables`` rotations with high probability), Hamming-verified.
    Approximate by design → rows-only; determinism covered in tests."""
    import ray

    def sig_rows(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import simhash_column

        sigs = simhash_column(t["text"].to_pylist())
        ids = [str(x) for x in t["doc_id"].to_pylist()]
        out_ids, out_tables, out_keys, out_sigs = [], [], [], []
        for r in range(n_tables):
            rot = ((sigs << np.uint64(16 * r)) | (sigs >> np.uint64(64 - 16 * r))).astype(np.uint64)
            prefix = (rot >> np.uint64(48)).astype(np.int64)
            out_ids.extend(ids)
            out_tables.extend([r] * len(ids))
            out_keys.extend(prefix.tolist())
            out_sigs.extend(sigs.astype(np.int64).tolist())
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.string()),
                "table_id": pa.array(out_tables, pa.int32()),
                "prefix": pa.array(out_keys, pa.int64()),
                "sig": pa.array(out_sigs, pa.int64()),
            }
        )

    def pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
        from sievedata.functions.text import hamming64

        sizes = df.groupby(["table_id", "prefix"], sort=False)["doc_id"].transform("size")
        multi = df[sizes >= 2]
        rows = []
        for _, g in multi.groupby(["table_id", "prefix"], sort=False):
            g = g.drop_duplicates("doc_id").sort_values("doc_id")
            ids = g["doc_id"].to_numpy()
            sigs = g["sig"].to_numpy().astype(np.uint64)
            n = len(g)
            if n > 200:
                g = g.head(200)
                ids, sigs, n = ids[:200], sigs[:200], 200
            for i in range(n):
                d = hamming64(np.repeat(sigs[i], n - i - 1), sigs[i + 1:])
                for off in np.flatnonzero(d <= max_hamming):
                    rows.append((ids[i], ids[i + 1 + off], int(d[off])))
        if not rows:
            return pd.DataFrame({"a": pd.Series(dtype=str), "b": pd.Series(dtype=str),
                                 "hamming": pd.Series(dtype="int64")})
        return pd.DataFrame(rows, columns=["a", "b", "hamming"])

    out = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(sig_rows, batch_format="pyarrow")
        .map_batches(
            lambda t: t.append_column(
                "bucket", pa.array((t["prefix"].to_numpy(zero_copy_only=False) % 64).astype(np.int64))
            ),
            batch_format="pyarrow",
        )
        .groupby("bucket")
        .map_groups(pairs_bucket, batch_format="pandas")
        .to_pandas()
    )
    return out.drop_duplicates(["a", "b"]).sort_values(["a", "b"]).reset_index(drop=True)


def _ppjoin_pairs_bucket(df: pd.DataFrame, num: int, den: int) -> pd.DataFrame:
    """Candidate pairs from one prefix-gram hash bucket: for every gram
    shared by ≥2 docs, emit doc pairs surviving the PPJoin LENGTH filter
    (t·|B| ≤ |A|) and POSITIONAL filter (overlap upper bound
    1 + min(|A|−pa−1, |B|−pb−1) must reach α = ⌈t/(1+t)·(|A|+|B|)⌉)."""
    out_a: list[np.ndarray] = []
    out_b: list[np.ndarray] = []
    sizes = df.groupby("gram", sort=False)["doc_id"].transform("size")
    for _, g in df[sizes >= 2].groupby("gram", sort=False):
        g = g.sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        nn = g["doc_n"].to_numpy()
        pos = g["pos"].to_numpy()
        i, j = np.triu_indices(len(ids), 1)
        na, nb = nn[i], nn[j]
        lo = np.minimum(na, nb)
        hi = np.maximum(na, nb)
        alpha = (num * (na + nb) + num + den - 1) // (num + den)
        ubound = 1 + np.minimum(na - pos[i] - 1, nb - pos[j] - 1)
        keep = (lo * den >= num * hi) & (ubound >= alpha)
        out_a.append(ids[i][keep])
        out_b.append(ids[j][keep])
    if not out_a:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64")})
    return pd.DataFrame(
        {"a": np.concatenate(out_a), "b": np.concatenate(out_b)}
    ).drop_duplicates()


def _ppjoin_pair_bucket_col(t: pa.Table, n_buckets: int) -> pa.Table:
    a = t["a"].to_numpy(zero_copy_only=False)
    b = t["b"].to_numpy(zero_copy_only=False)
    pb = ((a * np.int64(1_000_003) + b) % n_buckets).astype(np.int64)
    return t.append_column("pair_bucket", pa.array(pb))


def _ppjoin_dedup_group(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(["a", "b"])[["a", "b"]]


_NGRAM_VOCAB_BROADCAST_LIMIT = 4_000_000  # grams; ~64 MB of (gram, df) pairs
_NGRAM_DF_CAP = (1 << 19) - 1  # df saturates here; order stays total via gram tiebreak
_BITSET_BYTES_LIMIT = 64 << 20  # docs × vocab-bitset bytes worth broadcasting


def q_ngram_jaccard_pairs(sf_dir: str, num: int = 4, den: int = 5, n: int = 5):
    """EXACT char n-gram Jaccard near-dup pairs ≥ num/den — the PPJoin
    algorithm (Xiao et al., WWW'08: AllPairs prefix filtering + positional
    and length filters), zero recall loss, no O(N²) candidate generation.

    Fast path (ASCII corpus, gram vocabulary small enough to broadcast):
    1. one vocab-sized document-frequency aggregate — per-batch partial
       counts of packed-uint64 grams → ``groupby(gram).sum`` (output is
       VOCAB-sized, not corpus-sized) → broadcast as two sorted numpy
       arrays (``ray.put`` once, searchsorted lookup in every task).
    2. one map_batches pass re-reads documents and does gramming + df
       lookup + (df, gram)-ordered PPJoin prefix selection entirely
       batch-locally — the two per-key shuffles of the generic path
       disappear.  df saturates at _NGRAM_DF_CAP; the order stays total
       (gram tiebreak), and ANY total order is correct for prefix
       filtering — df-ordering is the recall-friendly heuristic only.
    3. prefix grams shuffle ONCE by gram hash → vectorized candidate pairs
       (length + positional filters) → pair-hash shuffle dedups.
    4. verification: distributed distinct-doc count over candidate pairs;
       if the candidate doc set is provably small, their texts broadcast
       once and pairs verify in map_batches via the indexed searchsorted
       kernel (kernels/grams.py) — no join; else two hash joins ship texts.

    Falls back to :func:`_ngram_pairs_generic` (string grams, shuffle df /
    prefix stages, same semantics) when a non-ASCII batch is detected, the
    vocabulary exceeds the broadcast limit, or n > 5."""
    if n <= 5 and _probably_ascii_corpus(sf_dir):
        res = _ngram_pairs_ascii_fast(sf_dir, num, den, n)
        if res is not None:
            return res
    return _ngram_pairs_generic(sf_dir, num, den, n)




def _probably_ascii_corpus(sf_dir: str, sample_rows: int = 1024) -> bool:
    """Cheap routing probe: is the FIRST slice of documents.text ASCII?
    Heuristic only — the fast path still detects a late non-ASCII batch
    via its sentinel and falls back with identical results; this probe
    just avoids paying the fast path's full gram pass twice on a corpus
    that is obviously non-ASCII up front."""
    import pyarrow.parquet as pq

    from sievedata.kernels import grams as G

    try:
        pf = pq.ParquetFile(f"{sf_dir}/documents.parquet")
        for batch in pf.iter_batches(batch_size=sample_rows, columns=["text"]):
            return G.is_ascii(batch.column(0))
    except Exception:
        return True  # non-file layouts: let the fast path's sentinel decide
    return True


def _ngram_pairs_ascii_fast(sf_dir: str, num: int, den: int, n: int,
                            as_dataset: bool = False):
    import ray

    from sievedata.kernels import grams as G
    from sievedata.sketches.hashing import _splitmix64

    n_buckets = 64
    tag_bits = np.uint64(8 * n + 3)
    docs = _rp(sf_dir, "documents", ["doc_id", "text"])

    def df_partial(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        if not G.is_ascii(txt):  # sentinel row → caller falls back
            return pa.table({"gram": pa.array([-1], pa.int64()),
                             "cnt": pa.array([1], pa.int64())})
        _, gram, _ = G.distinct_grams_packed(txt, n)
        uniq, cnt = np.unique(gram, return_counts=True)
        return pa.table({"gram": pa.array(uniq.astype(np.int64)),
                         "cnt": pa.array(cnt.astype(np.int64))})

    df_tbl = (docs.map_batches(df_partial, batch_format="pyarrow")
              .groupby("gram").sum("cnt")
              .materialize())  # vocab-sized; one execution for count + pull
    if df_tbl.count() > _NGRAM_VOCAB_BROADCAST_LIMIT:
        return None
    pdf = df_tbl.to_pandas()  # vocab-sized (guarded above)
    gram_vals = pdf["gram"].to_numpy()
    if len(gram_vals) and gram_vals.min() < 0:
        return None  # non-ASCII batch seen
    order = np.argsort(gram_vals)
    vocab_u64 = gram_vals[order].astype(np.uint64)  # for bitset verify
    dfs = np.minimum(pdf["sum(cnt)"].to_numpy()[order], _NGRAM_DF_CAP)
    lut_ref = ray.put((gram_vals[order].astype(np.int64),
                       dfs.astype(np.uint64)))

    def prefix_rows(t: pa.Table) -> pa.Table:
        key = lut_ref.hex()
        cached = _LUT_CACHE.get(key)
        if cached is None:
            cached = ray.get(lut_ref)
            _LUT_CACHE.clear()
            _LUT_CACHE[key] = cached
        gs, dfv_tab = cached
        txt = t["text"].combine_chunks()
        doc_idx, gram, doc_n = G.distinct_grams_packed(txt, n)
        dfv = dfv_tab[np.searchsorted(gs, gram.astype(np.int64))]
        okey = (dfv << tag_bits) | gram  # total (df, gram) order
        order = np.lexsort((okey, doc_idx))
        doc_s = doc_idx[order]
        gram_s = gram[order]
        starts = np.concatenate(([0], np.cumsum(doc_n)))
        rank = np.arange(len(gram_s), dtype=np.int64) - np.repeat(
            starts[:-1], doc_n
        )
        dnr = doc_n[doc_s]
        L = dnr - (num * dnr + den - 1) // den + 1
        keep = rank < L
        ids_np = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        g_out = gram_s[keep]
        gb = (_splitmix64(g_out) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "gram": pa.array(g_out.astype(np.int64)),
            "doc_id": pa.array(ids_np[doc_s[keep]]),
            "doc_n": pa.array(dnr[keep]),
            "pos": pa.array(rank[keep]),
            "gbucket": pa.array(gb),
        })

    pairs = (
        docs.map_batches(prefix_rows, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(functools.partial(_ppjoin_pairs_bucket, num=num, den=den),
                    batch_format="pandas")
        .map_batches(functools.partial(_ppjoin_pair_bucket_col,
                                       n_buckets=n_buckets),
                     batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(_ppjoin_dedup_group, batch_format="pandas")
        .materialize()  # candidate pairs only (output-sized)
    )

    empty = pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in ("a", "b", "inter", "uni")})
    if pairs.count() == 0:
        if as_dataset:
            import ray.data as rd
            return rd.from_pandas(empty)
        return empty

    texts = _rp(sf_dir, "documents", ["doc_id", "text"])
    n_docs = texts.count()  # parquet metadata — no data read
    wanted_ids = None
    if n_docs > 50_000:
        # corpus too big to broadcast whole — is the candidate DOC set
        # small?  Distributed distinct over pair endpoints (vocab-sized).
        def emit_ids(t: pa.Table) -> pa.Table:
            both = pa.concat_arrays([
                t["a"].combine_chunks().cast(pa.int64()),
                t["b"].combine_chunks().cast(pa.int64()),
            ])
            return pa.table({"doc": both})

        wanted_ds = (pairs.map_batches(emit_ids, batch_format="pyarrow")
                     .groupby("doc").count()
                     .materialize())  # ≤ one row per candidate doc
        if wanted_ds.count() <= 50_000:
            wanted_ids = np.sort(
                wanted_ds.to_pandas()["doc"].to_numpy().astype(np.int64)
            )

    if n_docs <= 50_000 or wanted_ids is not None:
        # candidate texts are provably small: PRE-PACK their gram sets once
        # (CSR uint64 arrays), broadcast via ray.put, and verify pairs in
        # parallel map_batches — no shuffle join, no per-batch re-packing
        if wanted_ids is not None:
            wanted_ref = ray.put(wanted_ids)

            def keep_wanted(t: pa.Table) -> pa.Table:
                w = ray.get(wanted_ref)
                ids = t["doc_id"].to_numpy(zero_copy_only=False)
                return t.filter(pa.array(np.isin(ids, w)))

            texts = texts.map_batches(keep_wanted, batch_format="pyarrow")
        tdf = texts.to_pandas()
        ids_np = tdf["doc_id"].to_numpy().astype(np.int64)
        order = np.argsort(ids_np)
        txt_arr = pa.array(tdf["text"].to_numpy()[order], pa.string())
        gram_p, starts_p, doc_n_p = G.pack_doc_grams(txt_arr, n)
        # templated corpora have tiny GLOBAL vocabularies (the df aggregate
        # already computed it): verify via |vocab|-bit bitsets + popcount —
        # ~100× less memory traffic than gathering per-pair gram lists
        words = (len(vocab_u64) + 63) // 64
        if len(ids_np) * words * 8 <= _BITSET_BYTES_LIMIT:
            bits = G.build_bitsets(gram_p, starts_p, doc_n_p, vocab_u64)
            pack_ref = ray.put(("bits", ids_np[order], bits, doc_n_p))
        else:
            pack_ref = ray.put(
                ("csr", ids_np[order], gram_p, starts_p, doc_n_p))

        def verify_batch(t: pa.Table) -> pa.Table:
            key = pack_ref.hex()
            pack = _LUT_CACHE.get(key)
            if pack is None:
                pack = ray.get(pack_ref)
                _LUT_CACHE.clear()
                _LUT_CACHE[key] = pack
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            if pack[0] == "bits":
                _, ids_s, bits_c, dn_c = pack
                a_idx = np.searchsorted(ids_s, a_ids)
                b_idx = np.searchsorted(ids_s, b_ids)
                inter, uni = G.intersect_bitsets(bits_c, dn_c, a_idx, b_idx)
            else:
                _, ids_s, gram_c, starts_c, dn_c = pack
                a_idx = np.searchsorted(ids_s, a_ids)
                b_idx = np.searchsorted(ids_s, b_ids)
                inter, uni = G.intersect_packed(
                    gram_c, starts_c, dn_c, a_idx, b_idx, n
                )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": pa.array(a_ids), "b": pa.array(b_ids),
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = pairs.map_batches(verify_batch, batch_format="pyarrow",
                                   batch_size=16384)
    else:
        joined = pairs.join(
            texts, join_type="inner", num_partitions=16,
            on=("a",), right_on=("doc_id",), right_suffix="_a",
        ).join(
            texts, join_type="inner", num_partitions=16,
            on=("b",), right_on=("doc_id",), right_suffix="_b",
        )

        def verify(t: pa.Table) -> pa.Table:
            ta_col = t["text"] if "text" in t.column_names else t["text_a"]
            if isinstance(ta_col, pa.ChunkedArray):
                ta_col = ta_col.combine_chunks()
            tb_col = t["text_b"].combine_chunks() if isinstance(
                t["text_b"], pa.ChunkedArray) else t["text_b"]
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.concatenate([a_ids, b_ids])
            uniq, first, inv = np.unique(ids, return_index=True,
                                         return_inverse=True)
            doc_texts = pa.concat_arrays([ta_col, tb_col]).take(pa.array(first))
            inter, uni = G.pair_jaccard_counts_indexed(
                doc_texts, inv[: len(a_ids)], inv[len(a_ids):], n
            )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": pa.array(a_ids), "b": pa.array(b_ids),
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = joined.map_batches(verify, batch_format="pyarrow",
                                    batch_size=8192)

    if as_dataset:
        return out_ds
    out = out_ds.to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _ngram_pairs_generic(sf_dir: str, num: int = 4, den: int = 5,
                         n: int = 5, as_dataset: bool = False):
    """EXACT char n-gram Jaccard near-dup pairs — generic PPJoin path for
    corpora the broadcast fast path can't serve (non-ASCII text or a gram
    vocabulary too large to broadcast): same semantics, with the df and
    prefix stages as hash-partitioned shuffles over string grams:

    1. (gram, doc_id, doc_n) rows over each doc's DISTINCT gram set.
    2. bucket by hash(gram): a gram's rows co-locate, so document frequency
       df is group-local — annotate rows with df (one shuffle, no extra
       aggregate + join round trip).
    3. bucket by doc_id: per-doc ascending (df, gram) order, keep only the
       first |A| − ⌈t·|A|⌉ + 1 grams (the PREFIX) with their position.  Any
       pair with J ≥ t provably shares a prefix gram, so pruning loses
       nothing; prefixes are rare-gram-biased, keeping step-4 fan-out small.
    4. bucket by hash(gram) again: vectorized candidate pairs from multi-doc
       prefix gram groups, pruned by the LENGTH filter (t·|B| ≤ |A|) and the
       POSITIONAL filter (overlap upper bound 1 + min(|A|−pa−1, |B|−pb−1)
       must reach α = ⌈t/(1+t)·(|A|+|B|)⌉ — a true pair passes at its FIRST
       shared prefix gram, so per-gram application is safe); then
       distributed pair dedup (same pair → same pair bucket).
    5. verify candidates against raw TEXT set ops (no gram hashing → no
       collision risk vs the SQL oracle); emit INTEGER intersection/union
       sizes and filter inter·den ≥ num·uni — grid-exact, no float rounding
       boundary (CLAUDE.md rule); prefix length and α via integer ceil.

    Scale notes: shuffled rows are (5-char gram, int64 doc_id) — ~text-sized
    in total; a stop-gram never generates pairs unless it survives into a
    prefix, and even then the positional filter kills pairs that share only
    late-prefix (common) grams.  Verification touches candidate docs only:
    their texts broadcast once when provably small, else two hash joins."""
    import ray

    from sievedata.sketches.hashing import hash64

    n_buckets = 128

    from sievedata.kernels import grams as G

    def gram_rows(t: pa.Table) -> pa.Table:
        txt_col = t["text"].combine_chunks()
        if G.is_ascii(txt_col):
            # vectorized: packed-uint64 windows + one np.unique per batch;
            # decoded back to the exact char grams so ASCII and non-ASCII
            # batches shuffle one consistent string column
            doc_idx, packed, doc_n = G.distinct_grams_packed(txt_col, n)
            ids_np = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            tbl = pa.table(
                {"gram": G.packed_to_strings(packed, n),
                 "doc_id": pa.array(ids_np[doc_idx], pa.int64()),
                 "doc_n": pa.array(doc_n[doc_idx], pa.int64())}
            )
        else:  # exact scalar fallback for non-ASCII batches
            ids = t["doc_id"].to_pylist()
            txts = txt_col.to_pylist()
            out_g: list[str] = []
            out_id: list[int] = []
            out_n: list[int] = []
            for d, tx in zip(ids, txts):
                if tx is None:  # SQL oracle: WHERE text IS NOT NULL
                    continue
                grams = {tx[i: i + n] for i in range(max(len(tx) - n + 1, 1))}
                out_g.extend(grams)
                out_id.extend([int(d)] * len(grams))
                out_n.extend([len(grams)] * len(grams))
            tbl = pa.table(
                {"gram": pa.array(out_g, pa.string()),
                 "doc_id": pa.array(out_id, pa.int64()),
                 "doc_n": pa.array(out_n, pa.int64())}
            )
        gb = (hash64(tbl["gram"].combine_chunks(), seed=37) % np.uint64(n_buckets)).astype(np.int64)
        return tbl.append_column("gbucket", pa.array(gb))

    def annotate_df(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["gram", "doc_id", "doc_n"]].copy()
        out["df"] = out.groupby("gram", sort=False)["doc_id"].transform("size")
        out["dbucket"] = out["doc_id"].to_numpy() % n_buckets
        return out

    def prefix_select(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "df", "gram"], kind="mergesort")
        rank = df.groupby("doc_id", sort=False).cumcount().to_numpy()
        nn = df["doc_n"].to_numpy()
        # L = |A| − ⌈t·|A|⌉ + 1, integer ceil (t = num/den — no float ⌈⌉)
        L = nn - (num * nn + den - 1) // den + 1
        keep = rank < L
        out = df.loc[keep, ["gram", "doc_id", "doc_n"]].copy()
        out["pos"] = rank[keep]
        return out

    def regram_bucket(t: pa.Table) -> pa.Table:
        gb = (hash64(t["gram"].combine_chunks(), seed=37) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("gbucket2", pa.array(gb))

    pairs = (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(gram_rows, batch_format="pyarrow")
        .groupby("gbucket")
        .map_groups(annotate_df, batch_format="pandas")
        .groupby("dbucket")
        .map_groups(prefix_select, batch_format="pandas")
        .map_batches(regram_bucket, batch_format="pyarrow")
        .groupby("gbucket2")
        .map_groups(functools.partial(_ppjoin_pairs_bucket, num=num, den=den),
                    batch_format="pandas")
        .map_batches(functools.partial(_ppjoin_pair_bucket_col,
                                       n_buckets=n_buckets),
                     batch_format="pyarrow")
        .groupby("pair_bucket")
        .map_groups(_ppjoin_dedup_group, batch_format="pandas")
        .materialize()  # candidate pairs only (output-sized)
    )

    empty = pd.DataFrame({c: pd.Series(dtype="int64")
                          for c in ("a", "b", "inter", "uni")})
    n_pairs = pairs.count()
    if n_pairs == 0:
        if as_dataset:
            import ray.data as rd
            return rd.from_pandas(empty)
        return empty

    texts = _rp(sf_dir, "documents", ["doc_id", "text"])
    wanted = None
    if n_pairs <= 200_000:
        pdf_ids = pairs.to_pandas()  # output-sized (counted small above)
        wanted = set(pdf_ids["a"]) | set(pdf_ids["b"])
    if wanted is not None and len(wanted) <= 50_000:
        # candidate texts are provably small (≤50k docs × ~KB): broadcast
        # the id→text dict ONCE (ray.put; cached per worker, not re-shipped
        # per batch) and verify pairs in parallel map_batches — the
        # verification itself stays distributed, only the small side moves
        wanted_ref = ray.put(wanted)

        def keep_wanted(t: pa.Table) -> pa.Table:
            w = ray.get(wanted_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keep = np.isin(ids, np.fromiter(w, dtype=np.int64, count=len(w)))
            return t.filter(pa.array(keep))

        tdf = texts.map_batches(keep_wanted, batch_format="pyarrow").to_pandas()
        lut_ref = ray.put(dict(zip(tdf["doc_id"].astype(int), tdf["text"])))

        def verify_batch(t: pa.Table) -> pa.Table:
            key = lut_ref.hex()
            lut = _LUT_CACHE.get(key)
            if lut is None:
                lut = ray.get(lut_ref)
                _LUT_CACHE.clear()
                _LUT_CACHE[key] = lut
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.concatenate([a_ids, b_ids])
            uniq, inv = np.unique(ids, return_inverse=True)
            doc_texts = pa.array([lut[int(d)] for d in uniq], pa.string())
            inter, uni = G.pair_jaccard_counts_indexed(
                doc_texts, inv[: len(a_ids)], inv[len(a_ids):], n
            )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": pa.array(a_ids), "b": pa.array(b_ids),
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = pairs.map_batches(verify_batch, batch_format="pyarrow",
                                   batch_size=8192)
    else:
        joined = pairs.join(
            texts, join_type="inner", num_partitions=16,
            on=("a",), right_on=("doc_id",), right_suffix="_a",
        ).join(
            texts, join_type="inner", num_partitions=16,
            on=("b",), right_on=("doc_id",), right_suffix="_b",
        )

        def verify(t: pa.Table) -> pa.Table:
            ta_col = t["text"] if "text" in t.column_names else t["text_a"]
            if isinstance(ta_col, pa.ChunkedArray):
                ta_col = ta_col.combine_chunks()
            tb_col = t["text_b"].combine_chunks() if isinstance(
                t["text_b"], pa.ChunkedArray) else t["text_b"]
            a_ids = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
            b_ids = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
            ids = np.concatenate([a_ids, b_ids])
            uniq, first, inv = np.unique(ids, return_index=True,
                                         return_inverse=True)
            texts_all = pa.concat_arrays([ta_col, tb_col])
            doc_texts = texts_all.take(pa.array(first))
            inter, uni = G.pair_jaccard_counts_indexed(
                doc_texts, inv[: len(a_ids)], inv[len(a_ids):], n
            )
            keep = inter * den >= num * uni
            return pa.table(
                {"a": t["a"], "b": t["b"],
                 "inter": pa.array(inter), "uni": pa.array(uni)}
            ).filter(pa.array(keep))

        out_ds = joined.map_batches(verify, batch_format="pyarrow",
                                    batch_size=8192)

    if as_dataset:
        return out_ds
    out = out_ds.to_pandas()
    if out.empty:
        return empty
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def _ngram_pairs_dataset(sf_dir: str, num: int = 4, den: int = 5, n: int = 5):
    """Near-dup pairs as a DATASET (for composition into bigger pipelines
    like dedup clustering, where pulling the edge list to the driver would
    be the round-1 scale sin): same routing as q_ngram_jaccard_pairs."""
    if n <= 5 and _probably_ascii_corpus(sf_dir):
        res = _ngram_pairs_ascii_fast(sf_dir, num, den, n, as_dataset=True)
        if res is not None:
            return res
    return _ngram_pairs_generic(sf_dir, num, den, n, as_dataset=True)


SQL_NGRAM_JACCARD_PAIRS = """
WITH e AS (
  SELECT doc_id, text,
         unnest(generate_series(1, greatest(length(text) - 4, 1))) AS i
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, list(DISTINCT substr(text, i::INT, 5)) AS grams
  FROM e GROUP BY doc_id
)
SELECT a, b, inter, na + nb - inter AS uni FROM (
  SELECT a.doc_id AS a, b.doc_id AS b,
         len(list_intersect(a.grams, b.grams)) AS inter,
         len(a.grams) AS na, len(b.grams) AS nb
  FROM g a JOIN g b ON a.doc_id < b.doc_id
)
WHERE inter * 5 >= 4 * (na + nb - inter)
ORDER BY a, b
"""


def q_media_features(sf_dir: str):
    """Multimodal image pipeline with REAL decode: deterministic BMP and
    PNG payloads (seeded per doc; even ids → BMP, odd → PNG with a mixed
    per-row filter set) → actor-pool decode → 16-dim image features (dims,
    channel stats, luminance histogram).  Both codecs are pure numpy +
    stdlib zlib (functions/codecs.py); JPEG/MP4 stay stubbed."""
    from sievedata.functions.media import (MediaFeatureExtractor, synth_bmp,
                                           synth_png)

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
                "kind": pa.array(["image"] * t.num_rows, pa.string()),
                "payload": pa.array(
                    [synth_bmp(int(d)) if int(d) % 2 == 0
                     else synth_png(int(d)) for d in ids],
                    pa.binary()),
            }
        )

    return (
        _rp(sf_dir, "documents", ["doc_id"])
        .map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            MediaFeatureExtractor,
            batch_format="pyarrow",
            batch_size=256,  # small batches: media payloads are wide rows
            concurrency=(1, 4),
            fn_constructor_kwargs={"fake": False},
        )
    )


def q_media_audio(sf_dir: str):
    """Multimodal audio pipeline with REAL decode: deterministic PCM-16
    WAV payloads (seeded two-tone per doc) → actor-pool decode → 16-dim
    audio features (duration, rms, zero-crossings, rFFT band energies)."""
    from sievedata.functions.media import MediaFeatureExtractor, synth_wav

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
                "kind": pa.array(["audio"] * t.num_rows, pa.string()),
                "payload": pa.array([synth_wav(int(d)) for d in ids],
                                    pa.binary()),
            }
        )

    return (
        _rp(sf_dir, "documents", ["doc_id"])
        .map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            MediaFeatureExtractor,
            batch_format="pyarrow",
            batch_size=256,
            concurrency=(1, 4),
            fn_constructor_kwargs={"fake": False},
        )
    )


def q_media_resize(sf_dir: str):
    """Multimodal resize with REAL codec work: deterministic BMP/PNG
    payloads (even/odd doc ids) → actor-pool decode → nearest-neighbor
    resize → re-encode in the SAME container format (pure numpy + stdlib
    zlib, functions/codecs.py).  Returns id, kind, dims and thumbnail size
    — not the raw bytes — so the driver's rows check stays cheap."""
    from sievedata.functions.media import MediaResizer, synth_bmp, synth_png

    def to_media(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
            "kind": pa.array(["image"] * t.num_rows, pa.string()),
            "payload": pa.array(
                [synth_bmp(int(d)) if int(d) % 2 == 0 else synth_png(int(d))
                 for d in ids],
                pa.binary()),
        })

    def summarize(t: pa.Table) -> pa.Table:
        return pa.table({
            "media_id": t["media_id"],
            "kind": t["kind"],
            "width": t["width"],
            "height": t["height"],
            "thumb_bytes": pc.binary_length(t["payload"]),
        })

    return (
        _rp(sf_dir, "documents", ["doc_id"])
        .map_batches(to_media, batch_format="pyarrow")
        .map_batches(
            MediaResizer,
            batch_format="pyarrow",
            batch_size=256,  # small batches: media payloads are wide rows
            concurrency=(1, 4),
            fn_constructor_kwargs={"width": 64, "height": 64, "fake": False},
        )
        .map_batches(summarize, batch_format="pyarrow")
    )


def q_frame_sample(sf_dir: str, n_frames: int = 4):
    """Multimodal frame sampling: video rows → actor-pool 1→N frame explode
    (inside map_batches, bounded blocks) → per-frame feature rows.  Duration
    is synthesized deterministically from the payload length so the fake
    decode is stable across runs."""
    from sievedata.functions.media import FrameSampler

    def to_video(t: pa.Table) -> pa.Table:
        text = t["text"].combine_chunks()
        dur = pc.cast(pc.multiply(pc.utf8_length(text), pa.scalar(40)), pa.int32())
        return pa.table({
            "media_id": pc.cast(t["doc_id"].combine_chunks(), pa.string()),
            "payload": pc.cast(text, pa.binary()),
            "duration_ms": dur,
        })

    return (
        _rp(sf_dir, "documents", ["doc_id", "text"])
        .map_batches(to_video, batch_format="pyarrow")
        .map_batches(
            FrameSampler,
            batch_format="pyarrow",
            batch_size=128,  # explode multiplies rows n_frames×
            concurrency=(1, 4),
            fn_constructor_kwargs={"n_frames": n_frames, "fake": True},
        )
    )


def q_embedding_norms(sf_dir: str):
    """L2 norms per embedding (vectorized numpy over Arrow lists)."""

    def norms(t: pa.Table) -> pa.Table:
        emb = t["embedding"].combine_chunks()
        # offsets are ABSOLUTE into the values buffer (a sliced ListArray
        # keeps the parent's buffer) — rebase them before segment sums.
        # reduceat (sequential left-to-right per segment) keeps float-op
        # association identical to the oracle's list_sum; a cumsum
        # difference would re-associate and drift ~1e-10 near rounding
        # boundaries.  Empty lists (incl. a trailing one, which would push
        # a reduceat index past the end) are masked to 0 explicitly.
        offs = np.asarray(emb.offsets)
        rel = (offs - offs[0]).astype(np.int64)
        vals = np.asarray(
            emb.values.to_numpy(zero_copy_only=False), dtype=np.float64
        )[offs[0]:offs[-1]]
        sq_all = vals * vals
        starts, lens = rel[:-1], rel[1:] - rel[:-1]
        nonempty = lens > 0
        sq = np.zeros(len(starts))
        if sq_all.size and nonempty.any():
            # empty segments are excluded from the index list (a trailing
            # empty would be an out-of-range index; a middle empty would
            # shorten its predecessor's segment) — non-empty starts tile
            # the values buffer contiguously, so reduceat over just them
            # is exact
            sq[nonempty] = np.add.reduceat(sq_all, starts[nonempty])
        return pa.table(
            {"vec_id": t["vec_id"], "l2_norm": pa.array(np.round(np.sqrt(sq), 4))}
        )

    return _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        norms, batch_format="pyarrow"
    )


SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       round(sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x))), 4) AS l2_norm
FROM embeddings
"""


def q_text_blob(sf_dir: str):
    """M5 text_blob kernel (app/normalization.py:52-63) as a driver-facing
    gate: lowercased skip-empty concat of vendor_name + po + terms +
    per-line sku+desc over synthetic docs built from orders rows (po is
    NULL for every 3rd key, exercising the skip-empty branch)."""
    from sievedata.kernels.normalize import text_blob

    def blob(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        custs = t["o_custkey"].to_numpy(zero_copy_only=False)
        stats = t["o_orderstatus"].to_pylist()
        prios = t["o_orderpriority"].to_pylist()
        out = [
            text_blob(
                {
                    "vendor_name": f"Vendor-{s}",
                    "po_number": None if int(k) % 3 == 0 else f"PO-{int(k)}",
                    "terms": p,
                    "line_items": [
                        {"sku": f"SKU-{int(k) % 100}", "desc": f"Item-{int(c)}"}
                    ],
                }
            )
            for k, c, s, p in zip(keys, custs, stats, prios)
        ]
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "blob": pa.array(out, pa.string())}
        )

    return _rp(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    ).map_batches(blob, batch_format="pyarrow")


SQL_TEXT_BLOB = """
SELECT o_orderkey,
       lower(concat_ws(' ', 'Vendor-' || o_orderstatus,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 'PO-' || o_orderkey END,
             o_orderpriority,
             'SKU-' || (o_orderkey % 100),
             'Item-' || o_custkey)) AS blob
FROM orders
"""


def q_systematic_sample(sf_dir: str, modulus: int = 20, residue: int = 7):
    """Deterministic systematic sampling (K4's reproducible-sampling family):
    key-modulo selection, stable across engines."""

    def pick(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((keys % modulus) == residue)).select(
            ["o_orderkey", "o_totalprice"]
        )

    return _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        pick, batch_format="pyarrow"
    )


SQL_SYSTEMATIC_SAMPLE = """
SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 20 = 7
"""


def q_row_fingerprint(sf_dir: str):
    """Canonical row content hash (M6 payload-hash family): sha256 over a
    stable field concatenation — the idempotency/dedup key of the reference's
    invoice_payload_hash (app/normalization.py:66-70)."""
    import hashlib

    def fp(t: pa.Table) -> pa.Table:
        keys = t["o_orderkey"].to_numpy(zero_copy_only=False)
        cust = t["o_custkey"].to_numpy(zero_copy_only=False)
        tot = t["o_totalprice"].to_numpy(zero_copy_only=False)
        digests = [
            hashlib.sha256(f"{int(k)}|{int(c)}|{x:.2f}".encode()).hexdigest()
            for k, c, x in zip(keys, cust, tot)
        ]
        return pa.table(
            {"o_orderkey": t["o_orderkey"], "row_hash": pa.array(digests, pa.string())}
        )

    return _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"]).map_batches(
        fp, batch_format="pyarrow"
    )


SQL_ROW_FINGERPRINT = """
SELECT o_orderkey,
       lower(sha256(o_orderkey || '|' || o_custkey || '|' || printf('%.2f', o_totalprice))) AS row_hash
FROM orders
"""


def q_dedup_survivors(sf_dir: str):
    """Exact-dedup SURVIVOR set (hash-partition + per-group first): the kept
    row per (custkey, status) group — the materialized complement of
    ``dup_orders``'s flagged rows."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        st = t["o_orderstatus"].to_numpy(zero_copy_only=False)
        s_codes = np.array([ord(x[0]) if x else 0 for x in st], dtype=np.int64)
        return t.append_column("bucket", pa.array((k * 31 + s_codes) % n_buckets))

    def first_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderstatus", "o_orderkey"], kind="mergesort")
        out = df.groupby(["o_custkey", "o_orderstatus"], sort=False).head(1)
        return out[["o_custkey", "o_orderstatus", "o_orderkey"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_orderkey"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(first_bucket, batch_format="pandas")
        .select_columns(["o_custkey", "o_orderstatus", "o_orderkey"])
    )


SQL_DEDUP_SURVIVORS = """
SELECT o_custkey, o_orderstatus, o_orderkey FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey, o_orderstatus ORDER BY o_orderkey) = 1
"""


def q_median_price(sf_dir: str):
    """Exact per-group median (A3 family) via bucketized groupby — the
    quantile aggregate the reference computes per matched-pair diffs."""
    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % 64))

    def med_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # discrete median (lower middle element): an exact data value, so no
        # interpolated .005 midpoints that round differently across engines
        out = (
            df.groupby("l_partkey", sort=False)["l_extendedprice"]
            .quantile(0.5, interpolation="lower").rename("median_price").reset_index()
        )
        return out

    return (
        _rp(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(med_bucket, batch_format="pandas")
        .select_columns(["l_partkey", "median_price"])
    )


SQL_MEDIAN_PRICE = """
SELECT l_partkey, quantile_disc(l_extendedprice, 0.5) AS median_price
FROM lineitem GROUP BY l_partkey
"""


def q_knn_classify(sf_dir: str, k: int = 5, n_queries: int = 20):
    """k-NN label prediction: majority label among the top-k cosine
    neighbors (deterministic tiebreak: higher count, then smaller label).
    Built on the brute-force broadcast top-k."""
    import ray

    from sievedata.functions.ann import make_bruteforce_fn, merge_topk

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    queries_ref = ray.put((qids, qm))

    cands = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
        )
        .to_pandas()
    )
    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    top = merge_topk(cands, k=k)

    labels = _rp(sf_dir, "embeddings", ["vec_id", "label"]).to_pandas()
    top = top.merge(labels.rename(columns={"vec_id": "neighbor_id"}), on="neighbor_id")
    counts = (
        top.groupby(["query_id", "label"]).size().rename("votes").reset_index()
        .sort_values(["query_id", "votes", "label"], ascending=[True, False, True],
                     kind="mergesort")
    )
    out = counts.groupby("query_id", sort=True).head(1).reset_index(drop=True)
    return out[["query_id", "label", "votes"]].rename(columns={"label": "pred_label"})


SQL_KNN_CLASSIFY = """
WITH ranked AS (
  SELECT q.vec_id AS query_id, c.label,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 20 AND c.vec_id != q.vec_id
), votes AS (
  SELECT query_id, label, count(*) AS votes FROM ranked WHERE rank <= 5
  GROUP BY query_id, label
)
SELECT query_id, label AS pred_label, votes FROM votes
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY votes DESC, label) = 1
"""


def q_line_sum_check(sf_dir: str, pct_tol: float = 0.5):
    """DQ-001-style line-sum reconciliation (requirements.md:243-245): flag
    orders whose lineitem revenue sum deviates from o_totalprice by more
    than ``pct_tol`` (fractional).

    Hash-bucketed COGROUP (the engine's shuffle idiom — one sort shuffle of
    skinny (bucket, key, value, side) rows, per-bucket pandas sum+merge):
    per-orderkey sums are O(orders), so no driver dict / broadcast ever
    exists, and it avoids the native hash-aggregate + hash-join operator
    pair (~2× slower at this cardinality, measured)."""
    n_buckets = 64

    def li_rows(t: pa.Table) -> pa.Table:
        k = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(k % n_buckets), "key": pa.array(k),
             "val": t["l_extendedprice"],
             "side": pa.array(np.zeros(len(k), dtype=np.int8))}
        )

    def o_rows(t: pa.Table) -> pa.Table:
        k = t["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"bucket": pa.array(k % n_buckets), "key": pa.array(k),
             "val": t["o_totalprice"],
             "side": pa.array(np.ones(len(k), dtype=np.int8))}
        )

    def check_bucket(df: pd.DataFrame) -> pd.DataFrame:
        li = df[df["side"] == 0]
        orders = df[df["side"] == 1]
        sums = li.groupby("key", sort=False)["val"].sum()
        lsum = orders["key"].map(sums).fillna(0.0).to_numpy()
        totals = orders["val"].to_numpy()
        dev = np.abs(lsum - totals) / np.maximum(np.abs(totals), 1.0)
        keep = dev > pct_tol
        return pd.DataFrame(
            {"o_orderkey": orders["key"].to_numpy()[keep],
             "o_totalprice": totals[keep],
             "line_sum": np.round(lsum[keep], 2)}
        )

    li = _rp(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"]).map_batches(
        li_rows, batch_format="pyarrow"
    )
    orders = _rp(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        o_rows, batch_format="pyarrow"
    )
    return (
        li.union(orders)
        .groupby("bucket")
        .map_groups(check_bucket, batch_format="pandas")
        .select_columns(["o_orderkey", "o_totalprice", "line_sum"])
    )


SQL_LINE_SUM_CHECK = """
WITH s AS (SELECT l_orderkey, sum(l_extendedprice) AS line_sum FROM lineitem GROUP BY l_orderkey)
SELECT o_orderkey, o_totalprice, round(coalesce(line_sum, 0), 2) AS line_sum
FROM orders LEFT JOIN s ON o_orderkey = l_orderkey
WHERE abs(coalesce(line_sum, 0) - o_totalprice) / greatest(abs(o_totalprice), 1.0) > 0.5
"""


def q_running_total(sf_dir: str):
    """Per-customer running order total (ordered cumulative window) — the
    streaming-shaped cumulative idiom: bucket shuffle → within-group sorted
    cumsum, vectorized per bucket."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        k = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(k % n_buckets))

    def running(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort")
        df["running_total"] = df.groupby("o_custkey", sort=False)["o_totalprice"].cumsum().round(2)
        return df[["o_custkey", "o_orderkey", "running_total"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(running, batch_format="pandas")
        .select_columns(["o_custkey", "o_orderkey", "running_total"])
    )


SQL_RUNNING_TOTAL = """
SELECT o_custkey, o_orderkey,
       round(sum(o_totalprice) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING), 2) AS running_total
FROM orders
"""


def q_sliding_window(sf_dir: str, frame: int = 3):
    """Per-user BOUNDED sliding-frame aggregate (ROWS BETWEEN 2 PRECEDING
    AND CURRENT ROW) — the windowed-aggregate companion to
    q_running_total's unbounded cumsum: bucket shuffle on user hash →
    within-bucket (user, ts, event_id) sort → grouped rolling max.  Max is
    comparison-only (no float accumulation), so the value hash cannot hit a
    rounding boundary regardless of frame arithmetic order."""
    n_buckets = 64

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("bucket", pa.array(u % n_buckets))

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df["sliding_max"] = (
            df.groupby("user_id", sort=False)["value"]
            .rolling(frame, min_periods=1).max()
            .to_numpy()
        )
        return df[["user_id", "event_id", "sliding_max"]].reset_index(drop=True)

    return (
        _rp(sf_dir, "events", ["user_id", "event_id", "ts", "value"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(win, batch_format="pandas")
        .select_columns(["user_id", "event_id", "sliding_max"])
    )


SQL_SLIDING_WINDOW = """
SELECT user_id, event_id,
       max(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS sliding_max
FROM events
"""


def q_asof_join(sf_dir: str):
    """As-of join (custom operator — Ray Data has no native ASOF): for each
    event, the latest order of the same customer at-or-before the event
    time.  Both sides hash-bucket on the join key and ONE cogroup per
    bucket runs a vectorized ``pandas.merge_asof`` — the right side sorted
    by (o_orderdate, o_orderkey) so order-date ties resolve to the max
    orderkey, matching the oracle's row_number tiebreak.  Partitioning
    assumption (documented per north_rule): one key's events+orders
    co-locate in a bucket — the same per-key locality every keyed window
    op in this repo relies on; buckets are hash-spread so no key ordering
    is required across groups."""
    n_buckets = 64

    def ev_rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"event_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"],
             "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
             "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
             "bucket": pa.array(u % n_buckets)}
        )

    def od_rows(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"event_id": pa.nulls(t.num_rows, pa.int64()),
             "user_id": t["o_custkey"],
             "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
             "o_orderkey": t["o_orderkey"], "o_orderdate": t["o_orderdate"],
             "bucket": pa.array(c % n_buckets)}
        )

    _empty = pd.DataFrame({c: pd.Series(dtype="int64")
                           for c in ("event_id", "user_id", "last_orderkey")})

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        ev = df[df["event_id"].notna()]
        od = df[df["event_id"].isna()]
        if not len(ev) or not len(od):
            return _empty
        ev = ev[["event_id", "user_id", "ts"]].sort_values("ts", kind="mergesort")
        od = od[["user_id", "o_orderkey", "o_orderdate"]].sort_values(
            ["o_orderdate", "o_orderkey"], kind="mergesort"
        )
        m = pd.merge_asof(ev, od, left_on="ts", right_on="o_orderdate",
                          by="user_id", direction="backward")
        m = m.dropna(subset=["o_orderkey"])
        if not len(m):
            return _empty
        return pd.DataFrame(
            {"event_id": m["event_id"].astype("int64"),
             "user_id": m["user_id"].astype("int64"),
             "last_orderkey": m["o_orderkey"].astype("int64")}
        )

    ev = _rp(sf_dir, "events", ["event_id", "user_id", "ts"]).map_batches(
        ev_rows, batch_format="pyarrow"
    )
    od = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        od_rows, batch_format="pyarrow"
    )
    return (
        ev.union(od)
        .groupby("bucket")
        .map_groups(asof, batch_format="pandas")
        .select_columns(["event_id", "user_id", "last_orderkey"])
    )


SQL_ASOF_JOIN = """
SELECT event_id, user_id, o_orderkey AS last_orderkey FROM (
  SELECT e.event_id, e.user_id, o.o_orderkey,
         row_number() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
) WHERE rn = 1
"""


def q_range_join(sf_dir: str, days: int = 7):
    """Range (interval) join — custom operator, Ray Data has no native one:
    per order, count + sum of the customer's events with
    ``o_orderdate <= ts < o_orderdate + days``.

    Both sides hash-bucket on the equi-key (customer); ONE cogroup per
    bucket reduces the interval predicate to two vectorized
    ``pandas.merge_asof`` probes against per-user cumulative event stats
    (count, integer-cents sum): events in [start, end) = cum(<end) −
    cum(<start).  Integer cents make the cumsum-difference exact — a float
    cumsum difference would re-associate the sum and drift off the
    oracle's grid (CLAUDE.md exactness rule).  Partitioning assumption
    (documented per north_rule): one key's orders+events co-locate in a
    bucket; buckets are hash-spread, no cross-group ordering needed —
    shuffle volume is O(|orders| + |events|), never the O(n·m) join
    fan-out of the naive interval join."""
    n_buckets = 64
    span = np.timedelta64(days, "D")

    def ev_rows(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.round(
            t["value"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        return pa.table(
            {"user_id": t["user_id"], "ts": t["ts"],
             "cents": pa.array(cents),
             "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
             "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
             "bucket": pa.array(u % n_buckets)}
        )

    def od_rows(t: pa.Table) -> pa.Table:
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"user_id": t["o_custkey"],
             "ts": pa.nulls(t.num_rows, pa.timestamp("us")),
             "cents": pa.nulls(t.num_rows, pa.int64()),
             "o_orderkey": t["o_orderkey"], "o_orderdate": t["o_orderdate"],
             "bucket": pa.array(c % n_buckets)}
        )

    _empty = pd.DataFrame(
        {"o_orderkey": pd.Series(dtype="int64"),
         "n_events": pd.Series(dtype="int64"),
         "sum_value_cents": pd.Series(dtype="int64")}
    )

    def rjoin(df: pd.DataFrame) -> pd.DataFrame:
        od = df[df["o_orderkey"].notna()]
        if not len(od):
            return _empty
        od = od[["o_orderkey", "user_id", "o_orderdate"]].sort_values(
            "o_orderdate", kind="mergesort"
        )
        ev = df[df["o_orderkey"].isna()]
        if not len(ev):
            return pd.DataFrame(
                {"o_orderkey": od["o_orderkey"].astype("int64").to_numpy(),
                 "n_events": np.zeros(len(od), dtype=np.int64),
                 "sum_value_cents": np.zeros(len(od), dtype=np.int64)}
            )
        # merge_asof needs the right side GLOBALLY sorted on the on-key;
        # per-user cumulatives only need ts order within each user, which
        # a global stable ts sort also guarantees
        ev = ev[["user_id", "ts", "cents"]].sort_values("ts", kind="mergesort")
        g = ev.groupby("user_id", sort=False)
        ev["cum_n"] = (g.cumcount() + 1).astype("int64")
        ev["cum_c"] = g["cents"].cumsum().astype("int64")
        cum = ev[["user_id", "ts", "cum_n", "cum_c"]]
        # strictly-before probes: events in [start, end) = cum(ts < end)
        # − cum(ts < start).  end = start + span is monotone in start, so
        # one o_orderdate sort serves both probes and rows stay aligned.
        lo = pd.merge_asof(
            od, cum, left_on="o_orderdate", right_on="ts", by="user_id",
            direction="backward", allow_exact_matches=False,
        )
        hi = pd.merge_asof(
            od.assign(end=od["o_orderdate"] + span), cum,
            left_on="end", right_on="ts", by="user_id",
            direction="backward", allow_exact_matches=False,
        )
        n = (hi["cum_n"].fillna(0) - lo["cum_n"].fillna(0)).astype("int64")
        c = (hi["cum_c"].fillna(0) - lo["cum_c"].fillna(0)).astype("int64")
        return pd.DataFrame(
            {"o_orderkey": od["o_orderkey"].astype("int64").to_numpy(),
             "n_events": n.to_numpy(), "sum_value_cents": c.to_numpy()}
        )

    ev = _rp(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
        ev_rows, batch_format="pyarrow"
    )
    od = _rp(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        od_rows, batch_format="pyarrow"
    )
    return (
        ev.union(od)
        .groupby("bucket")
        .map_groups(rjoin, batch_format="pandas")
        .select_columns(["o_orderkey", "n_events", "sum_value_cents"])
    )


SQL_RANGE_JOIN = """
SELECT o.o_orderkey,
       count(e.user_id) AS n_events,
       CAST(coalesce(sum(CAST(round(e.value * 100) AS BIGINT)), 0) AS BIGINT)
         AS sum_value_cents
FROM orders o LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts < o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
"""


def q_ann_ivf_topk(sf_dir: str, k: int = 5, n_queries: int = 5,
                   n_centroids: int = 16, n_probe: int = 4):
    """IVF top-k with GUARANTEED-EXACT probing (the scale path, now
    driver-hash-checkable): k-means coarse quantizer fit on a driver-side
    sample, corpus assigned to centroids in map_batches, queries probe
    their top-``n_probe`` clusters first — then the angular triangle
    inequality closes the loop: a point x in cluster c satisfies
    angle(q,x) ≥ angle(q,μ_c) − r_c (r_c = cluster max radius, distributed
    max), so any unprobed cluster whose similarity UPPER BOUND
    cos(max(0, θ_qc − r_c)) still beats the current k-th candidate is
    probed in a follow-up filtered pass.  Pruning only skips provably-empty
    clusters → the result is the EXACT top-k, oracle-checked against the
    same brute-force SQL as ``ann_topk``; the IVF machinery is verified by
    that exactness.  Shuffle-free: only (queries × k) candidate rows per
    block leave the workers; each pass streams the probed clusters only."""
    import ray

    from sievedata.functions.ann import (
        _normalize, embedding_matrix, kmeans_fit, make_bruteforce_fn,
        make_ivf_assign_fn, merge_topk,
    )

    sample = (
        _rp(sf_dir, "embeddings", ["embedding"]).limit(10000).to_pandas()
    )
    if len(sample) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "neighbor_id": pd.Series([], dtype="int64"),
                             "rank": pd.Series([], dtype="int64")})
    sm = np.vstack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    cent = _normalize(kmeans_fit(sm, k=n_centroids))
    cent_ref = ray.put(cent)

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    queries_ref = ray.put((qids, qm))

    assigned = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(make_ivf_assign_fn(cent_ref), batch_format="pyarrow")
        .materialize()  # probed passes below re-filter it without re-reading
    )

    # per-cluster max angular radius — per-batch partials (≤ n_centroids
    # rows each), tiny driver combine
    def radius_partials(t: pa.Table) -> pa.Table:
        emb = embedding_matrix(t["embedding"])
        if emb.size == 0:
            return pa.table({"cluster": pa.array([], pa.int64()),
                             "radius": pa.array([], pa.float64())})
        emb = _normalize(emb)
        cl = t["cluster"].to_numpy(zero_copy_only=False).astype(np.int64)
        sims = np.einsum("ij,ij->i", emb, cent[cl])
        ang = np.arccos(np.clip(sims, -1.0, 1.0))
        uniq, inv = np.unique(cl, return_inverse=True)
        rmax = np.zeros(len(uniq))
        np.maximum.at(rmax, inv, ang)
        return pa.table({"cluster": pa.array(uniq, pa.int64()),
                         "radius": pa.array(rmax, pa.float64())})

    rad = (
        assigned.map_batches(radius_partials, batch_format="pyarrow")
        .to_pandas()  # ≤ n_centroids × n_blocks rows
        .groupby("cluster")["radius"].max()
    )
    live = rad.index.to_numpy()  # clusters that actually hold points
    radius = rad.to_numpy()

    # similarity upper bound per (query, live cluster), with float slack so
    # pruning is strictly conservative
    eps = 1e-9
    qn = _normalize(qm)
    theta = np.arccos(np.clip(qn @ cent[live].T, -1.0, 1.0))
    ub = np.cos(np.maximum(0.0, theta - radius[None, :] - eps)) + eps

    def probe_pass(clusters: set) -> pd.DataFrame:
        keep = np.array(sorted(clusters), dtype=np.int64)

        def in_probed(t: pa.Table) -> pa.Table:
            cl = t["cluster"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(np.isin(cl, keep)))

        return (
            assigned.map_batches(in_probed, batch_format="pyarrow")
            .map_batches(
                make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
            )
            .to_pandas()
        )

    order = np.argsort(-ub, axis=1)
    probed = {int(live[c]) for qi in range(len(qids))
              for c in order[qi, : min(n_probe, len(live))]}
    cands = probe_pass(probed)

    for _ in range(len(live)):  # ≤ one expansion per remaining cluster set
        cur = cands[cands["query_id"] != cands["neighbor_id"]]
        cur = cur.drop_duplicates(["query_id", "neighbor_id"])
        top = (cur.sort_values(["query_id", "sim"], ascending=[True, False],
                               kind="mergesort")
               .groupby("query_id").head(k).groupby("query_id")["sim"])
        kmin, kcnt = top.min(), top.count()
        kth = kmin.where(kcnt >= k, -np.inf)  # < k candidates → keep probing
        need: set = set()
        for qi, qid in enumerate(qids):
            skq = kth.get(int(qid), -np.inf)
            for ci, c in enumerate(live):
                if int(c) not in probed and ub[qi, ci] > skq - eps:
                    need.add(int(c))
        if not need:
            break
        probed |= need
        cands = pd.concat([cands, probe_pass(need)], ignore_index=True)

    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    cands = cands.drop_duplicates(["query_id", "neighbor_id"])
    out = merge_topk(cands, k=k)
    return out[["query_id", "neighbor_id", "rank"]]


SQL_ANN_IVF_TOPK = SQL_ANN_TOPK  # exact by construction — same brute-force oracle


def q_ann_lsh_topk(sf_dir: str, k: int = 5, n_queries: int = 5,
                   n_bits: int = 6, hamming_probe: int = 2):
    """Hyperplane-LSH-bucketed ANN (the other scale path, vs IVF): random
    sign-bit signatures bucket the corpus in map_batches; each query multi-
    probes its own bucket plus all buckets within ``hamming_probe`` bit
    flips (flipping the lowest-margin hyperplanes first is the classic
    multi-probe refinement; flipping all is the deterministic superset).
    Corpus rows outside the probed bucket set are dropped BEFORE the matmul
    — per-bucket cost is N/2^bits on balanced data, and the bucket ids
    hash-partition across nodes with no driver-side corpus state.

    Driver-checkable despite being approximate: the planes are a fixed
    seeded constant, so the WHOLE algorithm (signatures → hamming-≤p probe
    set → candidate union → top-k among candidates) is reproduced verbatim
    in SQL with the planes as literals (``SQL_ANN_LSH_TOPK``); recall vs
    brute force is additionally asserted in tests/test_ann.py."""
    import ray

    from sievedata.functions.ann import (
        embedding_matrix, hyperplane_signatures, make_bruteforce_fn,
        make_planes, merge_topk, _normalize,
    )

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    planes = make_planes(qm.shape[1], n_bits=n_bits)
    qsig = hyperplane_signatures(_normalize(qm), planes)

    # multi-probe bucket set: each query signature ± up to hamming_probe flips
    probe = {int(s) for s in qsig}
    frontier = set(probe)
    for _ in range(hamming_probe):
        frontier = {s ^ (1 << b) for s in frontier for b in range(n_bits)}
        probe |= frontier
    probe_ref = ray.put(probe)
    planes_ref = ray.put(planes)
    queries_ref = ray.put((qids, qm))

    def in_probed(t: pa.Table) -> pa.Table:
        keep = ray.get(probe_ref)
        pl = ray.get(planes_ref)
        emb = embedding_matrix(t["embedding"])
        if emb.size == 0:
            return t
        sig = hyperplane_signatures(_normalize(emb), pl)
        mask = np.fromiter((int(s) in keep for s in sig), dtype=bool, count=len(sig))
        return t.filter(pa.array(mask))

    cands = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(in_probed, batch_format="pyarrow")
        .map_batches(
            make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
        )
        .to_pandas()
    )
    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    out = merge_topk(cands, k=k)
    return out[["query_id", "neighbor_id", "rank"]]


def _sql_ann_lsh_topk(dim: int = 64, n_bits: int = 6, hamming_probe: int = 2,
                      k: int = 5, n_queries: int = 5) -> str:
    """SQL mirror of q_ann_lsh_topk: the seeded hyperplanes are embedded as
    DOUBLE literals (repr round-trips exactly), signatures are sign bits of
    raw dot products (normalization never flips a sign), the candidate set
    is the UNION over queries of hamming-≤p buckets (the engine filters the
    corpus against the whole probe set, then every query scores every
    survivor), and top-k ties break by neighbor_id like merge_topk."""
    from sievedata.functions.ann import make_planes

    planes = make_planes(dim, n_bits=n_bits)
    rows = ",\n         ".join(
        "({}, [{}]::DOUBLE[])".format(
            b, ", ".join(repr(float(v)) for v in planes[b]))
        for b in range(n_bits)
    )
    return f"""
WITH planes(b, p) AS (VALUES {rows}),
sig AS (
  SELECT e.vec_id,
         CAST(sum(CASE WHEN list_dot_product(e.embedding, p.p) > 0
                       THEN 1 << p.b ELSE 0 END) AS BIGINT) AS sig
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
),
qsig AS (SELECT vec_id, sig FROM sig WHERE vec_id < {n_queries}),
cand AS (
  SELECT DISTINCT c.vec_id
  FROM sig c JOIN qsig q ON bit_count(xor(c.sig, q.sig)) <= {hamming_probe}
),
pairs AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(qe.embedding, ce.embedding) AS sim
  FROM qsig q
  JOIN embeddings qe ON qe.vec_id = q.vec_id
  CROSS JOIN cand c
  JOIN embeddings ce ON ce.vec_id = c.vec_id
  WHERE c.vec_id != q.vec_id
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (
           PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM pairs
) WHERE rank <= {k}
"""


SQL_ANN_LSH_TOPK = _sql_ann_lsh_topk()


def q_embedding_near_dups(sf_dir: str, threshold: float = 0.45, n_clusters: int = 16):
    """Embedding-cosine near-duplicate pairs ≥ threshold — EXACT, via a
    cluster-pruned distributed pair join (no full corpus matrix on the
    driver, no all-pairs broadcast):

    1. k-means coarse clusters (driver fits on a bounded sample; assignment
       is map_batches) + per-cluster max angular radius (distributed Max).
    2. angular triangle inequality prunes cluster PAIRS: members of C_i and
       C_j can only reach angle(x,y) ≥ angle(c_i,c_j) − r_i − r_j, so any
       cluster pair with that bound above arccos(threshold) is skipped
       entirely.  Exact — pruning only removes provably-empty pairs.
    3. each vector is replicated to its cluster's surviving pair groups
       (shuffle volume = N × avg partners, ≤ N×k, ≪ N²); one vectorized
       matmul per (c_i, c_j) group emits qualifying (a < b) pairs.

    Unlike LSH candidate generation this cannot miss a pair: at low
    thresholds (0.45 ≈ 63°) hyperplane-LSH recall is probabilistic, which
    would flake the driver's exact hash gate.  On clustered real data the
    radius bound prunes most groups; on uniform random data it degrades to
    a distributed block-pair brute force — the honest exact baseline."""
    import ray
    from ray.data.aggregate import Max

    from sievedata.functions.ann import (
        _normalize, embedding_matrix, kmeans_fit, make_ivf_assign_fn,
    )

    sample = _rp(sf_dir, "embeddings", ["embedding"]).limit(10000).to_pandas()
    sm = np.vstack([np.asarray(v, dtype=np.float64) for v in sample["embedding"]])
    cent = _normalize(kmeans_fit(sm, k=n_clusters))
    cent_ref = ray.put(cent)

    # plain task fn + worker-cached centroids: this lineage executes twice
    # (radii pass, explode pass) and actor-pool spin-up would double-pay
    assigned = _rp(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        make_ivf_assign_fn(cent_ref), batch_format="pyarrow"
    )

    def angle_partial(t: pa.Table) -> pa.Table:
        emb = _normalize(embedding_matrix(t["embedding"]))
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        cos_to_cent = np.einsum("ij,ij->i", emb, cent[cl])
        ang = np.arccos(np.clip(cos_to_cent, -1.0, 1.0))
        df = pd.DataFrame({"cluster": cl, "ang": ang})
        g = df.groupby("cluster", sort=False)["ang"].max().reset_index()
        return pa.table({"cluster": pa.array(g["cluster"].to_numpy()),
                         "ang": pa.array(g["ang"].to_numpy())})

    radii_df = (
        assigned.map_batches(angle_partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Max("ang", alias_name="radius"))
        .to_pandas()  # O(n_clusters) rows
    )
    radius = np.zeros(len(cent))
    radius[radii_df["cluster"].to_numpy()] = radii_df["radius"].to_numpy()

    theta_t = float(np.arccos(np.clip(threshold, -1.0, 1.0)))
    cang = np.arccos(np.clip(cent @ cent.T, -1.0, 1.0))
    k = len(cent)
    partners: dict[int, list[int]] = {i: [] for i in range(k)}
    for i in range(k):
        for j in range(i, k):
            if cang[i, j] - radius[i] - radius[j] <= theta_t:
                pair_key = i * k + j
                partners[i].append(pair_key)
                if j != i:
                    partners[j].append(pair_key)
    partners_ref = ray.put(partners)

    def explode_to_groups(t: pa.Table) -> pa.Table:
        part = ray.get(partners_ref)
        cl = t["cluster"].to_numpy(zero_copy_only=False)
        reps = np.array([len(part[int(c)]) for c in cl])
        idx = np.repeat(np.arange(len(cl)), reps)
        group = np.concatenate([part[int(c)] for c in cl]) if len(cl) else np.array([], dtype=np.int64)
        out = t.select(["vec_id", "embedding", "cluster"]).take(pa.array(idx, pa.int64()))
        return out.append_column("pair_group", pa.array(group.astype(np.int64)))

    def pairs_in_group(df: pd.DataFrame) -> pd.DataFrame:
        gkey = int(df["pair_group"].iloc[0])
        ci, cj = gkey // k, gkey % k
        emb = _normalize(np.vstack([np.asarray(v, dtype=np.float64) for v in df["embedding"]]))
        ids = df["vec_id"].to_numpy()
        cl = df["cluster"].to_numpy()
        if ci == cj:
            sims = emb @ emb.T
            ai, bj = np.nonzero(np.triu(sims >= threshold, k=1))
            a_ids, b_ids = ids[ai], ids[bj]
        else:
            mi, mj = cl == ci, cl == cj
            if not mi.any() or not mj.any():
                return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64")})
            sims = emb[mi] @ emb[mj].T
            ai, bj = np.nonzero(sims >= threshold)
            a_ids, b_ids = ids[mi][ai], ids[mj][bj]
        lo = np.minimum(a_ids, b_ids)
        hi = np.maximum(a_ids, b_ids)
        return pd.DataFrame({"a": lo.astype(np.int64), "b": hi.astype(np.int64)})

    return (
        assigned.map_batches(explode_to_groups, batch_format="pyarrow")
        .groupby("pair_group")
        .map_groups(pairs_in_group, batch_format="pandas")
        .select_columns(["a", "b"])
    )


SQL_EMBEDDING_NEAR_DUPS = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.45
"""


def _flagship_fixture(n_docs: int, n_vendors: int) -> dict:
    """Cached span-document fixture + profiles for the flagship queries."""
    import os

    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles

    from sievedata.fixtures import FIXTURE_VERSION

    cache = f"/tmp/sievedata_flagship_v{FIXTURE_VERSION}_{n_docs}"
    marker = os.path.join(cache, "documents.parquet")
    if not os.path.exists(marker):
        generate_fixture(cache, n_docs=n_docs, n_vendors=n_vendors, seed=42)
    prof_marker = os.path.join(cache, "profiles", "profiles.parquet")
    if not os.path.exists(prof_marker):
        build_profiles(
            os.path.join(cache, "baseline.parquet"),
            os.path.join(cache, "media_catalog.parquet"),
            os.path.join(cache, "profiles"),
        )
    return {
        "documents": marker,
        "profiles": prof_marker,
        "bloom": os.path.join(cache, "profiles", "media_bloom.bin"),
        "cache": cache,
    }


def q_validate_flagship(sf_dir: str):
    """Flagship constraint validation over the span-documents fixture
    (BASELINE.json input shape); returns the violations table.  Rows-only:
    exact-match correctness vs the pure-python oracle is asserted by
    tests/test_e2e.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.validate import validate_documents

    fx = _flagship_fixture(2000, 20)
    res = validate_documents(
        fx["documents"], fx["profiles"], fx["bloom"],
        os.path.join(fx["cache"], "validate_q"), resume=False,
    )
    return (
        pq.read_table(res["violations"]).to_pandas()
        .sort_values(["partition_key", "doc_id", "reason_code"], kind="mergesort")
        .reset_index(drop=True)
    )


def _incremental_fixture() -> dict:
    """Cached doc_id-ordered 75/25 split of the flagship fixture (the
    append-only contract) + a completed BASE validate run over part 0."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    fx = _flagship_fixture(2000, 20)
    inc = os.path.join(fx["cache"], "inc")
    hist_dir = os.path.join(inc, "hist")
    grow_dir = os.path.join(inc, "grow")
    if not os.path.exists(os.path.join(grow_dir, "part_1.parquet")):
        os.makedirs(hist_dir, exist_ok=True)
        os.makedirs(grow_dir, exist_ok=True)
        t = pq.read_table(fx["documents"])
        df = t.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        cut = int(len(df) * 0.75)
        for name, frame in (("part_0.parquet", df.iloc[:cut]),
                            ("part_1.parquet", df.iloc[cut:])):
            tbl = pa.Table.from_pandas(frame, preserve_index=False,
                                       schema=t.schema)
            pq.write_table(tbl, os.path.join(grow_dir, name))
        pq.write_table(pa.Table.from_pandas(df.iloc[:cut], preserve_index=False,
                                            schema=t.schema),
                       os.path.join(hist_dir, "part_0.parquet"))
        # base run sees only part 0 of the growing dir
        os.rename(os.path.join(grow_dir, "part_1.parquet"),
                  os.path.join(grow_dir, "part_1.parquet.pending"))
        from sievedata.pipelines.validate import validate_documents

        validate_documents(grow_dir, fx["profiles"], fx["bloom"],
                           os.path.join(inc, "run_base"), resume=True)
        os.rename(os.path.join(grow_dir, "part_1.parquet.pending"),
                  os.path.join(grow_dir, "part_1.parquet"))
    return {"fx": fx, "inc": inc, "hist": hist_dir, "grow": grow_dir,
            "base_run": os.path.join(inc, "run_base")}


def q_validate_incremental(sf_dir: str):
    """Append-only DELTA validation (`--prev-run`): the last 25% of the
    flagship fixture validated against the base run's manifest + persisted
    sketch partials; returns the delta's violations.  Rows-only: the
    3-run-chain ≡ full-run byte-equivalence is asserted by
    tests/test_incremental.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.validate import validate_documents

    fxi = _incremental_fixture()
    res = validate_documents(
        fxi["grow"], fxi["fx"]["profiles"], fxi["fx"]["bloom"],
        os.path.join(fxi["inc"], "run_delta_q"), resume=True,
        prev_run_dir=fxi["base_run"],
    )
    return (
        pq.read_table(res["violations"]).to_pandas()
        .sort_values(["partition_key", "doc_id", "reason_code"], kind="mergesort")
        .reset_index(drop=True)
    )


def q_score_incremental(sf_dir: str):
    """Incremental scoring (`score --history`): the last 25% of the
    flagship fixture scored with the first 75% as candidate history;
    returns the delta's decisions.  Rows-only: byte-equivalence with the
    full run restricted to delta docs is asserted by
    tests/test_incremental_score.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.score import score_documents

    fxi = _incremental_fixture()
    delta_dir = os.path.join(fxi["inc"], "delta_only")
    if not os.path.exists(os.path.join(delta_dir, "part_1.parquet")):
        os.makedirs(delta_dir, exist_ok=True)
        os.link(os.path.join(fxi["grow"], "part_1.parquet"),
                os.path.join(delta_dir, "part_1.parquet"))
    res = score_documents(
        delta_dir, fxi["fx"]["profiles"], fxi["fx"]["bloom"],
        os.path.join(fxi["inc"], "score_delta_q"), resume=True,
        history_path=fxi["hist"],
    )
    return (
        pq.read_table(res["decisions"]).to_pandas()
        .sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    )


def q_profile_incremental(sf_dir: str):
    """Incremental profile refresh (the reference's nightly baseline job as
    a sketch merge): profiles learned from the first 75% of the flagship
    baseline, refreshed with the last 25% via update_profiles (Chan moment
    merge, t-digest merge, HLL register max) WITHOUT re-reading history;
    returns the refreshed per-partition profile stats.  Rows-only:
    merge-vs-rebuild parity is asserted by the profile tests."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sievedata.pipelines.profile import build_profiles, update_profiles

    fx = _flagship_fixture(2000, 20)
    inc = os.path.join(fx["cache"], "prof_inc")
    out_marker = os.path.join(inc, "refreshed", "profiles.parquet")
    if not os.path.exists(out_marker):
        os.makedirs(inc, exist_ok=True)
        t = pq.read_table(os.path.join(fx["cache"], "baseline.parquet"))
        df = t.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
        cut = int(len(df) * 0.75)
        for name, frame in (("base0.parquet", df.iloc[:cut]),
                            ("delta.parquet", df.iloc[cut:])):
            pq.write_table(
                pa.Table.from_pandas(frame, preserve_index=False,
                                     schema=t.schema),
                os.path.join(inc, name))
        base_prof = build_profiles(
            os.path.join(inc, "base0.parquet"),
            os.path.join(fx["cache"], "media_catalog.parquet"),
            os.path.join(inc, "prof0"))
        update_profiles(base_prof["profiles"],
                        os.path.join(inc, "delta.parquet"),
                        os.path.join(inc, "refreshed"))
    out = pq.read_table(out_marker).to_pandas()
    cols = [c for c in ("partition_key", "sample_count", "mean_total",
                        "std_total", "profile_version") if c in out.columns]
    return (out[cols].sort_values("partition_key", kind="mergesort")
            .reset_index(drop=True))


def q_score_flagship(sf_dir: str):
    """Flagship batch duplicate scoring (the reference's /scoreInvoice flow);
    returns the decisions table.  Rows-only: per-vendor exact-match vs the
    python orchestration oracle is asserted by tests/test_score.py."""
    import os

    import pyarrow.parquet as pq

    from sievedata.pipelines.score import score_documents

    fx = _flagship_fixture(2000, 20)
    res = score_documents(
        fx["documents"], fx["profiles"], fx["bloom"],
        os.path.join(fx["cache"], "score_q"), resume=True,
    )
    return (
        pq.read_table(res["decisions"]).to_pandas()
        .sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    )


# --------------------------------------------------------------------------
