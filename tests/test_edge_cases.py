"""Edge cases: tiny inputs, docs with no profile partition, all-clean data."""
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from sievedata.schema import DOCUMENTS


def _write_docs(path, docs):
    from sievedata.fixtures import doc_to_spans

    tbl = pa.Table.from_pydict(
        {"doc_id": [d["doc_id"] for d in docs],
         "spans": [doc_to_spans(d) for d in docs]},
        schema=DOCUMENTS,
    )
    pq.write_table(tbl, path)


def _mini_doc(doc_id, vendor="V9999", total=100.0, **over):
    d = {
        "doc_id": doc_id, "vendor_id": vendor, "vendor_name": "Vendor X",
        "invoice_number": f"INV-{doc_id}", "invoice_date": "2025-06-01",
        "currency": "USD", "total": total, "tax_total": 19.0,
        "po_number": None, "remit_account": None, "remit_name": None,
        "terms": None,
        "lines": [{"desc": "paper a4 1", "qty": 1, "unit_price": total,
                   "amount": total, "sku": ""}],
        "media_ref": f"media://{doc_id}", "vclass": None,
    }
    d.update(over)
    return d


def test_validate_unknown_partition_and_tiny_input(ray_session, t1_tables, tmp_path):
    """Docs from a partition with NO learned profile: no range/drift checks
    fire, schema/dup/referential still run, nothing crashes."""
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.validate import validate_documents

    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(tmp_path / "prof")
    )
    docs = [_mini_doc(f"X{i}") for i in range(5)]
    docs.append(_mini_doc("X5", total=-50.0))  # credit note
    path = str(tmp_path / "mini.parquet")
    _write_docs(path, docs)

    res = validate_documents(
        path, prof["profiles"], prof["media_bloom"], str(tmp_path / "run"),
        resume=False,
    )
    vio = pq.read_table(res["violations"]).to_pandas()
    # every media_ref is unknown to the catalog → BANK_CHANGE on non-credit
    # and credit docs alike (referential check ignores credit status);
    # X0-X4 share identical line text with distinct pdf hashes → the
    # near-text Jaccard branch flags X1-X4 against X0 (credit X5 excluded)
    assert set(vio["reason_code"]) == {"BANK_CHANGE", "PDF_NEAR_DUP"}
    assert (vio["reason_code"] == "BANK_CHANGE").sum() == 6
    near = vio[vio["reason_code"] == "PDF_NEAR_DUP"]
    assert sorted(near["doc_id"]) == ["X1", "X2", "X3", "X4"]
    assert near["detail"].str.endswith("match=X0").all()
    ver = pq.read_table(res["verdicts"]).to_pandas()
    mine = ver[ver["partition_key"] == "V9999"].set_index("check_name")
    assert bool(mine.loc["drift", "passed"]) and mine.loc["drift", "detail"] == "no_profile"
    assert bool(mine.loc["structure", "passed"]) and mine.loc["structure", "detail"] == "no_profile"
    assert not bool(mine.loc["referential", "passed"])
    assert int(mine.loc["schema", "n_docs"]) == 6


def test_score_single_doc_no_candidates(ray_session, t1_tables, tmp_path):
    """A lone document scores with dup_prob 0 (reference: empty top ⇒ 0.0)."""
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import score_documents

    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(tmp_path / "prof")
    )
    path = str(tmp_path / "one.parquet")
    _write_docs(path, [_mini_doc("solo")])
    res = score_documents(
        path, prof["profiles"], prof["media_bloom"], str(tmp_path / "srun"),
        resume=False,
    )
    dec = pq.read_table(res["decisions"]).to_pandas()
    assert len(dec) == 1
    assert dec["dup_prob"].iloc[0] == 0.0
    assert dec["n_candidates"].iloc[0] == 0
    # unknown media ref ⇒ bank change ⇒ risk floored at 80 ⇒ HOLD
    assert dec["decision"].iloc[0] == "HOLD"
    assert "BANK_CHANGE" in dec["reason_codes"].iloc[0]


def test_vendor_scope_threshold_overrides(ray_session, t1_tables, tmp_path):
    """Vendor-scoped config overrides (reference configs scope vendor:{id}):
    raising one vendor's thresholds flips its REVIEWs to PASS."""
    import pandas as pd

    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import ScoreConfig, score_documents

    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(tmp_path / "prof")
    )
    base = score_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(tmp_path / "base"), cfg=ScoreConfig(), resume=False,
    )
    dec_base = pq.read_table(base["decisions"]).to_pandas()
    vendor = "V0003"
    had_review = dec_base[
        (dec_base["partition_key"] == vendor) & (dec_base["decision"] == "REVIEW")
    ]
    assert len(had_review) > 0

    cfg = ScoreConfig(threshold_overrides={vendor: (99.0, 99.5)})
    over = score_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(tmp_path / "over"), cfg=cfg, resume=False,
    )
    dec_over = pq.read_table(over["decisions"]).to_pandas().set_index("doc_id")
    # overridden vendor: scores below 99 now PASS
    for _, row in had_review.iterrows():
        if row["risk_score"] < 99.0:
            assert dec_over.loc[row["doc_id"], "decision"] == "PASS"
    # other vendors unchanged
    others_base = dec_base[dec_base["partition_key"] != vendor].set_index("doc_id")
    others_over = dec_over[dec_over["partition_key"] != vendor]
    pd.testing.assert_series_equal(
        others_base["decision"].sort_index(), others_over["decision"].sort_index()
    )


def test_config_scope_fallback_chain():
    """ST4 layered resolution (app/main.py:211-235 + implementation.md:344):
    vendor:{id} scope beats global beats default; tolerant float coercion
    like the reference's _get_cfg ({"value": x} wrappers, stringly numbers,
    garbage → default)."""
    from sievedata.config import ConfigStore

    store = ConfigStore()
    # default only
    assert store.get_float("review_threshold", 50.0, "V1") == 50.0
    # global layer
    store.set("global", "review_threshold", 60.0)
    assert store.get_float("review_threshold", 50.0, "V1") == 60.0
    assert store.get_float("review_threshold", 50.0) == 60.0
    # vendor layer beats global (only for that vendor)
    store.set("vendor:V1", "review_threshold", 70.0)
    assert store.get_float("review_threshold", 50.0, "V1") == 70.0
    assert store.get_float("review_threshold", 50.0, "V2") == 60.0
    # arbitrary keys, not just thresholds
    store.set("global", "pair_scan_cap", {"value": "150"})
    assert store.get_float("pair_scan_cap", 200.0, "V9") == 150.0
    store.set("vendor:V9", "pair_scan_cap", "175")
    assert store.get_float("pair_scan_cap", 200.0, "V9") == 175.0
    # garbage value → caller default (reference's tolerant coercion)
    store.set("global", "broken", {"oops": 1})
    assert store.get_float("broken", 3.5, "V1") == 3.5
    # vectorized per-partition resolution
    import numpy as np

    vals = store.resolve_floats(
        "review_threshold", 50.0, np.array(["V1", "V2", "V1"], dtype=object))
    assert vals.tolist() == [70.0, 60.0, 70.0]
    # from_rows parity with the configs-table shape
    s2 = ConfigStore.from_rows([
        {"scope": "global", "key": "hold_threshold", "value": "81.5"},
        {"scope": "vendor:V3", "key": "hold_threshold", "value": 90},
    ])
    assert s2.get_float("hold_threshold", 80.0, "V3") == 90.0
    assert s2.get_float("hold_threshold", 80.0, "V4") == 81.5


def test_global_scope_threshold_layer(ray_session, t1_tables, tmp_path):
    """A global-scope threshold entry shifts EVERY vendor's decisions, and a
    vendor-scope entry still wins over it — the full default→global→vendor
    chain through score_documents."""
    from sievedata.config import ConfigStore
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import ScoreConfig, score_documents

    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(tmp_path / "prof")
    )
    base = score_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(tmp_path / "base"), cfg=ScoreConfig(), resume=False,
    )
    dec_base = pq.read_table(base["decisions"]).to_pandas()
    reviews = dec_base[dec_base["decision"] == "REVIEW"]
    assert len(reviews) > 0
    vendor = reviews["partition_key"].iloc[0]

    # global layer: raise review threshold above every observed REVIEW score
    # → those flip to PASS; vendor layer: keep ONE vendor at the default
    store = (ConfigStore()
             .set("global", "review_threshold", 99.0)
             .set("global", "hold_threshold", 99.5)
             .set(f"vendor:{vendor}", "review_threshold", 50.0)
             .set(f"vendor:{vendor}", "hold_threshold", 80.0))
    over = score_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(tmp_path / "over"), cfg=ScoreConfig(config=store), resume=False,
    )
    dec_over = pq.read_table(over["decisions"]).to_pandas().set_index("doc_id")
    for _, row in reviews.iterrows():
        if row["partition_key"] == vendor:
            # vendor scope pins the default thresholds → decision unchanged
            assert dec_over.loc[row["doc_id"], "decision"] == "REVIEW"
        elif row["risk_score"] < 99.0:
            # global scope lifted the bar for everyone else
            assert dec_over.loc[row["doc_id"], "decision"] == "PASS"


def test_text_queries_on_adversarial_documents(ray_session, tmp_path):
    """NULL / empty / sub-n-gram / non-ASCII texts through the text-query
    catalogue, engine vs DuckDB oracle on the same synthetic table —
    covers the packed-gram ASCII fast paths' exact fallbacks and the
    zero-benchmark decontamination edge."""
    import hashlib

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import ray.data

    from sievedata import queries as Q

    sf = str(tmp_path)
    rows = {
        "doc_id": list(range(1, 21)),
        "text": (["hello world common text"] * 5
                 + [None, "", "ab", "abcd", "héllo wörld ünïcode"]
                 + [f"the quick brown fox {i} jumps over" for i in range(10)]),
        "lang": ["en"] * 10 + ["de"] * 10,
        "source": ["s"] * 20,
        "n_chars": [0] * 20,
    }
    pq.write_table(pa.table(rows), f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")

    def canon(obj):
        df = obj.to_pandas() if isinstance(obj, (ray.data.Dataset, pa.Table)) else obj
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    osql = Q.oracle_sql()
    for name in ["token_shards", "term_doc_freq", "stratified_sample",
                 "word_count", "ngram_jaccard_pairs", "exact_dedup_docs",
                 "decontaminate"]:
        got = canon(Q.queries()[name](sf))
        want = canon(con.execute(osql[name]).fetch_df())
        assert len(got) == len(want), name
        assert list(got.columns) == list(want.columns), name
        h = lambda d: hashlib.md5(
            pd.util.hash_pandas_object(d, index=False).values.tobytes()
        ).hexdigest()
        assert h(got) == h(want), name


def test_new_queries_on_empty_tables(ray_session, tmp_path):
    """Empty documents/orders tables: stratified_sample, token_shards and
    approx_quantiles return typed empty frames like their oracles, not
    crashes."""
    import pyarrow.parquet as pq

    from sievedata import queries as Q

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string()),
        "lang": pa.array([], pa.string()), "source": pa.array([], pa.string()),
        "n_chars": pa.array([], pa.int64()),
    }), f"{sf}/documents.parquet")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([], pa.int64()),
        "o_custkey": pa.array([], pa.int64()),
        "o_totalprice": pa.array([], pa.float64()),
    }), f"{sf}/orders.parquet")

    assert len(Q.queries()["stratified_sample"](sf)) == 0
    assert len(Q.queries()["token_shards"](sf)) == 0
    assert len(Q.queries()["approx_quantiles"](sf)) == 0


def test_dedup_cli_resumable(ray_session, tmp_path):
    """The dedup CLI stage writes an atomic keep-list and a re-run resumes
    (skips) byte-identically."""
    import pyarrow.parquet as pq

    from sievedata.pipelines.dedup import dedup_corpus

    sf = str(tmp_path / "in")
    import os
    os.makedirs(sf)
    texts = (["the quick brown fox jumps over the lazy dog"] * 3
             + [f"unique document number {i} with words" for i in range(7)])
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, 11)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * 10, pa.string()),
        "source": pa.array(["s"] * 10, pa.string()),
        "n_chars": pa.array([0] * 10, pa.int64()),
    }), f"{sf}/documents.parquet")
    out_dir = str(tmp_path / "keep")
    r1 = dedup_corpus(sf, out_dir)
    assert r1["resumed"] is False
    assert r1["n_survivors"] == 8  # 3 exact near-dups collapse to 1
    df1 = pq.read_table(out_dir).to_pandas().sort_values("doc_id")
    assert df1[df1.doc_id == 1]["group_size"].iloc[0] == 3
    r2 = dedup_corpus(sf, out_dir)
    assert r2["resumed"] is True and r2["n_survivors"] == 8


def test_dedup_components_deep_chain_pointer_doubling(ray_session, tmp_path):
    """A diameter-9 near-dup chain (rolling token windows: adjacent docs
    share ≥0.8 5-gram Jaccard, distance ≥2 fall below) converges within a
    round budget PLAIN neighbor-min propagation cannot meet — proving the
    pointer-doubling self-join shortcut (rounds O(log diameter)) — and the
    labels match an in-test exact-Jaccard union-find oracle."""
    import numpy as np
    import pyarrow.parquet as pq

    from sievedata import queries as Q

    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    toks = ["".join(rng.choice(alpha, size=7)) for _ in range(80)]
    assert len(set(toks)) == len(toks)
    W, S, n_chain = 36, 3, 10
    texts = [" ".join(toks[i * S: i * S + W]) for i in range(n_chain)]
    texts += ["completely different text one", "another unrelated blob here"]
    sf = str(tmp_path)
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(1, len(texts) + 1)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{sf}/documents.parquet")

    # exact in-test oracle: 5-gram Jaccard edges (same windows as the SQL
    # oracle: substr positions 1..max(len-4, 1)) + union-find min labels
    def grams(t):
        return {t[i: i + 5] for i in range(max(len(t) - 4, 1))}

    gs = [grams(t) for t in texts]
    n = len(texts)
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    edges = []
    for i in range(n):
        for j in range(i + 1, n):
            inter = len(gs[i] & gs[j])
            if 5 * inter >= 4 * len(gs[i] | gs[j]):
                edges.append((i, j))
                parent[find(j)] = find(i)
    # the fixture must actually be a deep chain, or the test proves nothing
    adj = {i: set() for i in range(n)}
    for i, j in edges:
        adj[i].add(j), adj[j].add(i)

    def bfs_depth(src):
        seen, frontier, d = {src}, {src}, 0
        while frontier:
            frontier = {y for x in frontier for y in adj[x]} - seen
            seen |= frontier
            d += 1 if frontier else 0
        return d

    assert max(bfs_depth(i) for i in range(n_chain)) >= 8

    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i + 1)
    want = sorted(
        (doc, min(members)) for members in comp.values() for doc in members
    )

    # budget 7 rounds: plain propagation needs diameter(9)+1 and raises;
    # with pointer doubling reach doubles per round past round 3
    got = (Q.q_dedup_components(sf, max_iters=7).to_pandas()
           .sort_values("doc_id"))
    assert list(map(tuple, got[["doc_id", "component"]].values)) == want


def test_curation_queries_on_adversarial_documents(ray_session, tmp_path):
    """Round-4 curation queries (domain caps, hash split, packing, length
    filter, BPE pairs, dup ratio) on the adversarial documents table (NULL
    / empty / sub-gram / non-ASCII texts, one hot source), engine vs
    DuckDB oracle."""
    import hashlib

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import ray.data

    from sievedata import queries as Q

    sf = str(tmp_path)
    rows = {
        "doc_id": list(range(1, 21)),
        "text": (["hello world common text"] * 5
                 + [None, "", "ab", "abcd", "héllo wörld ünïcode"]
                 + [f"the quick brown fox {i} jumps over" for i in range(10)]),
        "lang": ["en"] * 10 + ["de"] * 10,
        "source": ["hot"] * 17 + ["cold", "cold", "tail"],
        "n_chars": [23] * 5 + [0, 0, 2, 4, 19] + [30] * 10,
    }
    pq.write_table(pa.table(rows), f"{sf}/documents.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')")

    def canon(obj):
        df = obj.to_pandas() if isinstance(obj, (ray.data.Dataset, pa.Table)) else obj
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def h(d):
        return hashlib.md5(
            pd.util.hash_pandas_object(d, index=False).values.tobytes()
        ).hexdigest()

    osql = Q.oracle_sql()
    for name in ["domain_caps", "hash_split", "pack_windows", "length_filter",
                 "bpe_merge_candidates", "dup_ratio_by_source"]:
        got = canon(Q.queries()[name](sf))
        want = canon(con.execute(osql[name]).fetch_df())
        assert len(got) == len(want), name
        assert list(got.columns) == list(want.columns), name
        assert h(got) == h(want), name


def test_event_queries_on_adversarial_events(ray_session, tmp_path):
    """Funnel / retention / JSON extraction on a crafted events table:
    purchase-before-click ordering, users missing stages, NULL and
    malformed props — engine vs DuckDB oracle."""
    import hashlib
    from datetime import datetime

    import duckdb
    import pandas as pd
    import pyarrow.parquet as pq

    import ray.data

    from sievedata import queries as Q

    sf = str(tmp_path)

    def ts(day, hour):
        return datetime(2024, 3, day, hour, 0, 0)

    rows = [
        # u1: full ordered funnel across two weeks
        (1, ts(4, 1), 1, "view", '{"k": 5}'),
        (2, ts(4, 2), 1, "click", '{"k": -3}'),
        (3, ts(12, 3), 1, "purchase", '{"k": 7}'),
        # u2: purchase BEFORE click -> stage stops at 2
        (4, ts(5, 1), 2, "view", None),
        (5, ts(5, 2), 2, "purchase", '{"k": 1}'),
        (6, ts(5, 3), 2, "click", 'not json'),
        # u3: click with no view -> stage 0? no: no view -> stage 0
        (7, ts(6, 1), 3, "click", '{"k": 11}'),
        # u4: view only, second week cohort
        (8, ts(13, 1), 4, "view", '{"nope": 1}'),
        # u5: simultaneous-ish strict ordering (click == view ts -> excluded)
        (9, ts(7, 1), 5, "view", '{"k": 2}'),
        (10, ts(7, 1), 5, "click", '{"k": 2}'),
    ]
    tbl = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
        "props": pa.array([r[4] for r in rows], pa.string()),
    })
    pq.write_table(tbl, f"{sf}/events.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")

    def canon(obj):
        df = obj.to_pandas() if isinstance(obj, (ray.data.Dataset, pa.Table)) else obj
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    def h(d):
        return hashlib.md5(
            pd.util.hash_pandas_object(d, index=False).values.tobytes()
        ).hexdigest()

    osql = Q.oracle_sql()
    for name in ["event_funnel", "retention_cohorts", "json_props_sum"]:
        got = canon(Q.queries()[name](sf))
        want = canon(con.execute(osql[name]).fetch_df())
        assert len(got) == len(want), name
        assert list(got.columns) == list(want.columns), name
        assert h(got) == h(want), name
    # sanity on the funnel semantics themselves
    funnel = Q.queries()["event_funnel"](sf).to_pandas().set_index("user_id")["stage"]
    assert funnel[1] == 3      # ordered full funnel
    assert funnel[2] == 2      # purchase precedes click -> not counted
    assert funnel[3] == 0      # click with no view
    assert funnel[4] == 1
    assert funnel[5] == 1      # strict > excludes same-timestamp click


def test_embedding_quantize_zero_and_empty(ray_session, tmp_path):
    """embedding_quantize drops all-zero vectors (no scale) and returns a
    typed empty frame on an empty table, matching the oracle."""
    import duckdb
    import pyarrow.parquet as pq

    from sievedata import queries as Q

    sf = str(tmp_path)
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[0.0, 0.0], [1.0, -2.0], [0.5, 0.25]],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 1, 0], pa.int32()),
    }), f"{sf}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')")
    got = Q.queries()["embedding_quantize"](sf).to_pandas()
    want = con.execute(Q.oracle_sql()["embedding_quantize"]).fetch_df()
    got = got.sort_values("vec_id").reset_index(drop=True)
    want = want.sort_values("vec_id").reset_index(drop=True)
    assert list(got["vec_id"]) == [1, 2]  # zero vector dropped
    assert got.equals(want[got.columns])
