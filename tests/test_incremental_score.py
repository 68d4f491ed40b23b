"""Incremental scoring (history_path): delta decisions byte-match the full
run's decisions restricted to the delta docs."""
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from tests.test_incremental import _split_documents


def _decisions(run_dir: str) -> pd.DataFrame:
    files = [os.path.join(r, f)
             for r, _, fs in os.walk(os.path.join(run_dir, "decisions"))
             for f in fs if f.endswith(".parquet")]
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    return df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)


def test_history_scoring_matches_full_run(ray_session, tmp_path):
    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import score_documents

    base = str(tmp_path)
    generate_fixture(os.path.join(base, "fx"), n_docs=1600, n_vendors=16,
                     seed=42)
    prof = build_profiles(
        os.path.join(base, "fx", "baseline.parquet"),
        os.path.join(base, "fx", "media_catalog.parquet"),
        os.path.join(base, "prof"))

    full_dir = os.path.join(base, "docs_full")
    names = _split_documents(
        os.path.join(base, "fx", "documents.parquet"), full_dir,
        fracs=(0.75, 0.25))
    hist_dir = os.path.join(base, "docs_hist")
    delta_dir = os.path.join(base, "docs_delta")
    os.makedirs(hist_dir)
    os.makedirs(delta_dir)
    import shutil
    shutil.copy(os.path.join(full_dir, names[0]),
                os.path.join(hist_dir, names[0]))
    shutil.copy(os.path.join(full_dir, names[1]),
                os.path.join(delta_dir, names[1]))

    run_full = score_documents(
        full_dir, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_full"), resume=False)
    run_delta = score_documents(
        delta_dir, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_delta"), resume=False,
        history_path=hist_dir)

    full = _decisions(os.path.join(base, "run_full"))
    delta = _decisions(os.path.join(base, "run_delta"))
    delta_ids = set(delta["doc_id"])
    # every delta decision matches the full run's row for that doc exactly
    want = full[full["doc_id"].isin(delta_ids)].reset_index(drop=True)
    assert len(delta) == len(want) and len(delta) > 0
    pd.testing.assert_frame_equal(
        delta[sorted(delta.columns)], want[sorted(want.columns)])
    # cross-batch candidates really occur: some delta doc's top match is a
    # history doc (planted twins straddle the split)
    hist_ids = set(pq.read_table(os.path.join(hist_dir, names[0]),
                                 columns=["doc_id"])
                   .to_pandas()["doc_id"].astype(str))
    # doc ids inside spans: fall back to checking match ids in top_matches
    joined = " ".join(delta["top_matches"].astype(str))
    assert any(h in joined for h in list(hist_ids)[:2000]), \
        "no history doc appears among delta top matches"


def test_history_scoring_scales_with_delta(ray_session, tmp_path):
    """A history doc whose groups the delta never touches ships zero rows
    (probe the pruning path: empty delta key overlap → empty history side
    still yields correct, delta-only decisions)."""
    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import score_documents

    base = str(tmp_path)
    generate_fixture(os.path.join(base, "fx"), n_docs=600, n_vendors=6,
                     seed=7)
    prof = build_profiles(
        os.path.join(base, "fx", "baseline.parquet"),
        os.path.join(base, "fx", "media_catalog.parquet"),
        os.path.join(base, "prof"))
    full_dir = os.path.join(base, "docs_full")
    names = _split_documents(
        os.path.join(base, "fx", "documents.parquet"), full_dir,
        fracs=(0.5, 0.5))
    d0 = os.path.join(base, "d0")
    d1 = os.path.join(base, "d1")
    os.makedirs(d0)
    os.makedirs(d1)
    import shutil
    shutil.copy(os.path.join(full_dir, names[0]), os.path.join(d0, names[0]))
    shutil.copy(os.path.join(full_dir, names[1]), os.path.join(d1, names[1]))

    solo = score_documents(
        d1, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_solo"), resume=False)
    withhist = score_documents(
        d1, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_hist"), resume=False, history_path=d0)
    # both score exactly the delta docs
    assert solo["n_docs"] == withhist["n_docs"]


def test_store_chain_scoring_without_store_documents(ray_session, tmp_path):
    """prev_run_dir mode: the delta scores against the previous run's
    PERSISTED candidate store (store/ + store_index/).  The store's raw
    documents are deleted before the delta run — proof that no document of
    the store is re-parsed or even opened — and decisions still byte-match
    the full run restricted to the delta docs."""
    import shutil

    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import score_documents

    base = str(tmp_path)
    generate_fixture(os.path.join(base, "fx"), n_docs=1600, n_vendors=16,
                     seed=42)
    prof = build_profiles(
        os.path.join(base, "fx", "baseline.parquet"),
        os.path.join(base, "fx", "media_catalog.parquet"),
        os.path.join(base, "prof"))

    full_dir = os.path.join(base, "docs_full")
    names = _split_documents(
        os.path.join(base, "fx", "documents.parquet"), full_dir,
        fracs=(0.75, 0.25))
    hist_dir = os.path.join(base, "docs_hist")
    delta_dir = os.path.join(base, "docs_delta")
    os.makedirs(hist_dir)
    os.makedirs(delta_dir)
    shutil.copy(os.path.join(full_dir, names[0]),
                os.path.join(hist_dir, names[0]))
    shutil.copy(os.path.join(full_dir, names[1]),
                os.path.join(delta_dir, names[1]))

    run_full = score_documents(
        full_dir, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_full"), resume=False)
    score_documents(
        hist_dir, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_base"), resume=False)

    # the store's raw documents vanish: only the persisted store remains
    shutil.rmtree(hist_dir)

    run_delta = score_documents(
        delta_dir, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_chain"), resume=False,
        prev_run_dir=os.path.join(base, "run_base"))
    stats = run_delta["timings"]["store_index_probe_stats"]
    assert stats["pruned"] is True and stats["indexed_runs"] == 1
    assert 0 < stats["scanned_fragments"] <= stats["total_fragments"]

    full = _decisions(os.path.join(base, "run_full"))
    delta = _decisions(os.path.join(base, "run_chain"))
    want = full[full["doc_id"].isin(set(delta["doc_id"]))].reset_index(drop=True)
    assert len(delta) == len(want) and len(delta) > 0
    pd.testing.assert_frame_equal(
        delta[sorted(delta.columns)], want[sorted(want.columns)])

    # the chain extends: the delta run's manifest now lists both stores
    import json
    with open(run_delta["manifest"]) as f:
        lin = json.load(f)["lineage"]
    assert len(lin["store_dirs"]) == 2

    # config mismatch fails loudly instead of mis-keying the chain
    from sievedata.pipelines.score import ScoreConfig
    with pytest.raises(ValueError, match="config mismatch"):
        score_documents(
            delta_dir, prof["profiles"], prof["media_bloom"],
            os.path.join(base, "run_badcfg"), resume=False,
            prev_run_dir=os.path.join(base, "run_base"),
            cfg=ScoreConfig(neartext_bands=4))


def test_compacted_store_chain_equivalence(ray_session, tmp_path):
    """compact_score_store rewrites a multi-run store chain as ONE store;
    a delta scored against the compacted store byte-matches the same delta
    scored against the original chain (and hence the full run)."""
    import shutil

    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.score import compact_score_store, score_documents

    base = str(tmp_path)
    generate_fixture(os.path.join(base, "fx"), n_docs=1200, n_vendors=12,
                     seed=17)
    prof = build_profiles(
        os.path.join(base, "fx", "baseline.parquet"),
        os.path.join(base, "fx", "media_catalog.parquet"),
        os.path.join(base, "prof"))

    full_dir = os.path.join(base, "docs_full")
    names = _split_documents(
        os.path.join(base, "fx", "documents.parquet"), full_dir,
        fracs=(0.5, 0.3, 0.2))
    dirs = []
    for i, n in enumerate(names):
        d = os.path.join(base, f"docs_{i}")
        os.makedirs(d)
        shutil.copy(os.path.join(full_dir, n), os.path.join(d, n))
        dirs.append(d)

    # chain: base run over part 0, then delta part 1 against it
    run0 = os.path.join(base, "run0")
    run1 = os.path.join(base, "run1")
    score_documents(dirs[0], prof["profiles"], prof["media_bloom"],
                    run0, resume=False)
    score_documents(dirs[1], prof["profiles"], prof["media_bloom"],
                    run1, resume=False, prev_run_dir=run0)

    comp = compact_score_store(run1, os.path.join(base, "compacted"))
    assert comp["n_source_dirs"] == 2

    # part-2 delta: chain mode vs compacted mode must byte-match
    run2a = os.path.join(base, "run2_chain")
    run2b = os.path.join(base, "run2_compacted")
    score_documents(dirs[2], prof["profiles"], prof["media_bloom"],
                    run2a, resume=False, prev_run_dir=run1)
    score_documents(dirs[2], prof["profiles"], prof["media_bloom"],
                    run2b, resume=False,
                    prev_run_dir=os.path.join(base, "compacted"))
    a = _decisions(run2a)
    b = _decisions(run2b)
    assert len(a) == len(b) > 0
    pd.testing.assert_frame_equal(a, b)
    # the compacted path probed exactly ONE store dir
    import json
    with open(os.path.join(run2b, "manifest.json")) as f:
        lin = json.load(f)["lineage"]
    assert len(lin["store_dirs"]) == 2  # compacted store + run2b's own
