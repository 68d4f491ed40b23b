"""Incremental (append-only delta) validation: equivalence with a full run.

Contract (validate.py::validate_documents, prev_run_dir): with doc_ids
append-ordered across batches, (a) the union of the base run's and each
delta run's violations equals the full run's violations exactly, (b) the
final incremental verdicts equal the full run's verdicts bit-for-bit
(integer-sum / register-max partial merges), (c) a no-new-files run is a
no-op with identical verdicts, and (d) config / profile mismatches fail
loudly instead of merging incompatible partials.
"""
import os
import shutil

import pandas as pd
import pyarrow.parquet as pq
import pytest


def _split_documents(src_parquet: str, out_dir: str, fracs=(0.6, 0.25, 0.15)):
    """Split a documents table into doc_id-ordered parquet fragments so
    later fragments append after earlier ones in every dup group."""
    t = pq.read_table(src_parquet)
    df = t.to_pandas().sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    os.makedirs(out_dir, exist_ok=True)
    n = len(df)
    cuts = []
    start = 0
    for i, f in enumerate(fracs):
        end = n if i == len(fracs) - 1 else start + int(n * f)
        cuts.append((start, end))
        start = end
    names = []
    import pyarrow as pa

    for i, (s, e) in enumerate(cuts):
        name = f"part_{i}.parquet"
        pq.write_table(
            pa.Table.from_pandas(df.iloc[s:e], preserve_index=False,
                                 schema=t.schema),
            os.path.join(out_dir, name))
        names.append(name)
    return names


def _violations(run_dir: str) -> pd.DataFrame:
    files = [os.path.join(r, f)
             for r, _, fs in os.walk(os.path.join(run_dir, "violations"))
             for f in fs if f.endswith(".parquet")]
    frames = [pq.read_table(f).to_pandas() for f in files]
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        columns=["partition_key", "doc_id", "reason_code", "detail"])
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _verdicts(path: str) -> pd.DataFrame:
    return (pq.read_table(path).to_pandas()
            .sort_values(["partition_key", "check_name"], kind="mergesort")
            .reset_index(drop=True))


@pytest.fixture(scope="module")
def inc_env(ray_session, tmp_path_factory):
    from sievedata.fixtures import generate_fixture
    from sievedata.pipelines.profile import build_profiles
    from sievedata.pipelines.validate import validate_documents

    base = str(tmp_path_factory.mktemp("inc"))
    fix = generate_fixture(os.path.join(base, "fx"), n_docs=2500,
                           n_vendors=25, seed=42)
    prof = build_profiles(
        os.path.join(base, "fx", "baseline.parquet"),
        os.path.join(base, "fx", "media_catalog.parquet"),
        os.path.join(base, "prof"))

    full_dir = os.path.join(base, "docs_full")
    names = _split_documents(
        os.path.join(base, "fx", "documents.parquet"), full_dir)

    # the growing append-only directory: starts with fragment 0 only
    grow_dir = os.path.join(base, "docs_grow")
    os.makedirs(grow_dir)
    shutil.copy(os.path.join(full_dir, names[0]),
                os.path.join(grow_dir, names[0]))

    run_full = validate_documents(
        full_dir, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_full"), resume=False)
    run_a = validate_documents(
        grow_dir, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_a"), resume=False)
    return {"base": base, "prof": prof, "full_dir": full_dir,
            "grow_dir": grow_dir, "names": names,
            "run_full": run_full, "run_a": run_a,
            "validate": validate_documents}


def test_incremental_chain_matches_full_run(inc_env):
    prof = inc_env["prof"]
    names = inc_env["names"]
    base = inc_env["base"]
    grow = inc_env["grow_dir"]
    validate_documents = inc_env["validate"]

    # append fragment 1, delta-validate against the base run
    shutil.copy(os.path.join(inc_env["full_dir"], names[1]),
                os.path.join(grow, names[1]))
    run_b = validate_documents(
        grow, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_b"), resume=False,
        prev_run_dir=os.path.join(base, "run_a"))
    assert run_b["incremental"] and run_b["n_new_files"] == 1

    # append fragment 2, delta-validate against run_b (chain of 2)
    shutil.copy(os.path.join(inc_env["full_dir"], names[2]),
                os.path.join(grow, names[2]))
    run_c = validate_documents(
        grow, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_c"), resume=False,
        prev_run_dir=os.path.join(base, "run_b"))

    # (a) violations: base ∪ delta1 ∪ delta2 == full, row-exact
    got = pd.concat([
        _violations(os.path.join(base, "run_a")),
        _violations(os.path.join(base, "run_b")),
        _violations(os.path.join(base, "run_c")),
    ], ignore_index=True)
    got = got.sort_values(list(got.columns), kind="mergesort").reset_index(drop=True)
    want = _violations(os.path.join(base, "run_full"))
    pd.testing.assert_frame_equal(got, want)

    # (b) final verdicts == full-run verdicts bit-for-bit
    pd.testing.assert_frame_equal(
        _verdicts(run_c["verdicts"]), _verdicts(inc_env["run_full"]["verdicts"]))

    # manifest totals agree too
    assert run_c["n_violations"] == inc_env["run_full"]["n_violations"]


def test_incremental_noop_run(inc_env):
    """No new fragments: empty delta, verdicts identical to the prev run."""
    prof = inc_env["prof"]
    base = inc_env["base"]
    validate_documents = inc_env["validate"]
    prev = os.path.join(base, "run_c")
    if not os.path.exists(prev):  # ordering safety if run alone
        pytest.skip("chain test did not run")
    run_d = validate_documents(
        inc_env["grow_dir"], prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_d"), resume=False, prev_run_dir=prev)
    assert run_d["n_new_files"] == 0
    assert len(_violations(os.path.join(base, "run_d"))) == 0
    pd.testing.assert_frame_equal(
        _verdicts(run_d["verdicts"]),
        _verdicts(os.path.join(prev, "verdicts.parquet")))


def test_incremental_guards(inc_env):
    from sievedata.pipelines.validate import ValidateConfig

    prof = inc_env["prof"]
    base = inc_env["base"]
    validate_documents = inc_env["validate"]
    with pytest.raises(ValueError, match="config mismatch"):
        validate_documents(
            inc_env["grow_dir"], prof["profiles"], prof["media_bloom"],
            os.path.join(base, "run_badcfg"), resume=False,
            prev_run_dir=os.path.join(base, "run_a"),
            cfg=ValidateConfig(z_threshold=9.9))


def test_incremental_with_waves_matches(inc_env):
    """An incremental delta run with stage-1 waves produces the same
    verdicts as the already-verified chain (waves only change commit
    granularity, never results)."""
    import pyarrow.parquet as pq

    from sievedata.pipelines.validate import ValidateConfig

    prof = inc_env["prof"]
    base = inc_env["base"]
    if not os.path.exists(os.path.join(base, "run_c")):
        pytest.skip("chain test did not run")
    validate_documents = inc_env["validate"]
    # one delta of BOTH remaining fragments (grow already holds them) from
    # run_a, committed in 2 waves — verdicts must equal the full run's
    run_w = validate_documents(
        inc_env["grow_dir"], prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_waved"), resume=False,
        prev_run_dir=os.path.join(base, "run_a"),
        cfg=ValidateConfig(stage1_waves=2))
    assert run_w["n_new_files"] == 2
    pd.testing.assert_frame_equal(
        _verdicts(run_w["verdicts"]),
        _verdicts(inc_env["run_full"]["verdicts"]))
    got = pd.concat([
        _violations(os.path.join(base, "run_a")),
        _violations(os.path.join(base, "run_waved")),
    ], ignore_index=True)
    got = got.sort_values(list(got.columns), kind="mergesort").reset_index(drop=True)
    want = _violations(os.path.join(base, "run_full"))
    pd.testing.assert_frame_equal(got, want)


def test_group_index_prunes_history_fragments(inc_env):
    """The persistent dup-group index lets a delta run read only the
    history fragments whose groups the delta touches.  Dup twins are
    doc_id-adjacent in the fixture, so a doc_id-ordered delta's groups
    live almost entirely within the delta: the probe must prune strictly,
    and the pruned run's outputs must still match the chain run (which the
    chain test already verified against the full run)."""
    prof = inc_env["prof"]
    base = inc_env["base"]
    if not os.path.exists(os.path.join(base, "run_c")):
        pytest.skip("chain test did not run")
    validate_documents = inc_env["validate"]
    # same delta as run_c: fragment 2 against the run_b history chain
    run_p = validate_documents(
        inc_env["grow_dir"], prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_prune"), resume=False,
        prev_run_dir=os.path.join(base, "run_b"))
    stats = run_p["timings"].get("stage2_index_probe_stats")
    assert stats is not None, "delta run must record index-probe stats"
    assert stats["pruned"] is True
    assert stats["indexed_runs"] == stats["runs"] > 0
    assert stats["scanned_fragments"] < stats["total_fragments"], (
        "index probe did not prune any history fragment")
    pd.testing.assert_frame_equal(
        _violations(os.path.join(base, "run_prune")),
        _violations(os.path.join(base, "run_c")))
    pd.testing.assert_frame_equal(
        _verdicts(run_p["verdicts"]), _verdicts(inc_env["run_full"]["verdicts"]))


def test_group_index_fallback_without_index(inc_env):
    """A history run without a group index (older engine / group_index
    disabled) falls back to the full history scan with identical output."""
    import shutil as _sh

    from sievedata.pipelines.validate import ValidateConfig

    prof = inc_env["prof"]
    base = inc_env["base"]
    names = inc_env["names"]
    if not os.path.exists(os.path.join(base, "run_b")):
        pytest.skip("chain test did not run")
    grow2 = os.path.join(base, "docs_grow2")
    os.makedirs(grow2, exist_ok=True)
    _sh.copy(os.path.join(inc_env["full_dir"], names[0]),
             os.path.join(grow2, names[0]))
    validate_documents = inc_env["validate"]
    validate_documents(
        grow2, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_noidx"), resume=False,
        cfg=ValidateConfig(group_index=False))
    assert not os.path.exists(os.path.join(base, "run_noidx", "group_index"))
    _sh.copy(os.path.join(inc_env["full_dir"], names[1]),
             os.path.join(grow2, names[1]))
    run_d = validate_documents(
        grow2, prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_noidx_delta"), resume=False,
        prev_run_dir=os.path.join(base, "run_noidx"))
    stats = run_d["timings"]["stage2_index_probe_stats"]
    assert stats["indexed_runs"] == 0
    # same delta as the chain's run_b, which ran WITH history indexes
    pd.testing.assert_frame_equal(
        _violations(os.path.join(base, "run_noidx_delta")),
        _violations(os.path.join(base, "run_b")))


def test_incremental_banding_mismatch_fails(inc_env):
    """The persisted dup-group hashes depend on the neartext banding; a
    delta run with different bands must refuse to merge the chain."""
    from sievedata.pipelines.validate import ValidateConfig

    prof = inc_env["prof"]
    base = inc_env["base"]
    validate_documents = inc_env["validate"]
    with pytest.raises(ValueError, match="config mismatch"):
        validate_documents(
            inc_env["grow_dir"], prof["profiles"], prof["media_bloom"],
            os.path.join(base, "run_badbands"), resume=False,
            prev_run_dir=os.path.join(base, "run_a"),
            cfg=ValidateConfig(neartext_bands=4))


def test_compacted_validate_chain_equivalence(inc_env):
    """compact_validate_runs rewrites a multi-run checked chain as one
    base run; the next delta against the compacted base produces the SAME
    violations and verdicts as the chain-mode delta (run_c, already proven
    equal to the full run)."""
    from sievedata.pipelines.validate import compact_validate_runs

    prof = inc_env["prof"]
    base = inc_env["base"]
    if not os.path.exists(os.path.join(base, "run_c")):
        pytest.skip("chain test did not run")
    validate_documents = inc_env["validate"]

    comp = compact_validate_runs(
        os.path.join(base, "run_b"), os.path.join(base, "compacted"))
    assert comp["n_source_dirs"] == 2

    run_cc = validate_documents(
        inc_env["grow_dir"], prof["profiles"], prof["media_bloom"],
        os.path.join(base, "run_c_compacted"), resume=False,
        prev_run_dir=os.path.join(base, "compacted"))
    pd.testing.assert_frame_equal(
        _violations(os.path.join(base, "run_c_compacted")),
        _violations(os.path.join(base, "run_c")))
    pd.testing.assert_frame_equal(
        _verdicts(run_cc["verdicts"]), _verdicts(inc_env["run_full"]["verdicts"]))
    # the compacted base presents ONE checked dir + ONE index to the delta
    stats = run_cc["timings"]["stage2_index_probe_stats"]
    assert stats["runs"] == 1 and stats["indexed_runs"] == 1
