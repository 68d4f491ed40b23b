"""Resume-after-failure: a run killed between stages resumes to outputs
identical to an uninterrupted run (north_rule resumability), plus media-stub
unit behavior."""
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest


def test_resume_after_midrun_failure(ray_session, t1_tables, tmp_path):
    import sievedata.pipelines.validate as V
    from sievedata.pipelines.profile import build_profiles

    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(tmp_path / "profiles")
    )

    # clean run → ground truth
    clean = V.validate_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(tmp_path / "clean"), resume=False,
    )
    vio_clean = (
        pq.read_table(clean["violations"]).to_pandas()
        .sort_values(["partition_key", "doc_id", "reason_code", "detail"], kind="mergesort")
        .reset_index(drop=True)
    )

    # interrupted run: blow up the stage-2 checker on first call
    original = V._make_bucket_checker

    def exploding(cfg):
        def boom(df):
            raise RuntimeError("injected mid-run failure")

        return boom

    V._make_bucket_checker = exploding
    try:
        with pytest.raises(Exception):
            V.validate_documents(
                t1_tables["documents"], prof["profiles"], prof["media_bloom"],
                str(tmp_path / "killed"), resume=False,
            )
    finally:
        V._make_bucket_checker = original

    # stage 1 committed, stage 2 did not
    import os

    assert os.path.exists(str(tmp_path / "killed" / "checked" / "_SUCCESS"))
    assert not os.path.exists(str(tmp_path / "killed" / "violations" / "_SUCCESS"))

    # resume completes from the committed stage and matches the clean run
    resumed = V.validate_documents(
        t1_tables["documents"], prof["profiles"], prof["media_bloom"],
        str(tmp_path / "killed"), resume=True,
    )
    vio_resumed = (
        pq.read_table(resumed["violations"]).to_pandas()
        .sort_values(["partition_key", "doc_id", "reason_code", "detail"], kind="mergesort")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(vio_clean, vio_resumed)
    ver_clean = pq.read_table(clean["verdicts"]).to_pandas()
    ver_resumed = pq.read_table(resumed["verdicts"]).to_pandas()
    pd.testing.assert_frame_equal(ver_clean, ver_resumed)


def test_media_stub_behavior():
    from sievedata.functions.media import decode_media

    with pytest.raises(NotImplementedError):
        decode_media(b"payload", "image")
    f1 = decode_media(b"payload", "image", fake=True)
    f2 = decode_media(b"payload", "image", fake=True)
    np.testing.assert_array_equal(f1, f2)
    assert f1.shape == (16,) and f1.dtype == np.float32
    assert (decode_media(b"payload", "audio", fake=True) != f1).any()


def test_stage1_wave_checkpointing_mid_dataset_resume(ray_session, t1_tables, tmp_path):
    """stage1_waves > 1 partitions the input scan into atomically-committed
    waves: (a) wave output is identical to single-shot, (b) a run killed
    MID-STAGE-1 resumes from the last complete wave — committed wave dirs
    are skipped (not rewritten), and the final outputs match the clean run
    exactly (north_rule 'resumable from checkpoint ... mid-dataset')."""
    import os


    import sievedata.pipelines.validate as V
    from sievedata.pipelines.profile import build_profiles

    # shard the t1 documents table so waves have fragments to partition
    docs = pq.read_table(t1_tables["documents"])
    shards_dir = tmp_path / "documents_sharded"
    os.makedirs(shards_dir)
    n = docs.num_rows
    for i in range(4):
        pq.write_table(docs.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4),
                       str(shards_dir / f"part-{i}.parquet"))

    prof = build_profiles(
        t1_tables["baseline"], t1_tables["media_catalog"], str(tmp_path / "profiles"))

    def run(run_dir, resume, cfg=None):
        return V.validate_documents(
            str(shards_dir), prof["profiles"], prof["media_bloom"],
            str(run_dir), resume=resume, cfg=cfg)

    def vio(res):
        return (
            pq.read_table(res["violations"]).to_pandas()
            .sort_values(["partition_key", "doc_id", "reason_code", "detail"],
                         kind="mergesort")
            .reset_index(drop=True)
        )

    clean = run(tmp_path / "clean", resume=False)
    wavecfg = V.ValidateConfig(stage1_waves=3)

    # (a) waves == single-shot
    waved = run(tmp_path / "waved", resume=False, cfg=wavecfg)
    pd.testing.assert_frame_equal(vio(clean), vio(waved))
    wave_dirs = sorted(
        d for d in os.listdir(tmp_path / "waved" / "checked") if d.startswith("wave_"))
    assert wave_dirs == ["wave_0000", "wave_0001", "wave_0002"]

    # (b) kill mid-stage-1: first wave committed, rest not — inject the
    # failure in the DRIVER-side wave commit (worker processes import the
    # module fresh, so patching the parse UDF would never reach them)
    import contextlib

    killed_dir = tmp_path / "killed"
    original_commit = V.commit_dir
    calls = {"n": 0}

    @contextlib.contextmanager
    def exploding_commit(path):
        calls["n"] += 1
        if calls["n"] > 1:
            raise RuntimeError("injected mid-stage-1 failure")
        with original_commit(path) as tmp:
            yield tmp

    V.commit_dir = exploding_commit
    try:
        with pytest.raises(Exception):
            run(killed_dir, resume=False, cfg=wavecfg)
    finally:
        V.commit_dir = original_commit

    checked = killed_dir / "checked"
    assert not os.path.exists(checked / "_SUCCESS")  # stage 1 incomplete
    committed = [d for d in os.listdir(checked)
                 if d.startswith("wave_")
                 and os.path.exists(checked / d / "_SUCCESS")]
    assert committed, "at least one wave must have committed before the kill"
    mtimes = {d: os.path.getmtime(checked / d / "_SUCCESS") for d in committed}

    resumed = run(killed_dir, resume=True, cfg=wavecfg)
    pd.testing.assert_frame_equal(vio(clean), vio(resumed))
    for d, m in mtimes.items():  # committed waves were skipped, not redone
        assert os.path.getmtime(checked / d / "_SUCCESS") == m
    ver_clean = pq.read_table(clean["verdicts"]).to_pandas()
    ver_resumed = pq.read_table(resumed["verdicts"]).to_pandas()
    pd.testing.assert_frame_equal(ver_clean, ver_resumed)
