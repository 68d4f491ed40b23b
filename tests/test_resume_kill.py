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
