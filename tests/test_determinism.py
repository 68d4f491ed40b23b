"""Rows-only queries (no SQL oracle) must still be DETERMINISTIC: two runs
in the same session produce identical results (the driver's weaker rows
check is meaningful only if outputs are stable)."""
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

ROWS_ONLY = ["lang_id", "fingerprint", "simhash", "minhash_near_dups",
             "simhash_near_dups", "media_features", "media_audio",
             "media_resize",
             "frame_sample", "ann_ivf_topk", "kmeans_clusters"]


def _canon(res) -> pd.DataFrame:
    import ray.data

    df = res.to_pandas() if isinstance(res, ray.data.Dataset) else pd.DataFrame(res)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_deterministic(ray_session, name):
    from sievedata.queries import queries

    fn = queries()[name]
    a = _canon(fn(SF))
    b = _canon(fn(SF))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_frame_sample_multiplicity(ray_session):
    """The 1→N frame explode emits exactly n_frames rows per media row."""
    import pyarrow.parquet as pq

    from sievedata.queries import queries

    n_docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    df = _canon(queries()["frame_sample"](SF))
    assert len(df) == 4 * n_docs
    assert set(df["frame_index"].astype(int)) == {0, 1, 2, 3}
