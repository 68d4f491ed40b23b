"""Rows-only queries (no SQL oracle) must still be DETERMINISTIC: two runs
in the same session produce identical results (the driver's weaker rows
check is meaningful only if outputs are stable)."""
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

ROWS_ONLY = ["lang_id", "fingerprint", "simhash", "minhash_near_dups",
             "simhash_near_dups", "media_features", "ann_ivf_topk"]


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
