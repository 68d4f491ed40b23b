"""Token-budget corpus sharding writer: hive-partitioned output matches
the q_token_shards SQL assignment; committed output resumes."""
import os

import duckdb
import pandas as pd
import pyarrow.parquet as pq


def _collect(shards_dir: str) -> pd.DataFrame:
    frames = []
    for r, _, fs in os.walk(shards_dir):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            shard = int(os.path.basename(r).split("=", 1)[1])
            df = pq.read_table(os.path.join(r, f), columns=["doc_id"]).to_pandas()
            df["shard"] = shard
            frames.append(df)
    out = pd.concat(frames, ignore_index=True)
    out["shard"] = out["shard"].astype("int64")
    return out.sort_values("doc_id").reset_index(drop=True)


def test_shard_corpus_matches_oracle_and_resumes(ray_session, tmp_path):
    from sievedata.pipelines.shard import shard_corpus

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "sharded")
    res = shard_corpus(os.path.join(sf, "documents.parquet"), out,
                       budget=2000, resume=False)
    assert res["n_docs"] > 0 and res["n_shards"] >= 2

    con = duckdb.connect()
    con.sql(f"create view documents as select * from "
            f"read_parquet('{sf}/documents.parquet')")
    want = con.sql("""
        SELECT doc_id, CAST(COALESCE(sum(tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                // 2000 AS BIGINT) AS shard
        FROM (SELECT doc_id,
                     CAST(COALESCE(len(list_filter(string_split(text, ' '),
                                                   x -> x <> '')), 0)
                          AS BIGINT) AS tokens
              FROM documents)
    """).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(_collect(res["shards"]), want)

    # resume: committed output is reused, byte-identical listing
    before = sorted(os.path.join(r, f) for r, _, fs in os.walk(res["shards"])
                    for f in fs)
    res2 = shard_corpus(os.path.join(sf, "documents.parquet"), out,
                        budget=2000, resume=True)
    after = sorted(os.path.join(r, f) for r, _, fs in os.walk(res2["shards"])
                   for f in fs)
    assert before == after and res2["n_docs"] == res["n_docs"]
