"""Token-budget corpus sharding writer — the packaging step between
curation and tokenization: every document lands in the shard whose token
budget its exclusive prefix-sum falls in (q_token_shards semantics,
cited there), and the output is hive-partitioned parquet
(``shard=<k>/``) so a downstream trainer streams one shard directory at
a time and a failed run resumes past the committed output.

Scale shape: the global ordered prefix-sum is distributed exactly like
queries.q_token_shards — doc_id-range bins, per-bin token sums, a driver
prefix over ≤ 256 ints, per-bin local cumsum + offset; the write is one
partitioned ``write_parquet`` (no driver materialization, atomic via
pipelines/checkpoint.commit_dir).
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

from sievedata.pipelines.checkpoint import commit_dir, stage_done
from sievedata.sources.storage import read_documents


def shard_corpus(
    input_path: str,
    out_dir: str,
    budget: int = 100_000,
    resume: bool = True,
) -> dict:
    """Assign shards by token budget and write ``out_dir/shards/shard=K/``.

    Returns {"shards": path, "n_docs": int, "n_shards": int}.
    """
    from ray.data.aggregate import Max, Min, Sum

    from sievedata.queries import _token_counts

    shards_dir = os.path.join(out_dir, "shards")
    if resume and stage_done(shards_dir):
        import pyarrow.parquet as pq

        files = [os.path.join(r, f) for r, _, fs in os.walk(shards_dir)
                 for f in fs if f.endswith(".parquet")]
        n = sum(pq.read_metadata(f).num_rows for f in files)
        shard_names = {d for d in os.listdir(shards_dir) if d.startswith("shard=")}
        return {"shards": shards_dir, "n_docs": n, "n_shards": len(shard_names)}

    ds = read_documents(input_path)
    stats = ds.aggregate(Min("doc_id"), Max("doc_id"))
    if stats.get("min(doc_id)") is None:
        os.makedirs(shards_dir, exist_ok=True)
        with open(os.path.join(shards_dir, "_SUCCESS"), "w") as f:
            f.write("")
        return {"shards": shards_dir, "n_docs": 0, "n_shards": 0}
    lo, hi = int(stats["min(doc_id)"]), int(stats["max(doc_id)"])
    n_bins = 256
    width = max((hi - lo + 1 + n_bins - 1) // n_bins, 1)

    def tok_col(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        b = np.clip((ids - lo) // width, 0, n_bins - 1).astype(np.int64)
        t = t.append_column("tokens", pa.array(_token_counts(t["text"])))
        return t.append_column("bin", pa.array(b))

    rows = ds.map_batches(tok_col, batch_format="pyarrow")
    bin_sums = (
        rows.groupby("bin").aggregate(Sum("tokens", alias_name="t"))
        .to_pandas().sort_values("bin")
    )
    cum = np.concatenate([[0], np.cumsum(bin_sums["t"].to_numpy())[:-1]])
    offsets = {int(b): int(o) for b, o in zip(bin_sums["bin"], cum)}

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id", kind="mergesort")
        tok = df["tokens"].to_numpy().astype(np.int64)
        excl = offsets[int(df["bin"].iloc[0])] + np.cumsum(tok) - tok
        df = df.drop(columns=["bin"])
        df["shard"] = (excl // budget).astype(np.int64)
        return df

    # materialize once: count() on the lazy Dataset would re-execute the
    # whole tokenize+groupby pipeline a second time for the write below
    sharded = rows.groupby("bin").map_groups(
        assign, batch_format="pandas").materialize()
    n_docs = sharded.count()
    with commit_dir(shards_dir) as tmp:
        sharded.write_parquet(tmp, partition_cols=["shard"])
    shard_names = {d for d in os.listdir(shards_dir) if d.startswith("shard=")}
    return {"shards": shards_dir, "n_docs": int(n_docs),
            "n_shards": len(shard_names)}
