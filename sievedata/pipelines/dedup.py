"""Corpus-dedup pipeline: near-dup keep-list as a resumable parquet stage.

Composes the oracle-checked distributed stages (PPJoin exact-Jaccard edges
→ min-label connected components → per-component survivor selection,
sievedata/queries.py::q_dedup_corpus) behind the engine's resumable-output
contract: atomic ``commit_dir`` write + ``_SUCCESS`` marker, so a killed
run re-runs cleanly and a finished one is skipped byte-identically.
"""
from __future__ import annotations

import os

import pyarrow.parquet as pq

from sievedata.pipelines.checkpoint import commit_dir, stage_done


def dedup_corpus(input_dir: str, out_dir: str, resume: bool = True) -> dict:
    """Write the dedup keep-list (doc_id, group_size) for the documents
    table under ``input_dir`` to ``out_dir`` as partitioned parquet."""
    from sievedata.queries import q_dedup_corpus

    if resume and stage_done(out_dir):
        n = sum(
            pq.read_metadata(os.path.join(r, f)).num_rows
            for r, _, fs in os.walk(out_dir)
            for f in fs if f.endswith(".parquet")
        )
        return {"keep_list": out_dir, "n_survivors": n, "resumed": True}

    survivors = q_dedup_corpus(input_dir)
    with commit_dir(out_dir) as tmp:
        survivors.write_parquet(tmp)
    n = sum(
        pq.read_metadata(os.path.join(r, f)).num_rows
        for r, _, fs in os.walk(out_dir)
        for f in fs if f.endswith(".parquet")
    )
    return {"keep_list": out_dir, "n_survivors": n, "resumed": False}
