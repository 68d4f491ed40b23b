"""Similarity search over embeddings — split from the single-file catalogue (round 5, pure
mechanical move; see sievedata/queries/__init__.py for the contract)."""
from __future__ import annotations

import functools

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sievedata.kernels.normalize import desc_norm_array, invnum_norm_array
from sievedata.queries._shared import (_LUT_CACHE, _drop_empty_blocks,
                                       _join_parts, _rp)

# Similarity search over embeddings
# --------------------------------------------------------------------------

def q_ann_topk(sf_dir: str, k: int = 5, n_queries: int = 5):
    """Brute-force cosine top-k: broadcast query matrix, per-batch matmul,
    local top-k, final merge (functions/ann.py)."""
    import ray

    from sievedata.functions.ann import make_bruteforce_fn, merge_topk

    qdf = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .filter(lambda r: r["vec_id"] < n_queries)
        .to_pandas()
    )
    qids = qdf["vec_id"].to_numpy()
    qm = np.vstack([np.asarray(v, dtype=np.float64) for v in qdf["embedding"]])
    queries_ref = ray.put((qids, qm))

    cands = (
        _rp(sf_dir, "embeddings", ["vec_id", "embedding"])
        .map_batches(
            make_bruteforce_fn(queries_ref, k=k), batch_format="pyarrow",
        )
        .to_pandas()
    )
    cands = cands[cands["query_id"] != cands["neighbor_id"]]
    out = merge_topk(cands, k=k)
    return out[["query_id", "neighbor_id", "rank"]]


SQL_ANN_TOPK = """
SELECT query_id, neighbor_id, rank FROM (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         row_number() OVER (
           PARTITION BY q.vec_id
           ORDER BY list_cosine_similarity(q.embedding, c.embedding) DESC, c.vec_id
         ) AS rank
  FROM embeddings q CROSS JOIN embeddings c
  WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
) WHERE rank <= 5
"""


# --------------------------------------------------------------------------
