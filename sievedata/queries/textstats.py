"""Text analysis (training-data pipeline family) — split from the single-file catalogue (round 5, pure
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

# Text analysis (training-data pipeline family)
# --------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    """Token/char/punct counting per document — all-integer outputs."""

    def stats(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import token_count_column

        text = t["text"].combine_chunks()
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_tokens = pc.cast(token_count_column(text), pa.int64())
        punct = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(text, r"[a-zA-Z0-9\s]", "")), pa.int64()
        )
        nonspace = pc.cast(
            pc.utf8_length(pc.replace_substring_regex(text, r"\s+", "")), pa.int64()
        )
        return pa.table(
            {"doc_id": t["doc_id"], "n_chars": n_chars, "n_tokens": n_tokens,
             "punct_count": punct, "n_nonspace": nonspace}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


def q_bpe_token_count(sf_dir: str):
    """BPE-ish pre-token counting (GPT-2 split pattern, ASCII variant) —
    the token-budget estimate a training-data pipeline runs before a real
    tokenizer; lookahead-free so the python and RE2/DuckDB engines agree
    exactly (functions/text.py::_BPE_RE)."""

    def stats(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import bpe_token_count_column

        return pa.table(
            {"doc_id": t["doc_id"],
             "n_bpe_tokens": bpe_token_count_column(t["text"].combine_chunks())}
        )

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pyarrow"
    )


SQL_BPE_TOKEN_COUNT = r"""
SELECT doc_id,
       coalesce(len(regexp_extract_all(text,
           '''(?:[sdmt]|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^ \t\n\f\ra-zA-Z0-9]+|[ \t\n\f\r]+'
       )), 0) AS n_bpe_tokens
FROM documents
"""


SQL_TOKEN_STATS = """
SELECT doc_id,
       length(text) AS n_chars,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS punct_count,
       length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace
FROM documents
"""


def q_quality_filter(sf_dir: str):
    """Quality-score gate: keep docs in a token-count band with no punct."""

    def keep(t: pa.Table) -> pa.Table:
        from sievedata.functions.text import token_count_column

        text = t["text"].combine_chunks()
        n_tokens = pc.cast(token_count_column(text), pa.int64())
        punct = pc.utf8_length(pc.replace_substring_regex(text, r"[a-zA-Z0-9\s]", ""))
        mask = pc.and_(
            pc.and_(pc.greater_equal(n_tokens, 40), pc.less_equal(n_tokens, 90)),
            pc.equal(punct, 0),
        )
        return pa.table({"doc_id": t["doc_id"]}).filter(mask)

    return _rp(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        keep, batch_format="pyarrow"
    )


SQL_QUALITY_FILTER = """
SELECT doc_id FROM documents
WHERE len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 40 AND 90
  AND length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) = 0
  AND trim(text) != ''
"""


# --------------------------------------------------------------------------
