"""Validate pass: per-document + per-partition constraint checks.

Ray-Data-first layout (SURVEY.md §3.4 / §4.2), designed for 10^12-doc inputs:

Stage 1 (per-doc, embarrassingly parallel)
    read → map_batches(parse) → map_batches(PerDocChecks actor pool:
    profiles dict + media Bloom broadcast once via ray.put, loaded per actor
    in __init__) → narrow "checked" parquet intermediate (≈100 B/doc; spans
    dropped here — span preservation is proven by parse-stage tests, and the
    untouched input remains the system of record).

Stage 2 (blocked duplicate checks, one fine-grained shuffle)
    read checked (column-pruned) → explode into (partition_key, family,
    block_key) rows for the reference's blocking families
    (/root/reference/app/retrieval.py:22-29: invoice_number_norm, po_number,
    pdf_hash) → groupby(partition_key, family, block_key) → per-group
    deterministic dup rules.  Fine-grained keys mean no whole-vendor group
    ever materializes — hot-vendor skew (Zipf head) spreads across that
    vendor's many block keys; per-group pair scans are capped (BR-004's 200).

Stage 3 (per-partition aggregates: drift, uniqueness)
    read checked → mergeable partials per partition (exact drift-bin counts
    on the profile's stored edges, count, HLL registers) → groupby merge →
    verdicts vs broadcast profiles.  Only sketch bytes shuffle.  All
    aggregates are merge-order-insensitive (integer sums, register max), so
    verdict metrics are exactly reproducible run-to-run.

Stage 4 (assembly)
    violations = stage1 flags ∪ stage2 rows; verdicts per (partition, check);
    per-partition manifest with lineage + metrics.  Each stage commits
    atomically (write → rename + _SUCCESS), so a re-run resumes past
    completed stages (see pipelines/checkpoint.py).
"""
from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from sievedata.pipelines.checkpoint import SUCCESS as _SUCCESS_MARKER
from sievedata.pipelines.checkpoint import commit_dir, stage_done
from sievedata.schema import (
    CHECK_DRIFT,
    CHECK_STRUCTURE,
    CHECK_DUPLICATE,
    CHECK_RANGE,
    CHECK_REFERENTIAL,
    CHECK_SCHEMA,
    CHECK_UNIQUENESS,
    REASON_BANK_CHANGE,
    REASON_EXACT_INVNUM,
    REASON_MISSING_FIELD,
    REASON_PDF_NEAR_DUP,
    REASON_SAME_PO_NEAR_TOTAL,
    REASON_UNIT_PRICE_OUTLIER,
)
from sievedata.sketches import BloomFilter, HyperLogLog
from sievedata.sketches.drift import psi
from sievedata.sources.storage import read_documents
from sievedata.stages.parse import parse_documents_batch

CHECKED_COLUMNS = [
    "doc_id", "partition_key", "invnum_norm", "pdf_hash", "po_number",
    "total", "invoice_date", "missing_fields", "is_credit", "n_spans",
    "bank_change", "amount_z", "is_outlier", "eligible", "neartext_sig",
]


def _batch_line_texts(batch: pa.Table) -> pa.Array:
    """Per-doc normalized line text (space-joined desc_norm of '|'-encoded
    line spans) — the near-text similarity base, computed once in stage 1.

    Fully vectorized: line-span parents are non-decreasing (flatten preserves
    doc order), so per-doc offsets fall out of one searchsorted and the join
    is a single ``pc.binary_join`` over a rebuilt list array — no per-span
    python."""
    from sievedata.kernels.normalize import desc_norm_array

    n = batch.num_rows
    spans = batch.column("spans").combine_chunks()
    counts = np.diff(np.asarray(spans.offsets))
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    values = spans.flatten()
    kind = np.asarray(values.field("kind").to_numpy(zero_copy_only=False))
    line_mask = kind == "line"
    line_text = values.field("text").take(pa.array(np.flatnonzero(line_mask), pa.int64()))
    descs = desc_norm_array(pc.list_element(pc.split_pattern(line_text, "|"), 0))
    descs = pc.fill_null(descs, "")  # (d or "") in the old per-span loop
    offsets = np.searchsorted(parent[line_mask], np.arange(n + 1, dtype=np.int64))
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), descs)
    return pc.binary_join(lists, " ")  # empty list → "" like the old default


def _mat_to_fixed_bin(mat: np.ndarray) -> pa.Array:
    """(n, k) numeric matrix → fixed_size_binary(k·itemsize) column with no
    per-row python: one contiguous buffer, zero-copy into Arrow."""
    mat = np.ascontiguousarray(mat)
    width = mat.shape[1] * mat.itemsize
    return pa.Array.from_buffers(
        pa.binary(width), mat.shape[0], [None, pa.py_buffer(mat.tobytes())]
    )


def _fixed_bin_to_mat(col, dtype, n_cols: int) -> np.ndarray:
    """fixed_size_binary column → (n, n_cols) matrix, zero-copy off the
    Arrow data buffer (handles slice offsets; column has no nulls by
    construction)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    width = arr.type.byte_width
    data = np.frombuffer(arr.buffers()[1], dtype=np.uint8)
    start = arr.offset * width
    mat = data[start:start + len(arr) * width].view(dtype)
    return mat.reshape(len(arr), n_cols)


@dataclass
class ValidateConfig:
    z_threshold: float = 2.5
    po_pct_tol: float = 0.005
    po_window_days: int = 30
    # RR-003's Jaccard branch (app/rules.py:35-38): near-dup TEXT detection
    # via MinHash-LSH band blocking + exact shingle-Jaccard ≥ threshold;
    # pairs with EQUAL pdf_hash are left to the exact pdf family
    neartext: bool = True
    neartext_bands: int = 8
    neartext_jaccard: float = 0.9
    # two-pass band-group prefilter: pass A shuffles ONLY the 8-byte band
    # group hashes to find multi-doc groups (~2-10% of rows on real
    # corpora), pass B ships the 64 B signatures only for those rows —
    # cuts the dominant stage-2 shuffle ~5-10× with provably identical
    # output (the checker drops singleton groups anyway)
    neartext_prefilter: bool = True
    n_mix_buckets: int = 512
    # driver-side cap for the multi-group hash set (8 B each); above it the
    # filter falls back to a distributed join on the mix column
    broadcast_max_rows: int = 4_000_000
    psi_threshold: float = 0.2
    # sampling-noise floor: E[PSI] ≈ (B−1)(1/n_cur + 1/n_base) under H0
    # (chi-square approximation), so small partitions use an elevated
    # threshold psi_noise_factor × that instead of flakily failing
    psi_noise_factor: float = 4.0
    uniqueness_min_ratio: float = 0.9
    pair_scan_cap: int = 200  # BR-004 candidate cap (requirements.md:99)
    # dup-check shuffle granularity: block rows are hash-bucketed on the full
    # (partition, family, block_key) so one map_groups call handles a whole
    # bucket vectorized (≈4×cores buckets) instead of one python UDF call per
    # micro-group; bucket membership is deterministic, results identical
    n_dup_buckets: int = 128
    # intra-stage (mid-dataset) checkpointing for stage 1: the input's
    # parquet fragments are partitioned into this many deterministic waves,
    # each committed atomically — a killed run resumes from the last
    # complete wave instead of restarting the whole scan.  1 (default) =
    # single-shot, which is what the single-node benchmarks measure; at
    # 100 TB pick waves so one wave is minutes of work (each wave is its
    # own Dataset job, ~1-2 s fixed overhead).  Non-parquet or single-file
    # inputs fall back to single-shot.
    stage1_waves: int = 1
    # persist a per-run dup-group index (group_index/: one row per
    # (checked fragment, distinct 64-bit group hash)) so a later
    # incremental run reads only the history fragments whose groups the
    # delta actually touches, instead of scanning the whole checked
    # history per delta.  Costs one extra narrow read of the checked
    # intermediate at write time; not part of the config-equality contract
    # (it changes I/O, never output).
    group_index: bool = True


class PerDocChecks:
    """Actor-pool stage: profile lookup + Bloom probe + range z, vectorized.

    State (profiles dict, Bloom filter) is fetched from the object store once
    per actor in ``__init__`` — the reference's per-process model-singleton
    pattern (app/duplicate_model.py:60-71) re-expressed as a Ray actor pool.
    """

    def __init__(self, profiles_ref, bloom_ref, z_threshold: float = 2.5):
        import ray

        prof = ray.get(profiles_ref) if not isinstance(profiles_ref, dict) else profiles_ref
        self.mean = {k: v[0] for k, v in prof.items()}
        self.std = {k: v[1] for k, v in prof.items()}
        self.count = {k: v[2] for k, v in prof.items()}
        bloom_bytes = ray.get(bloom_ref) if isinstance(bloom_ref, ray.ObjectRef) else bloom_ref
        self.bloom = BloomFilter.from_bytes(bloom_bytes)
        self.z_threshold = z_threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        pk = batch.column("partition_key").to_numpy(zero_copy_only=False)
        total = np.nan_to_num(
            batch.column("total").to_numpy(zero_copy_only=False).astype(np.float64)
        )
        missing = batch.column("missing_fields").to_numpy(zero_copy_only=False) != ""
        credit = batch.column("is_credit").to_numpy(zero_copy_only=False).astype(bool)
        eligible = (~missing) & (~credit)

        # factorize: one python dict lookup per DISTINCT vendor in the batch
        uniq, inv = np.unique(pk, return_inverse=True)
        mean = np.array([self.mean.get(k, 0.0) for k in uniq])[inv]
        std = np.array([self.std.get(k, 0.0) for k in uniq])[inv]
        cnt = np.array([self.count.get(k, 0) for k in uniq])[inv]
        has_prof = np.array([k in self.mean for k in uniq])[inv]

        dev = np.abs(total - mean)
        z = np.where(
            has_prof & (std > 0.0),
            dev / np.where(std > 0.0, std, 1.0),
            np.where(has_prof & (cnt > 10), dev / np.maximum(np.abs(mean), 1.0), 0.0),
        )
        is_outlier = eligible & (z >= self.z_threshold)

        media_ref = batch.column("media_ref").combine_chunks()
        in_catalog = self.bloom.contains(media_ref)
        has_ref = ~np.asarray(pc.is_null(media_ref).to_numpy(zero_copy_only=False))
        bank_change = (~missing) & has_ref & (~in_catalog)

        out = batch.select(
            [
                "doc_id", "partition_key", "invnum_norm", "pdf_hash", "po_number",
                "total", "invoice_date", "missing_fields", "is_credit",
            ]
        )
        n_spans = pc.cast(pc.list_value_length(batch.column("spans")), pa.int64())
        out = out.append_column("n_spans", n_spans)
        out = out.append_column("bank_change", pa.array(bank_change))
        out = out.append_column("amount_z", pa.array(z))
        out = out.append_column("is_outlier", pa.array(is_outlier))
        out = out.append_column("eligible", pa.array(eligible))
        # MinHash signature over the normalized line text, truncated to
        # 8-bit slots (b-bit minwise hashing, Li & König 2010 — 64 B/doc
        # instead of 512), the near-text index column: computed ONCE here so
        # stage 2's near-text pass reads only the narrow intermediate (no
        # second parse of the wide spans input).  Banding AND verification
        # both operate on the truncated slots (oracle identically).  At 64
        # slots the unrelated-pair agreement floor is ~1/256 per slot vs the
        # 0.9 verify threshold, and the Jaccard estimator bias is
        # (1−J)/256 ≤ 0.004 — the signature was 76% of the checked
        # intermediate's bytes (incompressible), so b=8 halves stage-1
        # write volume and the stage-2 band-row shuffle.
        from sievedata.functions.dedup import minhash_signature_batch

        sigs = minhash_signature_batch(_batch_line_texts(batch))
        sig8 = (sigs & np.uint64(0xFF)).astype(np.uint8)
        out = out.append_column("neartext_sig", _mat_to_fixed_bin(sig8))
        return out


_PDC_CACHE: dict = {}


def _make_per_doc_checks_fn(profiles_ref, bloom_ref, z_threshold: float):
    """Stage-1 per-doc checks as a plain task function with per-worker state
    caching: ray.get + Bloom decode happen once per worker process (module
    global keyed by the object refs), so tasks reuse Ray's warm worker pool
    instead of paying actor-pool process spin-up.  Same semantics as the
    PerDocChecks actor class (used where long-lived heavy state warrants a
    real pool)."""

    def check(batch: pa.Table) -> pa.Table:
        key = (profiles_ref.hex(), bloom_ref.hex(), z_threshold)
        state = _PDC_CACHE.get(key)
        if state is None:
            state = PerDocChecks(profiles_ref, bloom_ref, z_threshold)
            _PDC_CACHE.clear()  # one live profile set per worker
            _PDC_CACHE[key] = state
        return state(batch)

    return check


_EMPTY_VIOLATIONS_TABLE = pa.table({
    "partition_key": pa.array([], pa.string()),
    "doc_id": pa.array([], pa.string()),
    "reason_code": pa.array([], pa.string()),
    "detail": pa.array([], pa.string()),
})


def _per_doc_violations(batch: pa.Table) -> pa.Table:
    """Vectorized per-doc violation rows from stage-1 flags."""
    pk = batch.column("partition_key").to_numpy(zero_copy_only=False)
    doc = batch.column("doc_id").to_numpy(zero_copy_only=False)
    missing = batch.column("missing_fields").to_numpy(zero_copy_only=False)
    bank = batch.column("bank_change").to_numpy(zero_copy_only=False).astype(bool)
    outl = batch.column("is_outlier").to_numpy(zero_copy_only=False).astype(bool)
    z = batch.column("amount_z").to_numpy(zero_copy_only=False)
    pdf = batch.column("pdf_hash").to_numpy(zero_copy_only=False)

    pks, docs, codes, details = [], [], [], []
    for i in np.flatnonzero(missing != ""):
        pks.append(pk[i]); docs.append(doc[i])
        codes.append(REASON_MISSING_FIELD)
        details.append(f"missing={missing[i]}")
    for i in np.flatnonzero(bank):
        pks.append(pk[i]); docs.append(doc[i])
        codes.append(REASON_BANK_CHANGE)
        details.append(f"media_ref=media://{pdf[i]}")
    for i in np.flatnonzero(outl):
        pks.append(pk[i]); docs.append(doc[i])
        codes.append(REASON_UNIT_PRICE_OUTLIER)
        details.append(f"z={z[i]:.6f}")
    return pa.table(
        {
            "partition_key": pa.array(pks, pa.string()),
            "doc_id": pa.array(docs, pa.string()),
            "reason_code": pa.array(codes, pa.string()),
            "detail": pa.array(details, pa.string()),
        }
    )


_BLOCK_FIELDS = {
    "partition_key": pa.string(),
    "family": pa.string(),
    "block_key": pa.string(),
    "doc_id": pa.string(),
    "total": pa.float64(),
    "invoice_date": pa.date32(),
    "bucket": pa.int64(),
    "reason_code": pa.string(),
    "detail": pa.string(),
}
_EMPTY_BLOCKS = pa.table({k: pa.array([], t) for k, t in _BLOCK_FIELDS.items()})


_BLOCK_FAMILIES = (("invnum", "invnum_norm"), ("pdf", "pdf_hash"), ("po", "po_number"))


def _family_mixes(elig: pa.Table, family: str, key_col: str):
    """(sub_table, mix) for one blocking family: rows with a non-null key and
    the 64-bit hash of the full (partition_key ␟ family ␟ key) group key —
    the shuffle bucket source AND the prefilter dedup key."""
    from sievedata.sketches.hashing import hash64

    keys = elig.column(key_col)
    sub = elig.filter(pc.invert(pc.is_null(keys)))
    if sub.num_rows == 0:
        return sub, np.empty(0, np.uint64)
    combined = pc.binary_join_element_wise(
        sub.column("partition_key").cast(pa.string()),
        pa.scalar(family),
        sub.column(key_col).cast(pa.string()),
        "\x1f",
    )
    return sub, hash64(combined.combine_chunks(), seed=31)


def _probe_multis(mix: np.ndarray, multis: np.ndarray) -> np.ndarray:
    """Membership mask of each (64-bit) mix in the sorted 32-bit multi-group
    hash set.  The prefilter ships TRUNCATED hashes: a truncation collision
    can only turn a singleton group into a false 'multi' (its rows ship and
    the checker drops them — dup rules need ≥2 docs in the EXACT group), it
    can never hide a true multi, so output is identical and pass A costs
    4 B/key instead of 8."""
    if not multis.size or not mix.size:
        return np.zeros(len(mix), dtype=bool)
    mix32 = mix.astype(np.uint32)  # low 32 bits, matching pass A
    pos = np.searchsorted(multis, mix32)
    return (pos < len(multis)) & (multis[np.minimum(pos, len(multis) - 1)] == mix32)


def _make_explode_blocks(n_buckets: int, multis_ref=None, emit_viol: bool = True):
    def explode(batch: pa.Table) -> pa.Table:
        """Emit (partition_key, family, block_key, bucket) rows for the dup
        families — the reference's blocking keys (app/retrieval.py:22-29) —
        PLUS pass-through per-doc violation rows (family="viol", computed
        from stage-1 flags), so one read + one shuffle serves both paths.
        With ``multis_ref`` (the prefilter's multi-doc group hash set), rows
        of globally-singleton block groups are dropped BEFORE the shuffle —
        the bucket checker ignores them anyway (dup rules need ≥2 docs)."""
        import ray

        from sievedata.sketches.hashing import hash64

        multis = ray.get(multis_ref) if multis_ref is not None else None
        outs = []
        viol = _per_doc_violations(batch) if emit_viol else _EMPTY_VIOLATIONS_TABLE
        if viol.num_rows:
            vb = (hash64(viol.column("doc_id").combine_chunks(), seed=31)
                  % np.uint64(n_buckets)).astype(np.int64)
            outs.append(
                pa.table(
                    {
                        "partition_key": viol.column("partition_key"),
                        "family": pa.array(["viol"] * viol.num_rows, pa.string()),
                        "block_key": pa.array([""] * viol.num_rows, pa.string()),
                        "doc_id": viol.column("doc_id"),
                        "total": pa.nulls(viol.num_rows, pa.float64()),
                        "invoice_date": pa.nulls(viol.num_rows, pa.date32()),
                        "bucket": pa.array(vb),
                        "reason_code": viol.column("reason_code"),
                        "detail": viol.column("detail"),
                    }
                )
            )
        mask = pc.and_(
            pc.equal(batch.column("missing_fields"), ""),
            pc.invert(batch.column("is_credit")),
        )
        elig = batch.filter(mask)
        if elig.num_rows == 0:
            return pa.concat_tables(outs) if outs else _EMPTY_BLOCKS
        for family, key_col in _BLOCK_FAMILIES:
            sub, mix = _family_mixes(elig, family, key_col)
            if multis is not None and sub.num_rows:
                keep = _probe_multis(mix, multis)
                sub = sub.filter(pa.array(keep))
                mix = mix[keep]
            if sub.num_rows == 0:
                continue
            bucket = (mix % np.uint64(n_buckets)).astype(np.int64)
            outs.append(
                pa.table(
                    {
                        "partition_key": sub.column("partition_key"),
                        "family": pa.array([family] * sub.num_rows, pa.string()),
                        "block_key": sub.column(key_col).cast(pa.string()),
                        "doc_id": sub.column("doc_id"),
                        "total": sub.column("total"),
                        "invoice_date": sub.column("invoice_date"),
                        "bucket": pa.array(bucket),
                        "reason_code": pa.nulls(sub.num_rows, pa.string()),
                        "detail": pa.nulls(sub.num_rows, pa.string()),
                    }
                )
            )
        return pa.concat_tables(outs) if outs else _EMPTY_BLOCKS

    return explode


def _make_bucket_checker(cfg: ValidateConfig):
    pct_tol = cfg.po_pct_tol
    window = cfg.po_window_days
    cap = cfg.pair_scan_cap

    def check_bucket(df: pd.DataFrame) -> pd.DataFrame:
        """Vectorized within-bucket duplicate rules (RR-001/002/003).

        One bucket holds MANY (partition, family, block_key) groups; the
        exact-key families are handled with pandas groupby transforms (no
        per-group python), the po near-total family falls back to a python
        pair scan over only the (rare) multi-doc po groups.  Doc order inside
        a block = doc_id ascending; every doc beyond the first is the flagged
        one (the reference flags the *new* invoice; doc_id order is our
        deterministic arrival order).
        """
        if not len(df):
            return _EMPTY_VIOLATIONS_DF
        passthrough = df[df["family"] == "viol"]
        df = df[df["family"] != "viol"]
        pre = []
        if len(passthrough):
            pre.append(
                passthrough[["partition_key", "doc_id", "reason_code", "detail"]]
                .reset_index(drop=True)
            )
        if not len(df):
            return pd.concat(pre, ignore_index=True) if pre else _EMPTY_VIOLATIONS_DF
        df = df.sort_values(
            ["partition_key", "family", "block_key", "doc_id"], kind="mergesort"
        ).reset_index(drop=True)
        grp = df.groupby(["partition_key", "family", "block_key"], sort=False)
        first = grp["doc_id"].transform("first")
        size = grp["doc_id"].transform("size")
        dup = (size >= 2) & (df["doc_id"] != first)

        frames = pre
        for family, code, label in (
            ("invnum", REASON_EXACT_INVNUM, "invnum_norm"),
            ("pdf", REASON_PDF_NEAR_DUP, "pdf_hash"),
        ):
            sel = df[dup & (df["family"] == family)]
            if len(sel):
                frames.append(
                    pd.DataFrame(
                        {
                            "partition_key": sel["partition_key"].to_numpy(),
                            "doc_id": sel["doc_id"].to_numpy(),
                            "reason_code": code,
                            "detail": (
                                label + "=" + sel["block_key"] + ";first=" + first[sel.index]
                            ).to_numpy(),
                        }
                    )
                )

        po = df[(df["family"] == "po") & (size >= 2)]
        if len(po):
            rows: list[tuple[str, str, str, str]] = []
            # convert dates ONCE per bucket (day ints), then one vectorized
            # pair matrix per group: first earlier doc within the scan window
            # matching |Δtotal| ≤ tol ∧ gap ≤ window days
            po_days = (
                pd.to_datetime(po["invoice_date"]).to_numpy().astype("datetime64[D]").astype(np.int64)
            )
            po_totals = po["total"].to_numpy(dtype=float)
            po_ids = po["doc_id"].to_numpy()
            po_pk = po["partition_key"].to_numpy()
            po_key = po["block_key"].to_numpy()
            grp_codes = (
                po.groupby(["partition_key", "block_key"], sort=False).ngroup().to_numpy()
            )
            boundaries = np.flatnonzero(np.diff(grp_codes)) + 1
            starts = np.concatenate([[0], boundaries])
            ends = np.concatenate([boundaries, [len(po)]])
            for s, e in zip(starts, ends):
                n = e - s
                if n < 2:
                    continue
                t = po_totals[s:e]
                d = po_days[s:e]
                tol = pct_tol * np.maximum(np.abs(t), 1.0)
                ii = np.arange(n)
                # chunk rows to bound the n×n matrices on degenerate groups
                for c0 in range(0, n, 1024):
                    c1 = min(c0 + 1024, n)
                    M = (
                        (np.abs(t[c0:c1, None] - t[None, :]) <= tol[c0:c1, None])
                        & (np.abs(d[c0:c1, None] - d[None, :]) <= window)
                        & (ii[None, :] < ii[c0:c1, None])
                        & (ii[None, :] >= ii[c0:c1, None] - cap)
                    )
                    hit = M.any(axis=1)
                    first = M.argmax(axis=1)
                    for off in np.flatnonzero(hit):
                        j = s + c0 + off
                        i = s + first[off]
                        rows.append(
                            (po_pk[j], po_ids[j], REASON_SAME_PO_NEAR_TOTAL,
                             f"po={po_key[j]};match={po_ids[i]}")
                        )
            if rows:
                frames.append(
                    pd.DataFrame(rows, columns=["partition_key", "doc_id", "reason_code", "detail"])
                )
        if not frames:
            return _EMPTY_VIOLATIONS_DF
        return pd.concat(frames, ignore_index=True)

    return check_bucket


_EMPTY_VIOLATIONS_DF = pd.DataFrame(
    {"partition_key": pd.Series(dtype=str), "doc_id": pd.Series(dtype=str),
     "reason_code": pd.Series(dtype=str), "detail": pd.Series(dtype=str)}
)


# ---- near-text duplicate detection (RR-003 Jaccard branch) ----------------

def _make_neartext_rows(n_buckets: int, bands: int):
    """Checked rows → MinHash band rows (narrow read; the signature was
    computed in stage 1 and stored in the intermediate).  Each eligible doc
    explodes into ``bands`` rows of (partition, band block_key, doc_id,
    pdf_hash, signature).

    Verification downstream is MinHash-signature slot agreement — RR-003's
    own formulation ("MinHash signatures shall approximate shingle
    Jaccard", architecture.md:188): identical texts still give exactly 1.0.
    The stored signature is already TRUNCATED to 8-bit slots (b-bit
    minwise hashing, Li & König 2010): 64 B instead of 512 B per doc in
    the intermediate AND per band row — 4× less read + shuffle volume for
    a per-slot false-agreement rate of 2⁻¹⁶.  Banding mixes the truncated
    slots, and the pure-python oracle bands + verifies identically; the
    column is fixed_size_binary so encode/decode is one buffer view, no
    per-row python.
    """

    def fn(batch: pa.Table, multis_ref=None) -> pa.Table:
        import ray

        elig = batch.filter(batch.column("eligible"))
        n = elig.num_rows
        if n == 0:
            return pa.table(
                {"partition_key": pa.array([], pa.string()),
                 "band_id": pa.array([], pa.int32()),
                 "band_hash": pa.array([], pa.int64()),
                 "doc_id": pa.array([], pa.string()),
                 "pdf_hash": pa.array([], pa.string()),
                 "sig": pa.array([], pa.binary(64)),
                 "bucket": pa.array([], pa.int64())}
            )

        sig_col = elig.column("neartext_sig").combine_chunks()
        pk_col = elig.column("partition_key").combine_chunks()
        band_ids, band_hashes, mix = _band_mixes(sig_col, pk_col, bands)
        idx = np.tile(np.arange(n, dtype=np.int64), bands)
        if multis_ref is not None:
            # keep only rows whose exact band group has ≥2 docs globally
            # (singleton groups are dropped by the checker anyway): a mix
            # collision can only KEEP an extra row, never lose one — the
            # checker still groups by the exact (pk, band, hash) triple
            keep = _probe_multis(mix, ray.get(multis_ref))
            if not keep.any():
                return fn(batch.slice(0, 0))
            band_ids, band_hashes, mix = band_ids[keep], band_hashes[keep], mix[keep]
            idx = idx[keep]
        take = pa.array(idx)
        bucket = (mix % np.uint64(n_buckets)).astype(np.int64)
        return pa.table(
            {
                "partition_key": pk_col.take(take),
                "band_id": pa.array(band_ids),
                "band_hash": pa.array(band_hashes.view(np.int64)),
                "doc_id": elig.column("doc_id").take(take),
                "pdf_hash": elig.column("pdf_hash").take(take),
                "sig": sig_col.take(take),
                "bucket": pa.array(bucket),
            }
        )

    return fn


def _band_mixes(sig_col: pa.Array, pk_col: pa.Array, bands: int):
    """Shared banding: (band_ids, band_hashes, mix) band-major; ``mix`` is
    the 64-bit hash of the full (partition_key, band_id, band_hash) group
    key — the shuffle bucket source AND the prefilter dedup key."""
    from sievedata.functions.dedup import lsh_band_arrays
    from sievedata.sketches.hashing import hash64

    sig8 = _fixed_bin_to_mat(sig_col, np.uint8, 64)
    # band on the truncated slots (u64 view so the FNV mix matches the
    # oracle's lsh_band_rows over the same truncated values)
    band_ids, band_hashes = lsh_band_arrays(sig8.astype(np.uint64), bands=bands)
    pk_h = np.tile(hash64(pk_col, seed=43), bands)
    with np.errstate(over="ignore"):
        mix = (band_hashes * np.uint64(31) + band_ids.astype(np.uint64)) ^ pk_h
    return band_ids, band_hashes, mix


def _make_stage2_mix_partials(cfg: "ValidateConfig"):
    """Pass A of the stage-2 prefilter, fused over ALL dup-group keyings
    (the three exact block families + the neartext LSH bands): per-batch
    distinct group-hash partials — 16 bytes/row instead of the ~100-190 B
    block/band rows, and templated corpora collapse within the batch
    already.  One read of the checked intermediate serves every family."""

    def fn(batch: pa.Table) -> pa.Table:
        elig = batch.filter(batch.column("eligible"))
        if elig.num_rows == 0:
            return pa.table({"mix": pa.array([], pa.int32()),
                             "mbucket": pa.array([], pa.int16())})
        mixes = [np.empty(0, np.uint64)]
        for family, key_col in _BLOCK_FAMILIES:
            _, m = _family_mixes(elig, family, key_col)
            mixes.append(m)
        if cfg.neartext:
            _, _, m = _band_mixes(
                elig.column("neartext_sig").combine_chunks(),
                elig.column("partition_key").combine_chunks(),
                cfg.neartext_bands)
            mixes.append(m)
        # truncate to 32 bits BEFORE the local count: a truncation collision
        # only creates a false 'multi' (safe — see _probe_multis), never
        # hides one, and halves the dominant pass-A shuffle column
        u, c = np.unique(
            np.concatenate(mixes).astype(np.uint32), return_counts=True)
        # count column elided from the shuffle: emit each distinct mix once,
        # and each within-batch multi (c ≥ 2) a second time, so a global ROW
        # count ≥ 2 ⇔ a global DOC count ≥ 2 — exact, same fixpoint.
        # 6 B/row (int32 mix + int16 bucket) vs round 2's 16
        out = np.concatenate([u, u[c >= 2]])
        return pa.table({
            "mix": pa.array(out.view(np.int32)),
            "mbucket": pa.array((out % np.uint32(cfg.n_mix_buckets)).astype(np.int16)),
        })

    return fn


def _multi_mixes(group: pd.DataFrame) -> pd.DataFrame:
    """Per mix-bucket: band-group hashes whose global doc count is ≥ 2
    (each partial row is one batch-distinct occurrence; local multis were
    emitted twice, so row count ≥ 2 is exactly doc count ≥ 2)."""
    if not len(group):
        return pd.DataFrame({"mix": pd.Series(dtype="int32")})
    mix = group["mix"].to_numpy()
    u, tot = np.unique(mix, return_counts=True)
    return pd.DataFrame({"mix": u[tot >= 2].astype(np.int32)})


def _distinct_mix64(elig: pa.Table, cfg: "ValidateConfig") -> np.ndarray:
    """Sorted distinct 64-bit group hashes of an eligible-row table across
    ALL dup-group keyings (three exact block families + neartext bands) —
    the UNtruncated form of what `_make_stage2_mix_partials` ships.  Used
    for the persistent group index, where exact 64-bit hashes keep the
    false-touch rate negligible (a 32-bit index would mark essentially
    every history fragment touched by birthday collisions alone)."""
    mixes = [np.empty(0, np.uint64)]
    for family, key_col in _BLOCK_FAMILIES:
        _, m = _family_mixes(elig, family, key_col)
        mixes.append(m)
    if cfg.neartext:
        _, _, m = _band_mixes(
            elig.column("neartext_sig").combine_chunks(),
            elig.column("partition_key").combine_chunks(),
            cfg.neartext_bands)
        mixes.append(m)
    return np.unique(np.concatenate(mixes))


_EMPTY_GROUP_INDEX = pa.table({"file": pa.array([], pa.string()),
                               "mix": pa.array([], pa.int64())})


def _make_group_index_partials(cfg: "ValidateConfig", base_dir: str):
    """(fragment relpath, distinct 64-bit group hash) rows for the per-run
    group index.  Rows carry `path` from read_parquet(include_paths=True);
    one batch is normally one fragment, but the kernel handles mixed
    batches.  Per-batch distinct only — cross-batch duplicates just make
    the index marginally larger, the probe dedups files anyway."""

    def fn(batch: pa.Table) -> pa.Table:
        elig = batch.filter(batch.column("eligible"))
        if elig.num_rows == 0:
            return _EMPTY_GROUP_INDEX
        paths = elig.column("path").to_numpy(zero_copy_only=False)
        files_out, mixes_out = [], []
        for p in np.unique(paths):
            sub = elig.filter(pa.array(paths == p))
            m = _distinct_mix64(sub, cfg)
            rel = os.path.relpath(str(p), base_dir)
            files_out.append(np.full(len(m), rel, dtype=object))
            mixes_out.append(m)
        return pa.table({
            "file": pa.array(np.concatenate(files_out).astype(str)),
            "mix": pa.array(np.concatenate(mixes_out).view(np.int64)),
        })

    return fn


def _make_index_probe(probe_ref):
    """map_batches UDF over a group index: files containing any probed
    64-bit group hash (sorted-array membership, distinct per batch)."""

    def fn(t: pa.Table) -> pa.Table:
        import ray

        probe = ray.get(probe_ref)
        m = t.column("mix").to_numpy(zero_copy_only=False).view(np.uint64)
        if not probe.size or not m.size:
            return pa.table({"file": pa.array([], pa.string())})
        pos = np.clip(np.searchsorted(probe, m), 0, probe.size - 1)
        f = t.column("file").to_numpy(zero_copy_only=False)[probe[pos] == m]
        return pa.table({"file": pa.array(np.unique(f).astype(str))})

    return fn


def _mix_columns(cfg: "ValidateConfig") -> list[str]:
    cols = ["partition_key", "eligible", "invnum_norm", "pdf_hash",
            "po_number"]
    if cfg.neartext:
        cols.append("neartext_sig")
    return cols


def _group_index_dir(checked_dir: str) -> str:
    return os.path.join(os.path.dirname(checked_dir), "group_index")


def _build_group_index(checked_dir: str, group_index_dir: str,
                       cfg: "ValidateConfig") -> None:
    """Write the dup-group index for a checked layout: one row per
    (fragment, distinct 64-bit group hash), from one narrow include_paths
    read.  Empty layouts (empty incremental delta) commit an empty index."""
    import ray.data as rd

    gi_files = _list_parquet_files(checked_dir)
    with commit_dir(group_index_dir) as tmp:
        if gi_files:
            (rd.read_parquet(gi_files, columns=_mix_columns(cfg),
                             include_paths=True)
             .map_batches(_make_group_index_partials(cfg, checked_dir),
                          batch_format="pyarrow")
             .write_parquet(tmp))
        else:
            pq.write_table(_EMPTY_GROUP_INDEX,
                           os.path.join(tmp, "part-0.parquet"))


def compact_validate_runs(prev_run_dir: str, out_dir: str,
                          cfg: "ValidateConfig | None" = None,
                          resume: bool = True) -> dict:
    """Compact an incremental validate CHAIN into one base run dir.

    Each delta run appends its checked/ + group_index/ to the chain; after
    K deltas the dup checks read K checked layouts and probe K indexes.
    This op rewrites the chain's checked fragments as ONE layout (pure
    fragment-parallel columnar copy — no document re-parsed), rebuilds one
    group index over it, and carries forward the latest run's CUMULATIVE
    partials.parquet / vio_counts.parquet / verdicts.parquet and lineage
    (input_files already spans the whole chain).  The result serves as
    ``prev_run_dir`` for later deltas with identical output."""
    import shutil

    import ray.data as rd

    cfg = cfg or ValidateConfig()
    with open(os.path.join(prev_run_dir, "manifest.json")) as f:
        prev_manifest = json.load(f)
    lin = prev_manifest.get("lineage", {})
    chain = list(lin.get("checked_dirs", []))
    if not chain:
        raise ValueError("previous run has no checked chain to compact")
    prev_cfg = lin.get("config", {})
    cur_cfg = {
        "z_threshold": cfg.z_threshold, "po_pct_tol": cfg.po_pct_tol,
        "po_window_days": cfg.po_window_days,
        "psi_threshold": cfg.psi_threshold,
        "uniqueness_min_ratio": cfg.uniqueness_min_ratio,
        "neartext": cfg.neartext, "neartext_bands": cfg.neartext_bands,
    }
    if set(prev_cfg) < set(cur_cfg):
        cur_cfg = {k: v for k, v in cur_cfg.items() if k in prev_cfg}
    if prev_cfg != cur_cfg:
        raise ValueError(
            f"compact config mismatch vs chain: {prev_cfg} != {cur_cfg}")

    os.makedirs(out_dir, exist_ok=True)
    checked_dir = os.path.join(out_dir, "checked")
    files = [f for d in chain for f in _list_parquet_files(d)]
    if not (resume and stage_done(checked_dir)):
        with commit_dir(checked_dir) as tmp:
            rd.read_parquet(files).write_parquet(
                tmp, arrow_parquet_args_fn=lambda: {"compression": "lz4"})
    gi_dir = _group_index_dir(checked_dir)
    if not (resume and stage_done(gi_dir)):
        _build_group_index(checked_dir, gi_dir, cfg)
    # the latest run's reduced artifacts are already chain-cumulative
    for art in ("partials.parquet", "vio_counts.parquet",
                "verdicts.parquet"):
        shutil.copyfile(os.path.join(prev_run_dir, art),
                        os.path.join(out_dir, art))
    manifest = dict(prev_manifest)
    manifest["lineage"] = {**lin, "checked_dirs": [checked_dir],
                           "compacted_from": chain,
                           "prev_run_dir": prev_run_dir}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return {"checked": checked_dir, "group_index": gi_dir,
            "manifest": os.path.join(out_dir, "manifest.json"),
            "n_source_dirs": len(chain)}


def _prune_history_files(
    prev_checked_dirs: list[str], delta_checked_dir: str,
    cfg: "ValidateConfig",
) -> tuple[list[str], dict]:
    """History fragments an incremental run must scan for the dup checks,
    pruned via the previous runs' persisted group indexes: a fragment is
    read only if its index lists a 64-bit group hash the delta's docs
    touch (exact hashes → no false negatives; a hash collision only reads
    an extra fragment whose rows the exact checker then drops).  Runs
    without an index (older engine versions, group_index=False) fall back
    to a full scan of that run's fragments.  Returns (files, stats)."""
    import ray
    import ray.data as rd

    all_files = {d: _list_parquet_files(d) for d in prev_checked_dirs}
    total = sum(len(v) for v in all_files.values())
    indexed = [d for d in prev_checked_dirs
               if stage_done(_group_index_dir(d))]
    stats = {"total_fragments": total, "indexed_runs": len(indexed),
             "runs": len(prev_checked_dirs)}
    if not indexed:
        return [f for d in prev_checked_dirs for f in all_files[d]], stats

    # 64-bit probe set from the (small) delta's checked fragments
    delta_files = _list_parquet_files(delta_checked_dir)
    probe = np.empty(0, np.uint64)
    if delta_files:
        parts = (
            rd.read_parquet(delta_files, columns=_mix_columns(cfg))
            .map_batches(
                lambda t, _c=cfg: pa.table({"mix": pa.array(
                    _distinct_mix64(t.filter(t.column("eligible")), _c)
                    .view(np.int64))}),
                batch_format="pyarrow")
            .materialize()
        )
        if parts.count() > cfg.broadcast_max_rows:
            # delta ≈ corpus: the probe wouldn't prune anything material
            stats["pruned"] = False
            return [f for d in prev_checked_dirs for f in all_files[d]], stats
        mix_np = parts.to_pandas()["mix"].to_numpy()
        probe = (np.unique(mix_np.view(np.uint64)) if len(mix_np)
                 else np.empty(0, np.uint64))
    probe_ref = ray.put(probe)

    out: list[str] = []
    for d in prev_checked_dirs:
        if d not in indexed:
            out.extend(all_files[d])
            continue
        hits = (
            rd.read_parquet(_group_index_dir(d))
            .map_batches(_make_index_probe(probe_ref), batch_format="pyarrow")
            .to_pandas()
        )
        # an all-empty result loses its column schema through to_pandas
        touched = (set(hits["file"].astype(str))
                   if "file" in hits.columns else set())
        out.extend(f for f in all_files[d]
                   if os.path.relpath(f, d) in touched)
    stats["pruned"] = True
    stats["scanned_fragments"] = len(out)
    return out, stats


def _make_neartext_checker(cfg: ValidateConfig):
    cap = cfg.pair_scan_cap
    thresh = cfg.neartext_jaccard

    def check(df: pd.DataFrame) -> pd.DataFrame:
        """Per (partition, band) group: MinHash-estimated Jaccard (slot
        agreement fraction, vectorized against all earlier members at once),
        flag the later doc with its lowest matching earlier doc.  Emits
        (pk, doc_id, match_id, jaccard); global per-doc min-match dedup
        happens in a second doc-keyed shuffle."""
        rows: list[tuple[str, str, str, float]] = []
        if not len(df):
            return _EMPTY_NEARTEXT_DF
        # drop singleton groups VECTORIZED before any per-group work: python
        # group iteration costs ~0.3 ms/group and singletons are ~95% of
        # groups; then dedupe/sort/cap once over the whole bucket and walk
        # groups by numpy boundary slices (the check_bucket po-path idiom)
        grp_cols = ["partition_key", "band_id", "band_hash"]
        sizes = df.groupby(grp_cols, sort=False)["doc_id"].transform("size")
        df = df[sizes >= 2]
        if not len(df):
            return _EMPTY_NEARTEXT_DF
        df = df.drop_duplicates(grp_cols + ["doc_id"]).sort_values(
            grp_cols + ["doc_id"], kind="mergesort"
        )
        df = df[df.groupby(grp_cols, sort=False).cumcount() < cap]
        codes = df.groupby(grp_cols, sort=False).ngroup().to_numpy()
        ids = df["doc_id"].to_numpy()
        pks = df["partition_key"].to_numpy()
        pdfs = df["pdf_hash"].to_numpy()
        sig = np.frombuffer(b"".join(df["sig"]), dtype=np.uint8).reshape(len(df), -1)
        boundaries = np.flatnonzero(np.diff(codes)) + 1
        starts = np.concatenate([[0], boundaries])
        ends = np.concatenate([boundaries, [len(df)]])
        for s, e in zip(starts, ends):
            m = e - s
            if m < 2:
                continue
            sg = sig[s:e]
            gp = pdfs[s:e]
            if (sg[1:] == sg[0]).all():
                # identical-signature fast path: templated corpora saturate
                # band groups with est=1.0 members — O(m) instead of O(m²·64)
                for j in range(1, m):
                    if gp[j] is not None and gp[j] == gp[0]:
                        i = next((i for i in range(1, j) if gp[i] != gp[j]), None)
                        if i is not None:
                            rows.append((pks[s + j], ids[s + j], ids[s + i], 1.0))
                    else:
                        rows.append((pks[s + j], ids[s + j], ids[s], 1.0))
                continue
            for j in range(1, m):
                est = (sg[:j] == sg[j]).mean(axis=1)
                ok = est >= thresh
                if gp[j] is not None:
                    ok &= ~(gp[:j] == gp[j])  # exact pdf family flags these
                hits = np.flatnonzero(ok)
                if hits.size:
                    i = int(hits[0])
                    rows.append((pks[s + j], ids[s + j], ids[s + i], float(est[i])))
        if not rows:
            return _EMPTY_NEARTEXT_DF
        return pd.DataFrame(rows, columns=["partition_key", "doc_id", "match_id", "jaccard"])

    return check


_EMPTY_NEARTEXT_DF = pd.DataFrame(
    {"partition_key": pd.Series(dtype=str), "doc_id": pd.Series(dtype=str),
     "match_id": pd.Series(dtype=str), "jaccard": pd.Series(dtype=float)}
)


def _neartext_dedup(df: pd.DataFrame) -> pd.DataFrame:
    """Per-doc global dedup (a pair collides in many bands): keep the
    lowest match_id, format the violation row."""
    if not len(df):
        return _EMPTY_VIOLATIONS_DF
    df = df.sort_values(["doc_id", "match_id"], kind="mergesort")
    keep = df.groupby("doc_id", sort=False).head(1)
    return pd.DataFrame(
        {
            "partition_key": keep["partition_key"].to_numpy(),
            "doc_id": keep["doc_id"].to_numpy(),
            "reason_code": REASON_PDF_NEAR_DUP,
            "detail": [
                f"jaccard={j:.6f};match={m}"
                for j, m in zip(keep["jaccard"], keep["match_id"])
            ],
        }
    )


# ---- fused stage-2 pass (one read, one bucket shuffle, one write) ---------

_S2_FIELDS: list[tuple[str, pa.DataType]] = [
    ("partition_key", pa.string()), ("family", pa.string()),
    ("block_key", pa.string()), ("doc_id", pa.string()),
    ("total", pa.float64()), ("invoice_date", pa.date32()),
    ("bucket", pa.int64()), ("reason_code", pa.string()),
    ("detail", pa.string()), ("band_id", pa.int32()),
    ("band_hash", pa.int64()), ("pdf_hash", pa.string()),
    # VARIABLE binary: fixed_size_binary nulls allocate the full 64 B body
    # per row, so block rows would pay 64 B of zeros each through the
    # shuffle; variable-width nulls cost one offset
    ("sig", pa.binary()),
]


def _pad_s2(t: pa.Table) -> pa.Table:
    cols = {}
    for name, typ in _S2_FIELDS:
        if name in t.column_names:
            col = t.column(name)
            cols[name] = col if col.type == typ else col.cast(typ)
        else:
            cols[name] = pa.nulls(t.num_rows, typ)
    return pa.table(cols)


def _make_stage2_rows(cfg: "ValidateConfig", multis_ref, emit_viol: bool = True):
    """One batch → union of prefiltered block-family rows, per-doc violation
    passthrough rows (``emit_viol`` — disabled for the history side of an
    incremental run, whose stage-1 violations were already emitted), and
    (if enabled) prefiltered neartext band rows — a single superset schema
    so one shuffle serves every dup family."""
    explode = _make_explode_blocks(cfg.n_dup_buckets, multis_ref, emit_viol)
    band_rows = _make_neartext_rows(cfg.n_dup_buckets, cfg.neartext_bands)

    def fn(batch: pa.Table) -> pa.Table:
        outs = [_pad_s2(explode(batch))]
        if cfg.neartext:
            nt = band_rows(batch, multis_ref)
            if nt.num_rows:
                nt = nt.append_column(
                    "family", pa.array(["neartext"] * nt.num_rows, pa.string()))
                outs.append(_pad_s2(nt))
        return pa.concat_tables(outs)

    return fn


_S2_OUT_COLS = ["partition_key", "doc_id", "reason_code", "detail",
                "match_id", "jaccard", "kind", "doc_bucket"]
_EMPTY_S2_OUT = pd.DataFrame({
    **{c: pd.Series(dtype=str) for c in
       ("partition_key", "doc_id", "reason_code", "detail", "match_id", "kind")},
    "jaccard": pd.Series(dtype=float),
    "doc_bucket": pd.Series(dtype="int64"),
})[_S2_OUT_COLS]


def _make_stage2_checker(cfg: "ValidateConfig"):
    """Bucket dispatch: block families through the dup-rule checker (final
    violation rows), band rows through the neartext checker (candidate
    matches needing a doc-keyed min-dedup) — tagged into one schema with the
    doc bucket for the next shuffle."""
    bucket_checker = _make_bucket_checker(cfg)
    nt_checker = _make_neartext_checker(cfg)
    n_buckets = cfg.n_dup_buckets

    def check(df: pd.DataFrame) -> pd.DataFrame:
        from sievedata.sketches.hashing import hash64

        if not len(df):
            return _EMPTY_S2_OUT
        is_nt = df["family"] == "neartext"
        frames = []
        blocks = df[~is_nt]
        if len(blocks):
            v = bucket_checker(blocks)
            if len(v):
                frames.append(v.assign(match_id=None, jaccard=np.nan, kind="viol"))
        nt = df[is_nt]
        if len(nt):
            c = nt_checker(nt)
            if len(c):
                frames.append(c.assign(reason_code=None, detail=None, kind="nt"))
        if not frames:
            return _EMPTY_S2_OUT
        out = pd.concat(frames, ignore_index=True)
        out["doc_bucket"] = (
            hash64(out["doc_id"].tolist(), seed=59) % np.uint64(n_buckets)
        ).astype(np.int64)
        return out[_S2_OUT_COLS]

    return check


def _stage2_final(df: pd.DataFrame) -> pd.DataFrame:
    """Doc-bucket stage: block violations pass through; neartext candidates
    collapse to their per-doc lowest match (a pair collides in many bands)."""
    if not len(df):
        return _EMPTY_VIOLATIONS_DF
    frames = []
    viol = df[df["kind"] == "viol"]
    if len(viol):
        frames.append(viol[["partition_key", "doc_id", "reason_code", "detail"]])
    nt = df[df["kind"] == "nt"]
    if len(nt):
        frames.append(_neartext_dedup(
            nt[["partition_key", "doc_id", "match_id", "jaccard"]]))
    if not frames:
        return _EMPTY_VIOLATIONS_DF
    return pd.concat(frames, ignore_index=True)


def _pin_violation_schema(t: pa.Table) -> pa.Table:
    """Empty pandas groups arrive with Arrow type null — pin to string."""
    return pa.table({
        c: t[c].cast(pa.string())
        for c in ("partition_key", "doc_id", "reason_code", "detail")
    })


# violation reason → the §2 check family its count verdict rolls into
_CHECK_OF_REASON = {
    REASON_MISSING_FIELD: CHECK_SCHEMA,
    REASON_EXACT_INVNUM: CHECK_DUPLICATE,
    REASON_PDF_NEAR_DUP: CHECK_DUPLICATE,
    REASON_SAME_PO_NEAR_TOTAL: CHECK_DUPLICATE,
    REASON_BANK_CHANGE: CHECK_REFERENTIAL,
    REASON_UNIT_PRICE_OUTLIER: CHECK_RANGE,
}
_COUNT_CHECKS = [CHECK_SCHEMA, CHECK_DUPLICATE, CHECK_REFERENTIAL, CHECK_RANGE]


def _pad_count_cols(t: pa.Table) -> pa.Table:
    """Pad a partials table with neutral count columns so it unions with
    the violation-count partial rows in stage 3's single groupby."""
    t = t.append_column("reason_code", pa.array([""] * t.num_rows, pa.string()))
    return t.append_column(
        "vcount", pa.array(np.zeros(t.num_rows, np.int64)))


def _vio_count_partials(t: pa.Table) -> pa.Table:
    """Per-batch (partition, reason) violation counts shaped as stage-3
    union rows: the sketch columns are neutral (0 / [] / b'') so the sums
    and register merges in the finalizer ignore them."""
    df = t.select(["partition_key", "reason_code"]).to_pandas()
    g = (df.groupby(["partition_key", "reason_code"], sort=False)
         .size().reset_index(name="vcount"))
    n = len(g)
    return pa.table({
        "partition_key": pa.array(g["partition_key"].astype(str), pa.string()),
        "n_docs": pa.array(np.zeros(n, np.int64)),
        "n_eligible": pa.array(np.zeros(n, np.int64)),
        "bin_counts": pa.array([[]] * n, pa.list_(pa.int64())),
        "span_sum": pa.array(np.zeros(n, np.int64)),
        "hll_doc_id": pa.array([b""] * n, pa.binary()),
        "hll_invnum": pa.array([b""] * n, pa.binary()),
        "reason_code": pa.array(g["reason_code"].astype(str), pa.string()),
        "vcount": pa.array(g["vcount"].to_numpy().astype(np.int64)),
    })


def _partition_partials(batch: pa.Table, edges_by_pk: dict[str, np.ndarray]) -> pa.Table:
    """Mergeable per-partition aggregates for drift + uniqueness + counts."""
    pk = np.asarray(batch.column("partition_key").to_numpy(zero_copy_only=False))
    total = np.nan_to_num(batch.column("total").to_numpy(zero_copy_only=False).astype(np.float64))
    eligible = batch.column("eligible").to_numpy(zero_copy_only=False).astype(bool)
    n_spans = batch.column("n_spans").to_numpy(zero_copy_only=False).astype(np.int64)
    doc_id = batch.column("doc_id").combine_chunks()
    invnum = batch.column("invnum_norm").combine_chunks()

    keys, n_docs, n_elig, bins, hll_doc, hll_inv, span_sums = [], [], [], [], [], [], []
    # one sort instead of a per-key mask over the whole batch (the
    # _span_kind_counts idiom): group rows = order[bounds[g]:bounds[g+1]],
    # ascending original index within each group (stable argsort), so every
    # per-group value is bit-identical to the old flatnonzero path
    uniq, inv = np.unique(pk, return_inverse=True)
    order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    for gi, key in enumerate(uniq):
        idx_all = order[bounds[gi]:bounds[gi + 1]]
        idx_e = idx_all[eligible[idx_all]]
        edges = edges_by_pk.get(str(key))
        if edges is not None and idx_e.size:
            binned = np.searchsorted(edges, total[idx_e], side="right")
            c = np.bincount(binned, minlength=len(edges) + 1).astype(np.int64)
        else:
            c = np.zeros(0, dtype=np.int64)
        idx = pa.array(idx_e, pa.int64())
        keys.append(str(key))
        n_docs.append(int(idx_all.size))
        n_elig.append(int(idx_e.size))
        bins.append(c.tolist())
        span_sums.append(int(n_spans[idx_e].sum()))
        # sparse partials: ~3 B per touched register instead of the 4 KB
        # dense image — the stage-3 shuffle is partials × partitions-sized
        hll_doc.append(HyperLogLog.sparse_partial(doc_id.take(idx)))
        hll_inv.append(HyperLogLog.sparse_partial(invnum.take(idx)))
    return pa.table(
        {
            "partition_key": pa.array(keys, pa.string()),
            "n_docs": pa.array(n_docs, pa.int64()),
            "n_eligible": pa.array(n_elig, pa.int64()),
            "bin_counts": pa.array(bins, pa.list_(pa.int64())),
            "span_sum": pa.array(span_sums, pa.int64()),
            "hll_doc_id": pa.array(hll_doc, pa.binary()),
            "hll_invnum": pa.array(hll_inv, pa.binary()),
        }
    )


def _make_partition_finalizer(profile_map: dict, cfg: ValidateConfig):
    """Per-partition verdicts PLUS one combined mergeable-partial row
    (row_kind='partial', same layout as ``_partition_partials`` output) —
    the partial row is persisted as ``partials.parquet`` so a later
    incremental run can merge new partials on top without re-reading
    history.  Emitting both from the one groupby keeps stage 3 at a single
    shuffle; combining is the exact work the verdict math does anyway
    (integer sums, register max), so verdicts are bit-identical whether
    finalize sees raw partials, the persisted combined row, or a mix.

    Round 5: the violation-COUNT verdicts (schema/duplicate/referential/
    range) ride the SAME groupby — stage 2's violations enter the union as
    (partition, reason, vcount) partial rows, and finalize emits their
    per-check verdict rows plus row_kind='vio_count' rows (persisted as
    vio_counts.parquet for the incremental chain).  The old stage 4 — a
    separate driver-side violations read + pandas pivot — is gone; one
    shuffle produces every verdict."""

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        vio = g[g["reason_code"] != ""]
        g = g[g["reason_code"] == ""]
        if not len(g):  # defensive: counts for a partition with no partials
            g = vio.head(1).assign(
                n_docs=0, n_eligible=0, span_sum=0,
                bin_counts=[[]], hll_doc_id=b"", hll_invnum=b"")
        key = g["partition_key"].iloc[0]
        n_docs = int(g["n_docs"].sum())
        n_elig = int(g["n_eligible"].sum())
        h_doc = HyperLogLog()
        h_inv = HyperLogLog()
        for b in g["hll_doc_id"]:
            h_doc.merge_sparse(b)
        for b in g["hll_invnum"]:
            h_inv.merge_sparse(b)
        lens = [len(b) for b in g["bin_counts"]]
        max_len = max(lens) if lens else 0
        cur_counts = np.zeros(max_len, dtype=np.int64)
        for b in g["bin_counts"]:
            if len(b):
                cur_counts += np.asarray(b, dtype=np.int64)

        prof = profile_map.get(key)
        rows = []
        # drift verdict (adaptive threshold = max(base, noise floor))
        if prof is None or not len(prof["bin_fracs"]) or cur_counts.sum() == 0:
            rows.append((key, CHECK_DRIFT, True, n_docs, 0, 0.0, "no_profile"))
        else:
            cur_frac = cur_counts / cur_counts.sum()
            val = psi(np.asarray(prof["bin_fracs"]), cur_frac)
            n_base = max(int(prof["sample_count"]), 1)
            n_cur = max(int(cur_counts.sum()), 1)
            noise = cfg.psi_noise_factor * (len(cur_frac) - 1) * (1.0 / n_cur + 1.0 / n_base)
            thresh = max(cfg.psi_threshold, noise)
            # binned two-sample KS: sup |cum(profile) − cum(current)| on the
            # stored bin edges — exact from integer counts on both sides
            ks = float(np.abs(
                np.cumsum(np.asarray(prof["bin_fracs"])) - np.cumsum(cur_frac)
            ).max())
            rows.append(
                (key, CHECK_DRIFT, bool(val <= thresh), n_docs, 0, float(val),
                 f"threshold={thresh:.6f};ks={ks:.6f}")
            )
        # structure verdict: avg spans/doc vs the profile's span-kind
        # histogram expectation (exact integer sums → bit-identical metric)
        span_sum = int(g["span_sum"].sum())
        if prof is None or not prof.get("span_total") or n_elig == 0:
            rows.append((key, CHECK_STRUCTURE, True, n_docs, 0, 0.0, "no_profile"))
        else:
            cur_avg = span_sum / n_elig
            exp_avg = prof["span_total"] / max(prof["sample_count"], 1)
            ratio = cur_avg / exp_avg if exp_avg else 1.0
            rows.append(
                (key, CHECK_STRUCTURE, bool(0.9 <= ratio <= 1.1), n_docs, 0,
                 float(cur_avg), f"expected={exp_avg:.6f}")
            )
        # uniqueness verdict (doc_id approximate-distinct ratio)
        est = h_doc.cardinality()
        ratio = est / n_elig if n_elig else 1.0
        rows.append(
            (key, CHECK_UNIQUENESS, bool(ratio >= cfg.uniqueness_min_ratio),
             n_docs, 0, float(ratio), f"hll_invnum={h_inv.cardinality():.1f}")
        )
        # violation-count verdicts: per-reason sums rolled into their §2
        # check family (exactly the old stage-4 pivot, now in-shuffle)
        vc = (vio.groupby("reason_code", sort=False)["vcount"].sum()
              if len(vio) else pd.Series(dtype="int64"))
        per_check = {c: 0 for c in _COUNT_CHECKS}
        for rc_, n_ in vc.items():
            per_check[_CHECK_OF_REASON[rc_]] += int(n_)
        for c in _COUNT_CHECKS:
            rows.append((key, c, per_check[c] == 0, n_docs,
                         int(per_check[c]), float(per_check[c]), ""))

        out = pd.DataFrame(
            rows,
            columns=["partition_key", "check_name", "passed", "n_docs",
                     "n_violations", "metric", "detail"],
        )
        out["row_kind"] = "verdict"
        out["n_eligible"] = 0
        out["bin_counts"] = [[]] * len(out)
        out["span_sum"] = 0
        out["hll_doc_id"] = b""
        out["hll_invnum"] = b""
        partial = pd.DataFrame([{
            "partition_key": key, "check_name": "", "passed": True,
            "n_docs": n_docs, "n_violations": 0, "metric": 0.0, "detail": "",
            "row_kind": "partial", "n_eligible": n_elig,
            "bin_counts": cur_counts.tolist(), "span_sum": span_sum,
            "hll_doc_id": h_doc.to_sparse(), "hll_invnum": h_inv.to_sparse(),
        }])
        out = pd.concat([out, partial], ignore_index=True)
        out["reason_code"] = ""
        out["vcount"] = 0
        if len(vc):
            vrows = vc.reset_index().rename(columns={"vcount": "vcount"})
            vio_out = pd.DataFrame({
                "partition_key": key, "check_name": "", "passed": True,
                "n_docs": 0, "n_violations": 0, "metric": 0.0, "detail": "",
                "row_kind": "vio_count", "n_eligible": 0,
                "span_sum": 0, "hll_doc_id": b"", "hll_invnum": b"",
                "reason_code": vrows["reason_code"],
                "vcount": vrows["vcount"].astype("int64"),
            })
            vio_out["bin_counts"] = [[]] * len(vio_out)
            out = pd.concat([out, vio_out], ignore_index=True)
        return out

    return finalize


def _stage1_wave_files(path: str, waves: int) -> list[list[str]] | None:
    """Partition a parquet directory's fragments into ``waves`` deterministic
    round-robin groups for intra-stage checkpointing.  None means
    single-shot: waves ≤ 1, a single-file input, or a non-parquet backend
    (jsonl/csv/lance inputs take the one-commit path).  Local-FS listing;
    an object-store deployment would list fragments via ``pyarrow.fs`` the
    same way."""
    if waves <= 1 or not os.path.isdir(path):
        return None
    files = sorted(
        os.path.join(r, f)
        for r, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    if len(files) < 2:
        return None
    waves = min(waves, len(files))
    return [files[i::waves] for i in range(waves)]


def _list_parquet_files(path: str) -> list[str]:
    """Sorted parquet fragments of a directory input (or the file itself)."""
    if os.path.isdir(path):
        return sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(path)
            for f in fs if f.endswith(".parquet")
        )
    return [path]


def validate_documents(
    documents_path: str,
    profiles_path: str,
    media_bloom_path: str,
    run_dir: str,
    cfg: ValidateConfig | None = None,
    resume: bool = True,
    prev_run_dir: str | None = None,
) -> dict:
    """Run the full validate pass; returns paths + summary.

    Outputs under ``run_dir``: checked/ (narrow per-doc intermediate),
    violations/ (parquet), verdicts.parquet, partials.parquet (combined
    mergeable per-partition sketches), vio_counts.parquet, manifest.json.

    With ``prev_run_dir``, runs an INCREMENTAL (append-only delta) pass:
    only input fragments not listed in the previous run's manifest go
    through stage 1; duplicate checks read history pruned to the groups the
    new docs touch (the stage-2a mix filter with the NEW docs' group hashes
    as the probe set — a false 32-bit collision only ships extra rows, the
    checker stays exact); drift/uniqueness verdicts merge the previous
    run's persisted partials with the delta's (integer sums + HLL register
    max — bit-identical to a full run); violation counts add.  The
    equivalence contract (tested): with doc_ids append-ordered, the
    incremental run's violations are exactly the full run's violations on
    the new docs, and its verdicts/manifest equal the full run's
    bit-for-bit.  This run's ``violations/`` holds the DELTA only; the
    manifest's ``checked_dirs`` chain locates history.
    """
    import time

    import ray

    cfg = cfg or ValidateConfig()
    timings: dict[str, float] = {}
    t_last = time.perf_counter()

    # ---- incremental setup ------------------------------------------------
    inc = prev_run_dir is not None
    prev_checked_dirs: list[str] = []
    new_files: list[str] | None = None
    prev_manifest: dict = {}
    all_rel_files: list[str] = []
    if inc:
        with open(os.path.join(prev_run_dir, "manifest.json")) as f:
            prev_manifest = json.load(f)
        lin = prev_manifest.get("lineage", {})
        if "input_files" not in lin:
            raise ValueError(
                "incremental validate needs a previous run whose manifest "
                "records lineage.input_files (re-run the base once with this "
                "engine version)")
        prev_cfg = lin.get("config", {})
        cur_cfg = {
            "z_threshold": cfg.z_threshold, "po_pct_tol": cfg.po_pct_tol,
            "po_window_days": cfg.po_window_days,
            "psi_threshold": cfg.psi_threshold,
            "uniqueness_min_ratio": cfg.uniqueness_min_ratio,
            # the dup-group hashes persisted in checked/ + group_index/
            # (neartext bands) must line up across the chain
            "neartext": cfg.neartext,
            "neartext_bands": cfg.neartext_bands,
        }
        # manifests from engine versions before these keys existed recorded
        # the 5-key dict; compare on the shared keys (banding then defaults
        # to the dataclass values those runs used)
        if set(prev_cfg) < set(cur_cfg):
            cur_cfg = {k: v for k, v in cur_cfg.items() if k in prev_cfg}
        if prev_cfg != cur_cfg:
            raise ValueError(
                f"incremental validate config mismatch vs previous run: "
                f"{prev_cfg} != {cur_cfg}")
        prev_files = set(lin["input_files"])
        cur_files = _list_parquet_files(documents_path)
        rel = {os.path.relpath(f, documents_path): f for f in cur_files}
        missing = prev_files - set(rel)
        if missing:
            raise ValueError(
                f"append-only contract broken: {len(missing)} previous input "
                f"fragments vanished, e.g. {sorted(missing)[:3]}")
        new_files = [rel[r] for r in sorted(set(rel) - prev_files)]
        all_rel_files = sorted(set(rel))
        prev_checked_dirs = list(lin.get("checked_dirs", []))
    elif os.path.isdir(documents_path):
        all_rel_files = sorted(
            os.path.relpath(f, documents_path)
            for f in _list_parquet_files(documents_path)
        )
    elif documents_path.endswith(".parquet"):
        # single-file input: relpath(f, f) would record the useless '.'
        all_rel_files = [os.path.basename(documents_path)]
    else:
        all_rel_files = []

    def _mark(name: str) -> None:
        nonlocal t_last
        now = time.perf_counter()
        timings[name] = round(now - t_last, 3)
        t_last = now

    os.makedirs(run_dir, exist_ok=True)
    checked_dir = os.path.join(run_dir, "checked")
    violations_dir = os.path.join(run_dir, "violations")
    verdicts_path = os.path.join(run_dir, "verdicts.parquet")
    manifest_path = os.path.join(run_dir, "manifest.json")

    prof_df = pq.read_table(profiles_path).to_pandas()
    if inc:
        if not os.path.isdir(documents_path):
            raise ValueError(
                "incremental validate requires a parquet DIRECTORY input "
                "(append-only fragments)")
        prev_pv = prev_manifest.get("lineage", {}).get("profile_version")
        cur_pv = str(prof_df["profile_version"].iloc[0]) if len(prof_df) else None
        if prev_pv != cur_pv:
            raise ValueError(
                f"incremental validate profile mismatch: previous run used "
                f"profile_version={prev_pv}, current profiles are {cur_pv} — "
                f"drift-bin edges must be identical for partial merges; "
                f"run a full validate instead")
    profile_stats = {
        r["partition_key"]: (float(r["mean_total"]), float(r["std_total"]), int(r["sample_count"]))
        for _, r in prof_df.iterrows()
    }
    edges_by_pk = {
        r["partition_key"]: np.asarray(r["bin_edges"], dtype=np.float64)
        for _, r in prof_df.iterrows()
    }
    import json as _json

    profile_map = {
        r["partition_key"]: {
            "bin_fracs": np.asarray(r["bin_fracs"], dtype=np.float64),
            "sample_count": int(r["sample_count"]),
            "span_total": sum(_json.loads(r["span_kind_histogram"]).values())
            if isinstance(r.get("span_kind_histogram"), str) else 0,
        }
        for _, r in prof_df.iterrows()
    }
    with open(media_bloom_path, "rb") as f:
        bloom_bytes = f.read()

    # Stage 1: parse + per-doc checks → narrow intermediate.  Actor-pool size
    # scales with the cluster so this stage never caps below the CPU count.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    if not (resume and stage_done(checked_dir)):
        profiles_ref = ray.put(profile_stats)
        bloom_ref = ray.put(bloom_bytes)
        checks_fn = _make_per_doc_checks_fn(profiles_ref, bloom_ref, cfg.z_threshold)

        def _parse_and_check(batch: pa.Table) -> pa.Table:
            # parse + checks fused in ONE UDF: a second map_batches boundary
            # re-batches the WIDE parse output (spans/text still attached),
            # and that slice/concat of nested list<struct> blocks measured
            # 2-3× the whole stage's CPU (914-1424 vs 443 core-s at 32
            # procs) — the narrow checked table must be the first thing that
            # crosses a block boundary.
            return checks_fn(parse_documents_batch(batch))

        if inc:
            # incremental: only the delta fragments go through stage 1
            waves = (None if cfg.stage1_waves <= 1 or len(new_files) < 2
                     else [new_files[i::min(cfg.stage1_waves, len(new_files))]
                           for i in range(min(cfg.stage1_waves, len(new_files)))])
        else:
            waves = _stage1_wave_files(documents_path, cfg.stage1_waves)
        if inc and not new_files:
            # nothing new: commit an empty checked stage (no fragment — the
            # chain skips it) so resume/chain bookkeeping stays uniform
            os.makedirs(checked_dir, exist_ok=True)
            with open(os.path.join(checked_dir, _SUCCESS_MARKER), "w") as f:
                f.write("")
        elif waves is None:
            import ray.data as rd

            src = rd.read_parquet(new_files) if inc else read_documents(documents_path)
            checked = src.map_batches(
                _parse_and_check, batch_format="pyarrow")
            with commit_dir(checked_dir) as tmp:
                # NO min_rows_per_file here: write-side file coalescing fuses
                # with the map stages and collapses the WHOLE stage to
                # ceil(rows/min_rows) tasks (measured: 3 tasks on 32 cores —
                # this, not bandwidth, capped round-1 validate scaling).  File
                # granularity at scale comes from upstream block sizing.
                # lz4 for the INTERNAL intermediate: ~same size as snappy at
                # ~2× the encode speed (the 64 B/doc signature column is
                # incompressible; the stage is write-bound at high core counts)
                checked.write_parquet(
                    tmp, arrow_parquet_args_fn=lambda: {"compression": "lz4"})
        else:
            # mid-dataset checkpointing: each wave of input fragments is a
            # separate atomically-committed sub-stage; on resume, committed
            # waves are skipped and only the interrupted tail re-runs.
            # Downstream stages read checked_dir recursively, so the wave
            # layout is invisible to them.
            import shutil as _shutil

            import ray.data as rd

            if not resume and os.path.exists(checked_dir):
                _shutil.rmtree(checked_dir)
            os.makedirs(checked_dir, exist_ok=True)
            for i, wave in enumerate(waves):
                wdir = os.path.join(checked_dir, f"wave_{i:04d}")
                if stage_done(wdir):
                    continue  # committed by the interrupted run
                wchecked = rd.read_parquet(wave).map_batches(
                    _parse_and_check, batch_format="pyarrow")
                with commit_dir(wdir) as tmp:
                    wchecked.write_parquet(
                        tmp, arrow_parquet_args_fn=lambda: {"compression": "lz4"})
            with open(os.path.join(checked_dir, _SUCCESS_MARKER), "w") as f:
                f.write("")
    _mark("stage1_checked")

    # Stage 1b: persist the dup-group index (fragment → distinct 64-bit
    # group hashes, ~8 B per doc-keying).  A later incremental run probes
    # this instead of scanning the whole checked history: O(index) bytes
    # ≈ 3% of the wide checked columns, and only touched fragments are
    # then read at all.  One extra narrow read of this run's checked
    # fragments, embarrassingly parallel, no shuffle.
    group_index_dir = _group_index_dir(checked_dir)
    if cfg.group_index and not (resume and stage_done(group_index_dir)):
        _build_group_index(checked_dir, group_index_dir, cfg)
    if cfg.group_index:
        _mark("stage1b_group_index")

    # Stages 2 and 3 both read the narrow intermediate (column-pruned).
    # They run SEQUENTIALLY: two concurrently-executing Datasets contend for
    # the same CPU pool and thrash (measured 2× slower than back-to-back).
    checked_chain = prev_checked_dirs + ([checked_dir] if not inc or new_files else [])

    def _stage2_violations() -> None:
        import ray.data as rd

        if resume and stage_done(violations_dir):
            return
        if inc and not new_files:
            with commit_dir(violations_dir) as tmp:  # empty delta
                pq.write_table(pa.table({
                    "partition_key": pa.array([], pa.string()),
                    "doc_id": pa.array([], pa.string()),
                    "reason_code": pa.array([], pa.string()),
                    "detail": pa.array([], pa.string()),
                }), os.path.join(tmp, "part-0.parquet"))
            _mark("stage2a_prefilter")
            return
        if inc:
            # incremental pass A: the probe set is EVERY distinct group hash
            # of the NEW docs (not just multis — a singleton new doc may
            # collide with history); pass B then reads the whole checked
            # chain but ships only rows whose group the delta touches.
            mix_cols = ["partition_key", "eligible", "invnum_norm",
                        "pdf_hash", "po_number"]
            if cfg.neartext:
                mix_cols.append("neartext_sig")
            mix_ds = (
                rd.read_parquet(checked_dir, columns=mix_cols)
                .map_batches(_make_stage2_mix_partials(cfg),
                             batch_format="pyarrow")
                .materialize()
            )
            multis_ref = None
            if mix_ds.count() <= cfg.broadcast_max_rows:
                multis_ref = ray.put(np.unique(
                    mix_ds.to_pandas()["mix"].to_numpy().view(np.uint32)))
            # over the guard: delta ≈ corpus → run pass B unfiltered
            _mark("stage2a_prefilter")
            rows = rd.read_parquet(
                checked_dir, columns=CHECKED_COLUMNS
            ).map_batches(
                _make_stage2_rows(cfg, multis_ref), batch_format="pyarrow")
            # persistent-index pruning: read only the history fragments
            # whose group index lists a 64-bit hash the delta touches —
            # O(delta + touched fragments) instead of O(history) per delta
            hist_files, prune_stats = _prune_history_files(
                prev_checked_dirs, checked_dir, cfg)
            timings["stage2_index_probe_stats"] = prune_stats
            _mark("stage2_index_probe")
            if hist_files:
                # history side: block/band rows only (mix-filtered to the
                # groups the delta touches); its stage-1 violations were
                # already emitted by the runs that produced them, so the
                # per-doc flag columns never leave storage on this side
                hist_cols = [c for c in CHECKED_COLUMNS if c not in
                             ("bank_change", "amount_z", "is_outlier",
                              "n_spans")]
                rows = rows.union(
                    rd.read_parquet(
                        hist_files, columns=hist_cols
                    ).map_batches(
                        _make_stage2_rows(cfg, multis_ref, emit_viol=False),
                        batch_format="pyarrow"))
            violations = (
                rows
                .groupby("bucket")
                .map_groups(_make_stage2_checker(cfg), batch_format="pandas")
                .groupby("doc_bucket")
                .map_groups(_stage2_final, batch_format="pandas")
                .map_batches(_pin_violation_schema, batch_format="pyarrow")
            )
            # keep only NEW docs' violations: history rows re-flag inside
            # touched groups (they are never "first"), but those violations
            # were already emitted by the runs that introduced them
            new_ids_ds = rd.read_parquet(checked_dir, columns=["doc_id"])
            if new_ids_ds.count() <= cfg.broadcast_max_rows:
                ids_ref = ray.put(np.sort(
                    new_ids_ds.to_pandas()["doc_id"].to_numpy().astype(str)))

                def keep_new(t: pa.Table) -> pa.Table:
                    ids = ray.get(ids_ref)
                    d = t["doc_id"].to_numpy(zero_copy_only=False).astype(str)
                    if not len(ids):
                        return t.slice(0, 0)
                    pos = np.clip(np.searchsorted(ids, d), 0, len(ids) - 1)
                    return t.filter(pa.array(ids[pos] == d))

                violations = violations.map_batches(
                    keep_new, batch_format="pyarrow")
            else:  # delta too large to broadcast: exact hash semi-join
                violations = violations.join(
                    new_ids_ds, join_type="inner",
                    num_partitions=max(n_cpus // 2, 8), on=("doc_id",),
                ).map_batches(_pin_violation_schema, batch_format="pyarrow")
            with commit_dir(violations_dir) as tmp:
                violations.write_parquet(tmp)
            return
        # pass A (prefilter): ONE narrow shuffle of the 8-byte group hashes
        # across ALL dup keyings (3 exact block families + neartext bands)
        # finds the multi-doc groups; passes B then ship block/band rows
        # only for those — ~5-10× less shuffle volume on real dup rates,
        # provably identical output (singleton groups produce nothing)
        multis_ref = None
        any_multi = True
        if cfg.neartext_prefilter:
            mix_cols = ["partition_key", "eligible", "invnum_norm",
                        "pdf_hash", "po_number"]
            if cfg.neartext:
                mix_cols.append("neartext_sig")
            # coalesce the tiny 6 B/row partials (shuffle=False = streaming
            # split/merge, no exchange) so the sort-shuffle runs K×K block
            # fetches with K ≈ cores instead of K = input file count — the
            # partials are ~1% of the read's bytes, and per-object fetch
            # overhead, not bandwidth, dominated the 200×200 version
            # (measured 2× wall at 32 CPUs).  At cluster scale K follows
            # total cores, keeping partitions ≲64 MB for any corpus whose
            # distinct-group count is ≲10M keys/core.
            mix_ds = (
                read_documents(checked_dir, columns=mix_cols)
                .map_batches(_make_stage2_mix_partials(cfg), batch_format="pyarrow")
                .repartition(max(n_cpus, 16), shuffle=False)
                .groupby("mbucket")
                .map_groups(_multi_mixes, batch_format="pandas")
                .materialize()
            )
            n_multi = mix_ds.count()
            if n_multi == 0:
                any_multi = False  # no group anywhere has ≥2 docs
            elif n_multi <= cfg.broadcast_max_rows:
                multis = np.sort(
                    mix_ds.to_pandas()["mix"].to_numpy().view(np.uint32))
                multis_ref = ray.put(multis)
            # above the guard the collided fraction is large and the
            # filter wouldn't shrink the shuffle — run unfiltered
            _mark("stage2a_prefilter")

        if not any_multi:
            multis_ref = ray.put(np.empty(0, np.uint32))

        # fused pass B: ONE read of the checked intermediate emits filtered
        # block rows AND filtered band rows into a single union schema, one
        # bucket shuffle runs both checkers (dispatch by family), then one
        # doc-keyed shuffle both dedups the neartext matches and carries the
        # final block violations through (the score plan's passthrough
        # pattern) — one read / two shuffles / one write where round 2 had
        # three reads, three shuffles and two sequential writes
        violations = (
            read_documents(checked_dir, columns=CHECKED_COLUMNS)
            .map_batches(
                _make_stage2_rows(cfg, multis_ref), batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_make_stage2_checker(cfg), batch_format="pandas")
            .groupby("doc_bucket")
            .map_groups(_stage2_final, batch_format="pandas")
            .map_batches(_pin_violation_schema, batch_format="pyarrow")
        )
        with commit_dir(violations_dir) as tmp:
            violations.write_parquet(tmp)

    def _stage3_verdicts() -> pd.DataFrame:
        import ray.data as rd

        if inc and not new_files:
            partials_ds = rd.from_arrow(_pad_count_cols(
                pq.read_table(os.path.join(prev_run_dir, "partials.parquet"))))
        else:
            partials_ds = (
                read_documents(
                    checked_dir,
                    columns=["doc_id", "partition_key", "invnum_norm", "total", "eligible", "n_spans"],
                )
                .map_batches(
                    lambda b: _pad_count_cols(_partition_partials(b, edges_by_pk)),
                    batch_format="pyarrow")
            )
            if inc:
                # merge-don't-recompute: the previous run's combined partials
                # are one more partial row per partition in the SAME groupby
                # (integer sums + HLL register max are associative, so the
                # merged verdict is bit-identical to a from-scratch full run)
                prev_pt = pq.read_table(
                    os.path.join(prev_run_dir, "partials.parquet"))
                if prev_pt.num_rows:
                    partials_ds = partials_ds.union(
                        rd.from_arrow(_pad_count_cols(prev_pt)))
        # violation counts ride the SAME shuffle (the old stage 4's driver
        # read + pandas pivot, now distributed partial rows in this job)
        vio_files = _list_parquet_files(violations_dir)
        if vio_files:
            partials_ds = partials_ds.union(
                rd.read_parquet(vio_files,
                                columns=["partition_key", "reason_code"])
                .map_batches(_vio_count_partials, batch_format="pyarrow"))
        if inc:
            # delta counts + the previous run's persisted totals
            # (violations/ holds only NEW docs' rows, so the in-shuffle sum
            # equals a full-run count)
            prev_vc = pq.read_table(
                os.path.join(prev_run_dir, "vio_counts.parquet")).to_pandas()
            if len(prev_vc):
                n = len(prev_vc)
                prev_rows = pa.table({
                    "partition_key": pa.array(
                        prev_vc["partition_key"].astype(str), pa.string()),
                    "n_docs": pa.array(np.zeros(n, np.int64)),
                    "n_eligible": pa.array(np.zeros(n, np.int64)),
                    "bin_counts": pa.array([[]] * n, pa.list_(pa.int64())),
                    "span_sum": pa.array(np.zeros(n, np.int64)),
                    "hll_doc_id": pa.array([b""] * n, pa.binary()),
                    "hll_invnum": pa.array([b""] * n, pa.binary()),
                    "reason_code": pa.array(
                        prev_vc["reason_code"].astype(str), pa.string()),
                    "vcount": pa.array(
                        prev_vc["count()"].to_numpy().astype(np.int64)),
                })
                partials_ds = partials_ds.union(rd.from_arrow(prev_rows))
        return (
            partials_ds
            .groupby("partition_key")
            .map_groups(_make_partition_finalizer(profile_map, cfg), batch_format="pandas")
            .to_pandas()
        )

    _stage2_violations()
    _mark("stage2_violations")
    # Stage 3 is the LAST Dataset job: its single partition_key groupby
    # emits the sketch verdicts, the violation-count verdicts (the former
    # stage 4), the combined partial rows, and the per-reason count rows
    # for the incremental chain — the driver only splits and writes.
    stage3_rows = _stage3_verdicts()
    partials_out = stage3_rows[stage3_rows["row_kind"] == "partial"]
    vio_rows = stage3_rows[stage3_rows["row_kind"] == "vio_count"]
    verdicts = (
        stage3_rows[stage3_rows["row_kind"] == "verdict"]
        .drop(columns=["row_kind", "n_eligible", "bin_counts", "span_sum",
                       "hll_doc_id", "hll_invnum", "reason_code", "vcount"])
        .sort_values(["partition_key", "check_name"], kind="mergesort")
        .reset_index(drop=True)
    )
    pq.write_table(
        pa.table({
            "partition_key": pa.array(partials_out["partition_key"], pa.string()),
            "n_docs": pa.array(partials_out["n_docs"].astype("int64")),
            "n_eligible": pa.array(partials_out["n_eligible"].astype("int64")),
            "bin_counts": pa.array(list(partials_out["bin_counts"]),
                                   pa.list_(pa.int64())),
            "span_sum": pa.array(partials_out["span_sum"].astype("int64")),
            "hll_doc_id": pa.array(list(partials_out["hll_doc_id"]), pa.binary()),
            "hll_invnum": pa.array(list(partials_out["hll_invnum"]), pa.binary()),
        }),
        os.path.join(run_dir, "partials.parquet"),
    )
    pq.write_table(
        pa.table({
            "partition_key": pa.array(vio_rows["partition_key"], pa.string()),
            "reason_code": pa.array(vio_rows["reason_code"], pa.string()),
            "count()": pa.array(vio_rows["vcount"].astype("int64")),
        }),
        os.path.join(run_dir, "vio_counts.parquet"),
    )
    n_violations_total = int(vio_rows["vcount"].sum()) if len(vio_rows) else 0
    n_docs_by_pk = verdicts.groupby("partition_key")["n_docs"].max().to_dict()
    pq.write_table(pa.Table.from_pandas(verdicts, preserve_index=False), verdicts_path)

    # per-partition manifest: lineage + metrics (resumable-output contract)
    manifest = {
        "lineage": {
            "documents_path": documents_path,
            "profiles_path": profiles_path,
            "profile_version": str(prof_df["profile_version"].iloc[0]) if len(prof_df) else None,
            "engine_version": "0.1.0",
            "input_files": all_rel_files,
            "checked_dirs": checked_chain,
            "prev_run_dir": prev_run_dir,
            "config": {
                "z_threshold": cfg.z_threshold,
                "po_pct_tol": cfg.po_pct_tol,
                "po_window_days": cfg.po_window_days,
                "psi_threshold": cfg.psi_threshold,
                "uniqueness_min_ratio": cfg.uniqueness_min_ratio,
                "neartext": cfg.neartext,
                "neartext_bands": cfg.neartext_bands,
            },
        },
        "partitions": {
            pk_key: {
                "status": "done",
                "n_docs": int(g["n_docs"].max()),
                "n_violations": int(g["n_violations"].sum()),
                "checks": {
                    r["check_name"]: {"passed": bool(r["passed"]), "metric": float(r["metric"])}
                    for _, r in g.iterrows()
                },
            }
            for pk_key, g in verdicts.groupby("partition_key")
        },
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    _mark("stage3_verdicts")

    return {
        "timings": timings,
        "checked": checked_dir,
        "violations": violations_dir,
        "verdicts": verdicts_path,
        "manifest": manifest_path,
        "n_violations": n_violations_total,
        "n_partitions": len(n_docs_by_pk),
        "incremental": inc,
        "n_new_files": len(new_files) if inc else None,
    }
