"""Profile-learning pass: per-partition statistical baselines from clean data.

Replaces the reference's nightly vendor-baseline job
(/root/reference/scripts/train_anomaly.py:14-54 — pandas
``groupby(vendor_id).total.agg(mean, std, count)`` upserted into
``vendor_amount_baselines``) with a single-pass mergeable Ray Data pipeline,
extended per north_rule with t-digest quantiles, HyperLogLog uniqueness
sketches, span-structure histograms and exact drift-bin fractions:

One pass: read → map_batches(parse) → per-(block, partition) partial sketches
→ groupby(partition_key) merge (shuffles only sketch bytes, never rows).

Drift-bin edges are the merged digest's deciles and the expected bin
fractions its cdf at those edges; BOTH are STORED in the profiles table, so
the validate pass and the oracle compare against identical numbers — the
digest's merge-order sensitivity never leaks into verdicts (the stored
artifact is the contract; the validate side bins with exact integer counts).

Profiles are small (one row per partition) and broadcast to scoring stages
via ``ray.put``.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from sievedata.sketches import BloomFilter, HyperLogLog, Moments, TDigest
from sievedata.sources.storage import read_documents
from sievedata.stages.parse import parse_documents_batch

PROFILE_VERSION = "p1"
N_DRIFT_BINS = 10


def _eligible_mask(batch: pa.Table) -> np.ndarray:
    missing = np.asarray(batch.column("missing_fields").to_numpy(zero_copy_only=False))
    credit = np.asarray(batch.column("is_credit").to_numpy(zero_copy_only=False))
    return (missing == "") & (~credit.astype(bool))


def _sketch_partials(batch: pa.Table) -> pa.Table:
    """One partial-sketch row per partition present in this batch."""
    mask = _eligible_mask(batch)
    pk = np.asarray(batch.column("partition_key").to_numpy(zero_copy_only=False))
    totals = np.asarray(batch.column("total").to_numpy(zero_copy_only=False), dtype=np.float64)
    doc_id = batch.column("doc_id")
    invnum = batch.column("invnum_norm")
    kinds_hist = _span_kind_counts(batch)

    rows = {k: [] for k in ("partition_key", "moments", "tdigest", "hll_doc_id", "hll_invnum", "span_hist")}
    # one sort over eligible rows instead of a per-key full-batch mask;
    # stable argsort keeps ascending original order within each group, so
    # the float accumulation order (Moments/TDigest) is bit-identical
    midx = np.flatnonzero(mask)
    uniq, inv = np.unique(pk[midx], return_inverse=True)
    order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    for gi, key in enumerate(uniq):
        idx_e = midx[order[bounds[gi]:bounds[gi + 1]]]
        idx = pa.array(idx_e, pa.int64())
        m = Moments().update(totals[idx_e])
        td = TDigest().update(totals[idx_e])
        rows["partition_key"].append(str(key))
        rows["moments"].append(m.to_bytes())
        rows["tdigest"].append(td.to_bytes())
        # sparse HLL partials (~3 B/register touched vs 4 KB dense) — the
        # merge in _merge_sketch_group is register-max, bit-identical
        rows["hll_doc_id"].append(HyperLogLog.sparse_partial(doc_id.take(idx)))
        rows["hll_invnum"].append(HyperLogLog.sparse_partial(invnum.take(idx)))
        rows["span_hist"].append(json.dumps(kinds_hist.get(str(key), {}), sort_keys=True))
    return pa.table(
        {
            "partition_key": pa.array(rows["partition_key"], pa.string()),
            "moments": pa.array(rows["moments"], pa.binary()),
            "tdigest": pa.array(rows["tdigest"], pa.binary()),
            "hll_doc_id": pa.array(rows["hll_doc_id"], pa.binary()),
            "hll_invnum": pa.array(rows["hll_invnum"], pa.binary()),
            "span_hist": pa.array(rows["span_hist"], pa.string()),
        }
    )


def _span_kind_counts(batch: pa.Table) -> dict[str, dict[str, int]]:
    """Per-partition span-kind histograms for one batch (vectorized)."""
    spans = batch.column("spans").combine_chunks()
    n = batch.num_rows
    counts = np.diff(np.asarray(spans.offsets))
    parent = np.repeat(np.arange(n, dtype=np.int64), counts)
    kind = np.asarray(spans.flatten().field("kind").to_numpy(zero_copy_only=False))
    pk = np.asarray(batch.column("partition_key").to_numpy(zero_copy_only=False))
    span_pk = pk[parent]
    pk_uniq, pk_inv = np.unique(span_pk, return_inverse=True)
    kind_uniq, kind_inv = np.unique(kind, return_inverse=True)
    combined = pk_inv * len(kind_uniq) + kind_inv
    cnt = np.bincount(combined, minlength=len(pk_uniq) * len(kind_uniq))
    out: dict[str, dict[str, int]] = {}
    for flat in np.flatnonzero(cnt):
        p = str(pk_uniq[flat // len(kind_uniq)])
        k = str(kind_uniq[flat % len(kind_uniq)])
        out.setdefault(p, {})[k] = int(cnt[flat])
    return out


def _merge_sketch_group(df: pd.DataFrame) -> pd.DataFrame:
    m = Moments()
    td = TDigest()
    h_doc = HyperLogLog()
    h_inv = HyperLogLog()
    hist: dict[str, int] = {}
    for mb, tb, hdb, hib, shb in zip(
        df["moments"], df["tdigest"], df["hll_doc_id"], df["hll_invnum"], df["span_hist"]
    ):
        m = m.merged(Moments.from_bytes(mb))
        td = td.merged(TDigest.from_bytes(tb))
        h_doc.merge_sparse(hdb)
        h_inv.merge_sparse(hib)
        for k, v in json.loads(shb).items():
            hist[k] = hist.get(k, 0) + v
    return pd.DataFrame(
        {
            "partition_key": [df["partition_key"].iloc[0]],
            "sample_count": [m.count],
            "mean_total": [m.mean],
            "std_total": [m.std],
            "tdigest": [td.to_bytes()],
            "hll_doc_id": [h_doc.to_bytes()],
            "hll_invnum": [h_inv.to_bytes()],
            "span_kind_histogram": [json.dumps(hist, sort_keys=True)],
        }
    )


def build_profiles(
    baseline_path: str,
    media_catalog_path: str,
    out_dir: str,
    profile_version: str = PROFILE_VERSION,
    bloom_fp_rate: float = 1e-4,
) -> dict[str, str]:
    """Run the single-pass profile pass; write profiles.parquet + media Bloom."""
    os.makedirs(out_dir, exist_ok=True)

    # single pass: mergeable sketches per partition.  parse + partials fused
    # in ONE UDF — a second map_batches boundary re-batches the wide parse
    # output (spans/text attached), which measured 2-3× the stage CPU in the
    # identical validate stage-1 shape; only the partition-sized partial rows
    # may cross a block boundary.
    ds = read_documents(baseline_path)
    partials = ds.map_batches(
        lambda b: _sketch_partials(parse_documents_batch(b)),
        batch_format="pyarrow")
    merged = partials.groupby("partition_key").map_groups(
        _merge_sketch_group, batch_format="pandas"
    )
    prof_df = merged.to_pandas()  # one row per partition — small by design

    # decile edges + expected fractions from each partition's merged digest.
    # STORED in the table: validate pass and oracle both compare against
    # these exact stored numbers (the digest is only the derivation).
    bin_edges, bin_fracs = [], []
    for _, row in prof_df.iterrows():
        td = TDigest.from_bytes(row["tdigest"])
        qs = np.linspace(0.0, 1.0, N_DRIFT_BINS + 1)[1:-1]
        edges = np.unique(np.array([td.quantile(q) for q in qs]))
        if edges.size:
            fr = np.diff(np.concatenate([[0.0], td.cdf(edges), [1.0]]))
        else:
            fr = np.array([])
        bin_edges.append(edges.tolist())
        bin_fracs.append(fr.tolist())
    prof_df["bin_edges"] = bin_edges
    prof_df["bin_fracs"] = bin_fracs
    prof_df["profile_version"] = profile_version
    prof_df = prof_df.sort_values("partition_key").reset_index(drop=True)

    profiles_path = os.path.join(out_dir, "profiles.parquet")
    pq.write_table(pa.Table.from_pandas(prof_df, preserve_index=False), profiles_path)

    # media catalog → Bloom filter artifact (broadcast referential side)
    cat = pq.read_table(media_catalog_path, columns=["media_ref"])
    refs = cat.column("media_ref")
    bf = BloomFilter(capacity=max(len(refs), 1), fp_rate=bloom_fp_rate)
    bf.add(refs.combine_chunks())
    bloom_path = os.path.join(out_dir, "media_bloom.bin")
    with open(bloom_path, "wb") as f:
        f.write(bf.to_bytes())

    return {"profiles": profiles_path, "media_bloom": bloom_path}


def load_profiles(profiles_path: str) -> pd.DataFrame:
    return pq.read_table(profiles_path).to_pandas()


def update_profiles(
    profiles_path: str,
    new_baseline_path: str,
    out_dir: str,
    profile_version: str = "p2",
) -> dict[str, str]:
    """Incremental profile refresh — the reference's nightly baseline job
    (scripts/train_anomaly.py upsert) done as a SKETCH MERGE: the new data's
    partial sketches fold into the stored profiles without re-reading history
    (moments via Chan merge, t-digest merge, HLL register max).  Drift-bin
    edges are re-derived from the merged digests and bin counts recomputed
    over the NEW data only plus rescaled stored fractions — an approximation
    documented here: exact refresh = rebuild with build_profiles.

    Returns the new profiles path (media bloom is carried over unchanged).
    """
    os.makedirs(out_dir, exist_ok=True)
    old = pq.read_table(profiles_path).to_pandas().set_index("partition_key")

    ds = read_documents(new_baseline_path)
    partials = ds.map_batches(  # fused: see build_profiles
        lambda b: _sketch_partials(parse_documents_batch(b)),
        batch_format="pyarrow")
    new_df = (
        partials.groupby("partition_key")
        .map_groups(_merge_sketch_group, batch_format="pandas")
        .to_pandas()
        .set_index("partition_key")
    )

    keys = sorted(set(old.index) | set(new_df.index))
    rows = []
    for key in keys:
        if key in old.index and key in new_df.index:
            o, n = old.loc[key], new_df.loc[key]
            om = Moments(int(o["sample_count"]), float(o["mean_total"]), 0.0)
            # reconstruct m2 from stored std (ddof=1)
            om.m2 = float(o["std_total"]) ** 2 * max(om.count - 1, 0)
            nm = Moments(int(n["sample_count"]), float(n["mean_total"]), 0.0)
            nm.m2 = float(n["std_total"]) ** 2 * max(nm.count - 1, 0)
            m = om.merged(nm)
            td = TDigest.from_bytes(o["tdigest"]).merged(TDigest.from_bytes(n["tdigest"]))
            h_doc = HyperLogLog.from_bytes(o["hll_doc_id"]).merged(
                HyperLogLog.from_bytes(n["hll_doc_id"]))
            h_inv = HyperLogLog.from_bytes(o["hll_invnum"]).merged(
                HyperLogLog.from_bytes(n["hll_invnum"]))
            hist_o = json.loads(o["span_kind_histogram"])
            hist_n = json.loads(n["span_kind_histogram"])
            hist = {k: hist_o.get(k, 0) + hist_n.get(k, 0) for k in set(hist_o) | set(hist_n)}
        else:
            src = old.loc[key] if key in old.index else new_df.loc[key]
            m = Moments(int(src["sample_count"]), float(src["mean_total"]), 0.0)
            m.m2 = float(src["std_total"]) ** 2 * max(m.count - 1, 0)
            td = TDigest.from_bytes(src["tdigest"])
            h_doc = HyperLogLog.from_bytes(src["hll_doc_id"])
            h_inv = HyperLogLog.from_bytes(src["hll_invnum"])
            hist = json.loads(src["span_kind_histogram"])
        qs = np.linspace(0.0, 1.0, N_DRIFT_BINS + 1)[1:-1]
        edges = np.unique(np.array([td.quantile(q) for q in qs]))
        fracs = np.diff(
            np.concatenate([[0.0], td.cdf(edges), [1.0]])
        ) if edges.size else np.array([])
        rows.append(
            {
                "partition_key": key,
                "sample_count": m.count,
                "mean_total": m.mean,
                "std_total": m.std,
                "tdigest": td.to_bytes(),
                "hll_doc_id": h_doc.to_bytes(),
                "hll_invnum": h_inv.to_bytes(),
                "span_kind_histogram": json.dumps(hist, sort_keys=True),
                "bin_edges": edges.tolist(),
                "bin_fracs": fracs.tolist(),
                "profile_version": profile_version,
            }
        )
    out_df = pd.DataFrame(rows)
    profiles_out = os.path.join(out_dir, "profiles.parquet")
    pq.write_table(pa.Table.from_pandas(out_df, preserve_index=False), profiles_out)
    return {"profiles": profiles_out}
