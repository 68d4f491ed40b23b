"""Mergeable sketches for single-pass distributed profiling.

Every sketch supports ``update`` (vectorized over numpy arrays),
``merge`` (associative + commutative — required for order-insensitive
per-partition reduction under Ray Data's groupby), and ``to_bytes`` /
``from_bytes`` serialization so sketch states travel through Arrow binary
columns between the partial (map_batches) and final (groupby) stages.
"""

from sievedata.sketches.moments import Moments
from sievedata.sketches.tdigest import TDigest
from sievedata.sketches.hll import HyperLogLog
from sievedata.sketches.bloom import BloomFilter
from sievedata.sketches.drift import psi, ks_statistic, ks_pvalue

__all__ = [
    "Moments", "TDigest", "HyperLogLog", "BloomFilter",
    "psi", "ks_statistic", "ks_pvalue",
]
