"""Pure (no-Ray) kernel library: normalization, similarity, assignment,
pairwise features, logistic duplicate scoring, decision fusion, anomaly z.

Every kernel reproduces the observable semantics of the reference
(`/root/reference/app/*.py`) — cited per function — re-implemented from
scratch on numpy/pyarrow (rapidfuzz/scipy/sklearn are unavailable here).
"""

from sievedata.kernels.normalize import (
    invnum_norm,
    invnum_norm_array,
    desc_norm,
    desc_norm_array,
    mask_account_last4,
    hash_account,
    text_blob,
    payload_hash,
)
from sievedata.kernels.similarity import jaro_winkler, ngram_set, dice_3gram, jaccard
from sievedata.kernels.assignment import linear_sum_assignment
from sievedata.kernels.features import header_features, line_assign_features
from sievedata.kernels.model import FEATURE_ORDER, predict_dup_prob, predict_dup_prob_matrix
from sievedata.kernels.decision import fuse_scores, decide, HOLD, REVIEW, PASS
from sievedata.kernels.anomaly import anomaly_score, anomaly_score_vec

__all__ = [
    "invnum_norm", "invnum_norm_array", "desc_norm", "desc_norm_array",
    "mask_account_last4", "hash_account", "text_blob", "payload_hash",
    "jaro_winkler", "ngram_set", "dice_3gram", "jaccard",
    "linear_sum_assignment", "header_features", "line_assign_features",
    "FEATURE_ORDER", "predict_dup_prob", "predict_dup_prob_matrix",
    "fuse_scores", "decide", "HOLD", "REVIEW", "PASS",
    "anomaly_score", "anomaly_score_vec",
]
