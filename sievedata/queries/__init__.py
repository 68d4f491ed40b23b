"""Query catalogue package — the SURVEY.md §2 operator families, split
by family from the former single-file sievedata/queries.py (round 5,
VERDICT #9: pure mechanical move — every q_*/SQL_* body is an unmodified
line slice of the original; only import headers were generated).

Public contract (unchanged): ``queries()`` / ``oracle_sql()`` plus the flat
attribute namespace (tests and pipelines import helpers like
``_token_counts`` / ``q_dedup_corpus`` directly) — reproduced below by
merging each family module's namespace in original file order."""
from sievedata.queries import (_shared, relational, joins, topk, dupflag,
                               outliers, normalize, textstats, events,
                               embeddings, similarity, analytics, corpus,
                               curation, registry)
from sievedata.queries.registry import oracle_sql, queries  # noqa: F401

for _m in (_shared, relational, joins, topk, dupflag, outliers, normalize,
           textstats, events, embeddings, similarity, analytics, corpus,
           curation, registry):
    globals().update({k: v for k, v in vars(_m).items()
                      if not k.startswith("__")})
del _m
