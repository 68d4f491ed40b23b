"""sievedata — a from-scratch Ray-Data-native constraint-validation engine.

Generalizes the vendor-adaptive invoice screening of
``jimmc414/invoice_anomaly_detection_sieve`` (reference at /root/reference,
read-only) into per-partition schema + statistical constraint validation over
tables of interleaved text+media documents
(``doc_id:string, spans:list<struct<kind,text,media_ref,offset>>``).

Layout:
  kernels/    pure numpy/pyarrow functions (normalization, similarity,
              assignment, pairwise features, logistic scoring, decision fusion)
  sketches/   mergeable sketches (moments, t-digest, HLL, Bloom, KS/PSI)
  sources/    storage seam (Parquet default; Lance optional adapter)
  stages/     Ray Data map_batches stages (parse, checks, profile partials)
  pipelines/  profile pass, validate pass, checkpoint/resume
  fixtures.py deterministic synthetic documents/media_catalog generator
  oracle.py   pure python+duckdb oracle for exact violation-row matching
"""

__version__ = "0.1.0"
