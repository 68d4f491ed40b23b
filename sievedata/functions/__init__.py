"""Large-scale training-data-pipeline operators (text analysis, dedup,
similarity search, multimodal stubs) — first-class engine components beyond
the reference's own operator set."""
