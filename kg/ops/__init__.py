"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal plumbing) — the large-scale corpus-preparation ops a 100 TB
transcript/document pipeline needs, built on the same Spark-first rules
as the KG stages: built-in functions in the hot path, pandas/Arrow UDFs
only where built-ins can't express the op."""
