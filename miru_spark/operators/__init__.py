"""Training-data pipeline operators: dedup, similarity, text analysis,
multimodal plumbing — the corpus-preparation layer a 100 TB text/
multimodal pipeline needs in front of the index builder."""
