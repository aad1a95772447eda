"""Engine operators: tokenization, counts, co-occurrence, relational,
dedup, similarity, text statistics, multimodal plumbing."""
