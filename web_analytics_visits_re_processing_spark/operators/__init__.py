"""Engine operators: sessionization, dedup, similarity, text analysis,
multimodal column handling."""
