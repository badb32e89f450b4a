"""Engine operators: ingestion, sinks, dedup, similarity, text, multimodal."""
