"""Engine operators: checksum, diff, scan/export, dedup, similarity, text, multimodal."""
