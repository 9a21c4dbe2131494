"""Engine operators: shred, reconstruct, merge, sync, dedup, similarity,
text analysis, multimodal plumbing."""
