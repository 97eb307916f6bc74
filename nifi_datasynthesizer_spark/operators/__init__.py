"""Large-scale data-pipeline operators beyond the reference's surface:
deduplication, similarity search, text analysis, multimodal plumbing."""
