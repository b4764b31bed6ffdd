"""Large-scale training-data pipeline operators beyond the reference's own
inventory: deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, text analysis, multimodal plumbing."""
