"""Large-scale training-data operators built on the same Ray Data
primitives as the validator: deduplication (exact, MinHash-LSH,
SimHash, n-gram Jaccard), similarity search (brute-force + IVF),
text analysis (language id, quality scoring, token counts,
fingerprints), and multimodal column plumbing."""
