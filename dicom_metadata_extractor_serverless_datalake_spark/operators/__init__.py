"""Custom operators Spark lacks natively, built as compositions of
DataFrame ops (SURVEY §2.B 'custom operators' guidance): as-of join,
dedup family (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
search, text analysis, multimodal column plumbing."""
