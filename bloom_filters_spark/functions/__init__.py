"""Column-level functions: text analysis, similarity, fingerprinting."""
