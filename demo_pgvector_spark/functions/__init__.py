"""Column-level functions: vector math, text scalars, analytics, embeddings."""
