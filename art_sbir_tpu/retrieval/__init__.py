"""Retrieval engine: pjit-sharded gallery embedding, embedding cache, and
ranking metrics (MRR / top-k / rank statistics / sample retrievals)."""
