"""North-star LLM-data-pipeline operators (dedup, similarity search, text
analysis) over the documents/embeddings tables. Populated incrementally."""

from __future__ import annotations
