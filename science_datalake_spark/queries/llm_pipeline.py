"""LLM-training-data pipeline queries: dedup, similarity search, text
analysis over the ``documents`` and ``embeddings`` tables.

Filled in incrementally; see BASELINE.json north star.
"""

from __future__ import annotations
