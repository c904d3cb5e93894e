"""Layer C — LLM-data-pipeline operators (SURVEY.md §2 Layer C).
Provenance: driver north star (BASELINE.json:6): dedup, similarity
search, multimodal columns, text analysis — designed for 100 TB scale.
"""

from __future__ import annotations
