"""Layer B — relational/batch surface for the DuckDB-oracle acceptance
metric (SURVEY.md §2 Layer B). Provenance: driver contract
(BASELINE.json:2), not the reference (a Kafka Streams demo has no
optimizer-visible relational surface — SURVEY.md §2 exhaustiveness
note).
"""

from __future__ import annotations
