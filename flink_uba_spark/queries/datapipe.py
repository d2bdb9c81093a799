"""Training-data-pipeline queries (dedup / similarity / text analysis)
(placeholder — filled in as operators land)."""

QUERIES: dict = {}
ORACLES: dict = {}
