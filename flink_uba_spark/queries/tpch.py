"""General analytics queries over the TPC-H-ish star schema (placeholder —
filled in as operators land)."""

QUERIES: dict = {}
ORACLES: dict = {}
