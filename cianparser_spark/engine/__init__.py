"""Spark execution layer: wave-scheduled crawl frontier over
snapshot-committed tables, politeness budgets, Bloom-accelerated
first-wins dedup, and the reference-compatible facade."""
