"""LLM-data-pipeline operators (BASELINE.json north star) — placeholder.

Filled in by the dedup / similarity / text-analysis milestones.
"""
