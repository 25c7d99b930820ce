"""Relational-completeness queries (SURVEY.md §7 M4) — placeholder.

Filled in by the M4 milestone.
"""
