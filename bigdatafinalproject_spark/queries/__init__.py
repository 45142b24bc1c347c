"""Registered queries, grouped by operator family (SURVEY.md §2)."""
