"""Composable DataFrame operators (SURVEY.md §2 inventory, Spark-first)."""
