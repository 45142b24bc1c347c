"""Structured Streaming surface (SURVEY §7.7 — net-new; the reference
has no streaming at all, SURVEY §2.10)."""
