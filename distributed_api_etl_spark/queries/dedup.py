"""Dedup-family graded queries (filled in by operators milestone)."""
