"""Similarity-search graded queries (filled in by operators milestone)."""
