"""Text-analysis graded queries (filled in by operators milestone)."""
