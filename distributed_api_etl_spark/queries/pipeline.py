"""Graded query for the full API-ETL pipeline (filled in with the engine)."""
