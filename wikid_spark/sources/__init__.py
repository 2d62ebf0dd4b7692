"""Dump readers (SURVEY.md §2 rows S1–S3, S9)."""
