"""Structured Streaming surface (SURVEY.md §2 'Streaming-only operators')."""
