"""Compiled operator surface (SURVEY.md §2)."""
