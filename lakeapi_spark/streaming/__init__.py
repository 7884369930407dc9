"""Structured Streaming pipeline (greenfield extension, SURVEY §2.13/§7)."""
