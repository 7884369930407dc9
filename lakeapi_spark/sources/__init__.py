"""Scan layer (SURVEY §2.1)."""
