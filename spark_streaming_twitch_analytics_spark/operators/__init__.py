"""Composed relational operators (reference SURVEY §2 + scale extensions)."""
