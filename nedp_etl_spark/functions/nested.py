"""Placeholder — filled in as the family is implemented (SURVEY.md §2)."""
