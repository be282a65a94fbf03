"""Observability and diagnostics (reference L0 utilities, SURVEY.md §1)."""
