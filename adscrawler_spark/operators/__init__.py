"""Relational + crawl operators (SURVEY.md §2 inventory)."""
