"""Relational + LLM-pipeline operators, one module per SURVEY.md §2 family."""
