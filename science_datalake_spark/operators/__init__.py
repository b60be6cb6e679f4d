"""Reusable DataFrame operators (generic, table-agnostic).

Each module implements one operator family from SURVEY.md §2 plus the
LLM-pipeline extensions, as composable DataFrame→DataFrame functions.
"""
