"""Scalar helper functions (SURVEY.md §2.7) — all Catalyst expressions."""
