"""Source orchestration: cache layout, metadata sidecars, and the
cache → dump → direct fallback chain (SURVEY.md §7.1 step 6)."""
