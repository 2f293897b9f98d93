"""MLlib lane: the quarter-prediction pipeline (SURVEY.md §2.9)."""
