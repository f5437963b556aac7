"""Checkpoint / lineage state (the md5-skip generalization, SURVEY.md §4)."""
