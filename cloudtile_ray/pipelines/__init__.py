"""End-to-end pipelines (the reference's Converter analogs, SURVEY.md §3)."""
