"""Batch ETL jobs — the reference's side scripts (SURVEY.md §2.1 S5-S8)
re-expressed as composable library functions: cleaning (``cleaner``) and
external-API enrichment (``enrich``)."""
