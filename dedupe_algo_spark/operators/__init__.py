"""Relational/dataflow operators re-expressing SURVEY.md §2 Spark-first."""
