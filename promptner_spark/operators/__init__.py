"""The operator inventory of SURVEY.md §2, Spark-first."""
