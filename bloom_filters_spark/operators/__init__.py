"""Spark-side operators for the near-duplicate detection engine."""
