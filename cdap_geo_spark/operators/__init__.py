"""Spark DataFrame operators: spatial join, kNN, tiles, dedup, text."""
