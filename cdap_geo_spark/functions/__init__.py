"""Column-level and relational utility functions."""
