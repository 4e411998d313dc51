"""Deployable jobs: spark-submit entry points over the operator layer."""
