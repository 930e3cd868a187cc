"""Batch study drivers (the reference's four analysis scripts + ladder)."""
