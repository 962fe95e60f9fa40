"""Structured Streaming variant of the enrichment pipeline."""
