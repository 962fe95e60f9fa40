"""Operators: parse, lookup-enrich, route, aggregate, fan-in, dedup,
similarity, text analysis, multimodal plumbing, skew handling."""
