"""Shared query/oracle registry — parts register in import order (see queries.py)."""

QUERIES = {}
ORACLES = {}
