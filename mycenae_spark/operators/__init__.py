"""TSDB + relational operators, each a composition of built-in DataFrame ops.

SURVEY.md §2 is the inventory; every operator here keeps the plan inside
Catalyst (no Python row UDFs in any hot path) so pushdown/pruning/codegen
survive — the property that makes these hold up at 100 TB.
"""
