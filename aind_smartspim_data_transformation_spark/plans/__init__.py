"""Declarative query plans (relational + events) with DuckDB oracle twins."""
