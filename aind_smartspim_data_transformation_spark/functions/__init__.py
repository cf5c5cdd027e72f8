"""Scalar-function library (imaging metadata helpers)."""
