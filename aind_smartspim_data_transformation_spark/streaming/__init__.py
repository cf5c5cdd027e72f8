"""Structured Streaming twins of the batch events plans."""
