"""Imaging sources: PNG codec, stack scan → chunk table, acquisition metadata."""
