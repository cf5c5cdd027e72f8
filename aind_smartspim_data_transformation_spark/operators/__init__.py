"""Custom operators the built-in DataFrame API lacks first-class forms of:
as-of join, dedup family, similarity search, text analysis, multimodal
column plumbing.  Each is composed from declarative ops where semantics
allow; Pandas-UDF-backed only where they genuinely don't.
"""
