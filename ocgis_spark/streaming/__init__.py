"""Structured Streaming surface.

The reference is batch-only (its "streaming" is iterator-based file
conversion, ``conv/base.py:160-234``) — this package is the Spark-native
extension the north rule's continuous-ingest posture implies: the same
operators applied to a document stream with watermarked windows and
checkpointed sinks.
"""
