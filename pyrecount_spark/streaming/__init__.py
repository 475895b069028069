"""Structured Streaming variants of the batch windowing operators."""
