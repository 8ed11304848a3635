"""Structured Streaming surface: the batch expressions, streamed."""
