"""Structured Streaming shells for the reference's two pipelines."""
