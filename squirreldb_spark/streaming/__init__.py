"""Structured Streaming ingestion layer."""
