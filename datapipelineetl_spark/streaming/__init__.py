"""Structured Streaming runner + event-time operators."""
