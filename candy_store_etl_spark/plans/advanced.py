"""Filled in incrementally."""
