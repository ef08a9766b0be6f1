"""Placeholder — filled in by later stage."""
