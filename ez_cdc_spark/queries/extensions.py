"""Placeholder — filled in as operators land."""
