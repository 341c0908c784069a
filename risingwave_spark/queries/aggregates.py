"""Populated incrementally; see queries/__init__.py."""
