"""Corpus readers, synthesizers and adapters."""
