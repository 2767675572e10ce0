"""Stateful serving components (query actors, doc store, tombstones)."""
