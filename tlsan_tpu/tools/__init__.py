"""Offline tools: reference-checkpoint migration, etc."""
