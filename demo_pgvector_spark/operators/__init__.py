"""Relational + vector operators composed from DataFrame primitives."""
