"""Reusable column-expression libraries (no UDFs — pure Catalyst)."""
