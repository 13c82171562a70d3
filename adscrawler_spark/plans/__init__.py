"""Derived-table pipelines + the driver-facing query battery."""
