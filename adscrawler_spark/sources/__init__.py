"""Table layouts, snapshot catalog, ledger (Iceberg-shaped)."""
