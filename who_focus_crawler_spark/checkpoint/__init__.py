"""Snapshot checkpointing with Iceberg semantics (offline shim)."""
