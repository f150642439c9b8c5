"""Sinks: transactional snapshot store (Iceberg-style COW MERGE)."""
