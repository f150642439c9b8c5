"""Reusable column-level function library (training-data pipeline ops).

All builders return JVM-side Column expressions (no Python UDFs) so
they stay inside whole-stage codegen at 100 TB scale.
"""
