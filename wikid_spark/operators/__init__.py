"""Composite operators Spark lacks as single built-ins, expressed as
compositions of DataFrame ops (no RDDs, no driver-side loops)."""
