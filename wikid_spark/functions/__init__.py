"""Reusable column-expression kernels (JVM-side wherever possible)."""
