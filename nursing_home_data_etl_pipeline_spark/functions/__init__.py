"""Scalar/vector function library (JVM-side built-ins wherever possible)."""
