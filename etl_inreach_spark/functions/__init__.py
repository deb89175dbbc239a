"""Column-level function library (all JVM-side built-in expressions)."""
