"""Column-expression helper library (all JVM-side built-ins, no Python UDFs)."""
