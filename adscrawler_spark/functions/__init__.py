"""Column-function layer: Arrow-vectorized pandas UDFs + JVM built-ins."""
