"""Query plans: the oracle-checked registry consumed by __spark_entry__,
tests, and bench."""
