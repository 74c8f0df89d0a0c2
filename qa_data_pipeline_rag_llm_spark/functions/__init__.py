"""Expression-level building blocks (pure Column functions).

Everything here returns JVM-side Column expressions built from
``pyspark.sql.functions`` — no Python UDFs — so plans stay inside
whole-stage codegen and are translatable 1:1 into the DuckDB oracle SQL.
"""
