"""Column-expression library (JVM-side, codegen-friendly).

Every function here returns a ``pyspark.sql.Column`` built from built-in
functions — no Python row UDFs. Functions with a DuckDB-oracle story ship
a ``*_sql`` twin that renders the equivalent DuckDB expression from the
same constants, so Spark results and oracle results agree by construction.
"""
