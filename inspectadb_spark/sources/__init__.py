"""Sources — corpus parquet (see catalog.py), derived CDC fixtures, and
format readers for ETL ingest (csv/json/orc round-trips, JDBC stub)."""
