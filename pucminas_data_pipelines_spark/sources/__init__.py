"""Custom connector implementations (pyspark.sql.datasource API)."""
