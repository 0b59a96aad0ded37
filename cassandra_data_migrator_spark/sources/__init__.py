from cassandra_data_migrator_spark.sources.parquet import TABLES, load_table

__all__ = ["TABLES", "load_table"]
