"""dicomdb_spark — PySpark-native analytics engine (see SURVEY.md)."""
