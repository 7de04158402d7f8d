"""PySpark-native docling-core-equivalent extraction engine."""
