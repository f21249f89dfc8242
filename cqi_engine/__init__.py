"""PySpark-native cycling-quality / geospatial scoring engine."""

__version__ = "0.1.0"
