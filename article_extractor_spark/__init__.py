"""PySpark-native article extraction engine (from-scratch reimplementation
of the semantics of rijkvp/article-extractor over Spark DataFrames)."""

__version__ = "0.2.0"
