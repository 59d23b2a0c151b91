"""mandoline_spark: a PySpark-native versioned n-dimensional array
engine plus a relational / LLM-data-pipeline query surface.

Capabilities mirror TheClimateCorporation/mandoline (the reference at
/root/reference): chunked array storage with content addressing,
immutable linear versions with time travel, slab (hyper-rectangle)
read/write — re-expressed on Spark DataFrames and Parquet, with the
relational operators coming from Catalyst.
"""

__version__ = "0.1.0"
