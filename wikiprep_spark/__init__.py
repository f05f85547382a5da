"""wikiprep_spark — a PySpark-native Wikipedia-to-knowledge-graph engine.

From-scratch reimplementation of the capabilities of the wikiprep reference
pipeline on Spark DataFrames + Arrow-batched pandas UDFs. See SURVEY.md.
"""

__version__ = "0.1.0"
