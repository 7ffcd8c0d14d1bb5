"""Spark job layer: Arrow-vectorized UDFs, the extraction job with
skew routing + lineage + resume, and the query catalog."""
