"""Spark operators: vectorized UDFs, dedup, skew tools, text/similarity
ops. Everything here is DataFrame-in → DataFrame/Column-out and lazy —
physical strategy is left to Catalyst."""
