"""macocu_crawler_spark — a PySpark-native rebuild of the MaCoCu targeted-language
web crawler (reference: macocu/MaCoCu-crawler at /root/reference, GPL-3).

This is NOT a port: the reference is a single-machine, thread+pipe dataflow of
three process kinds (scheduler.py / crawl.py / process.py).  This package
re-expresses the same *capabilities* as a round-based Spark batch engine:

- ``tables``      parquet snapshot tables with Iceberg-style commit/time-travel
- ``functions``   URL kernel, text pipeline (jusText-style), robots parser
- ``operators``   extract (mapInPandas), dedup, domains/yield, scheduler round
- ``pipeline``    training-data ops: MinHash/SimHash dedup, ANN, text stats
- ``crawl_driver`` the per-round loop (select -> fetch -> extract -> merge)

Architecture notes live in SURVEY.md; every module cites the reference
file:line whose semantics it reproduces.
"""

__version__ = "0.1.0"
