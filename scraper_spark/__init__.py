"""scraper_spark — a PySpark-native distributed crawl + analytics engine.

A from-scratch reimplementation of the *capabilities* of the reference
scraper (epyonchen/Scraper, surveyed in SURVEY.md) as idiomatic Spark
dataflow: a URL-frontier + fetch scheduler (plans/), vectorized
parse/decode/hash functions (functions/), snapshot-committed table IO
(sources/), and large-scale training-data operators (operators/).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API, the read-only reference repo, and published algorithms
(Bloom filters, MinHash-LSH, SimHash, DCT perceptual hash).
"""

__version__ = "0.1.0"
