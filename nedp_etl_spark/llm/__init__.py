"""LLM training-data pipeline operators (BASELINE.json:6 north star):
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine),
similarity search (brute-force + IVF), text analysis, multimodal columns.
"""

from nedp_etl_spark.llm import chunking, corpus, curation, dedup, multimodal, pipeline, ranking, simsearch, text  # noqa: F401
