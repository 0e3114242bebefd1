"""North-star LLM-data-pipeline functions (BASELINE.json north_star):
dedup, similarity search, text analysis, multimodal column handling.
All JVM-side Catalyst expressions except the explicitly-stubbed multimodal
decode (Arrow-batched mapInPandas)."""
