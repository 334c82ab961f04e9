"""EXT — LLM-data-pipeline operators (mandated beyond the reference's
surface, SURVEY.md §2.10): deduplication, similarity search, multimodal
columns, text analysis, plus star-schema joins/windows. All native
Column expressions except where genuinely impossible (multimodal decode
is a Pandas-UDF stub — the media libs aren't in this container)."""
