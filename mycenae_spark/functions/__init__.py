"""Training-data-pipeline function library (SURVEY.md §2.11 + extensions):
dedup, similarity, text analysis (registry/llm_queries.py declares the
judged forms) and multimodal column plumbing (multimodal.py)."""
