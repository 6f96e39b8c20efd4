"""Sources: parquet readers with pruning + the deterministic synthetic corpus
generator (reference analog: the paged FHIR bundle reader, extraction/fhir.py:26-94,
replaced by streaming parquet block reads)."""
