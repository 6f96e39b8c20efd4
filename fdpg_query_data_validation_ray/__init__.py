"""fdpg_query_data_validation_ray — a Ray-Data-native constraint-validation engine.

From-scratch re-expression of the semantics of
medizininformatik-initiative/fdpg-query-data-validation (reference at
/root/reference) as idiomatic Ray Data pipelines over Arrow batches:

- declarative constraint suites routed per record class
  (reference: StructureDefinition differentials + maps/validation_mapping.json,
  consumed at extraction/main.py:159),
- per-record violation issues with severity/location/diagnostics
  (reference: extraction/IssueSet.py:14-24),
- dedup-counted issue aggregation (reference: extraction/IssueSet.py:9-26),
- distribution analysis + drift (reference: extraction/main.py:270-293),
- per-partition pass/fail verdicts, error-channel fallback semantics
  (reference: extraction/main.py:183-246),
- checkpointed, resumable partitioned runs (new; the reference is one-shot,
  extraction/main.py:296-304).

The engine validates generic Arrow tables; the flagship instance is a Parquet
corpus of source-code repositories with columns
(repo, path, commit, lang, content) per BASELINE.json input_hint.
"""

from fdpg_query_data_validation_ray.rules import (  # noqa: F401
    Rule,
    Suite,
    SuiteRegistry,
    not_null,
    regex,
    in_set,
    length_range,
    value_range,
    dtype,
    unique,
    foreign_key,
    drift,
)
from fdpg_query_data_validation_ray.schema import (  # noqa: F401
    CORPUS_SCHEMA,
    VIOLATION_SCHEMA,
    SEVERITIES,
)

__version__ = "0.1.0"
