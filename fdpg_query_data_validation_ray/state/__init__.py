"""Run state: checkpoint manifests and per-partition verdicts."""
