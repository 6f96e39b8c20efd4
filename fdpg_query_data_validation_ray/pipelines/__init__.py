"""End-to-end pipelines: the flagship checkpointed validation run + report."""
